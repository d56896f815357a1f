package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>) — declarative throughout (`zip_with`/`aggregate` fold for
  * the dot product stays in codegen; no UDFs).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k via broadcast of the (small)
  *    query set against the full corpus — the correctness baseline and the
  *    right plan when |queries| is small (one scan, no shuffle of the corpus).
  *  - [[lshTopK]]: random-hyperplane LSH — corpus and queries are bucketed by
  *    an H-bit sign sketch; candidates come only from matching buckets
  *    (multi-probe via sketch XOR within hamming ≤ 1), then exact cosine
  *    re-rank. The scale path: the corpus shuffle is by bucket key, each
  *    bucket a tiny fraction of 100 TB.
  */
object AnnSearch {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k neighbors for each query vector.
    * @param corpus (idCol, vecCol) frame; @param queries same shape (small!) */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val pairs = broadcast(q).crossJoin(corpus)
      .filter(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        cosine(col("qvec"), col(vecCol)).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** H-bit random-hyperplane sign sketch. Plane h's component i is a
    * deterministic pseudo-random value in [-0.5, 0.5) derived from
    * xxhash64(h, i) — reproducible across sessions, no stored model. */
  def hyperplaneSketch(vec: Column, bits: Int): Column = {
    // ONE traversal of the vector with a bits-wide projection accumulator
    // (higher-order functions are interpreted; a per-bit formulation would
    // re-fold the vector `bits` times — same lesson as TextDedup.simHash)
    val masks = typedlit((0 until bits).map(1L << _))
    val indexed = zip_with(vec, sequence(lit(0), size(vec) - 1),
      (x, i) => struct(x.cast("double").as("x"), i.as("i")))
    val projs = aggregate(
      indexed,
      array_repeat(lit(0.0), bits),
      (acc, e) => zip_with(acc, sequence(lit(0), lit(bits - 1)),
        (a, h) => a + e.getField("x") *
          ((pmod(xxhash64(h, e.getField("i")), lit(100000L)).cast("double") / 100000.0) - 0.5)))
    aggregate(zip_with(projs, masks, (pj, m) => when(pj > 0, m).otherwise(lit(0L))),
      lit(0L), (a, x) => a + x)
  }

  /** LSH-bucketed ANN: candidates share a sketch bucket (multi-probe: the
    * query also probes all buckets at hamming distance 1), exact cosine
    * re-rank within candidates. Recall < 1 by construction; measured against
    * [[bruteForceTopK]] in the test suite. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, bits: Int = 12): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      hyperplaneSketch(col(vecCol), bits).as("bucket"))
    // query probes: own bucket + all 1-bit flips
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        hyperplaneSketch(col(vecCol), bits).as("sk"))
      .select(col("query_id"), col("qvec"),
        explode(array(col("sk") +: (0 until bits).map(b =>
          col("sk").bitwiseXOR(lit(1L << b))): _*)).as("bucket"))
    val pairs = q.join(c, "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("cos"))
      .distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
