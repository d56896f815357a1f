package graft

import graft.operators.IvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF index: train-once / probe-many, incremental assignment from
  * ingest, LWW re-appends, and partition-pruned probes. */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = IvfIndex.Config(c = 4, iters = 2)
  private val Dim = 6

  /** Deterministic clustered vectors: 4 well-separated axis clusters with
    * an id-dependent jitter small enough that cluster membership is
    * unambiguous (so a retrain on MORE samples of the same clusters lands on
    * near-identical centroids). */
  private def vec(i: Int): Seq[Double] = {
    val c = i % 4
    (0 until Dim).map { d =>
      val base = if (d == c) 10.0 else if (d == c + 1 || d == (c + 2) % Dim) 2.0 else 0.5
      base + 0.01 * ((i * 7 + d * 3) % 11)
    }
  }

  private def vecsDF(ids: Seq[Int], f: Int => Seq[Double] = vec): DataFrame =
    ids.map(i => (i.toLong, f(i))).toDF("vec_id", "embedding")

  private def collectTopK(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select(col("query_id"), col("neighbor_id"), col("cos_e4"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  /** Driver-side exact replica of the probe semantics: argmax assignment by
    * round(cos·1e9) (ties → lowest cent_id), top-nProbe lists per query,
    * exact cosine re-rank by (round(cos·1e4) desc, id). */
  private def expectedTopK(corpus: Map[Long, Seq[Double]],
      cents: Seq[(Long, Seq[Double])], queryIds: Seq[Long],
      nProbe: Int, k: Int): Set[(Long, Long, Long, Long)] = {
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def nrm(a: Seq[Double]): Double = math.sqrt(dot(a, a))
    def cos9(a: Seq[Double], b: Seq[Double]): Long =
      math.round(dot(a, b) / (nrm(a) * nrm(b)) * 1e9)
    def cos4(a: Seq[Double], b: Seq[Double]): Long =
      math.round(dot(a, b) / (nrm(a) * nrm(b)) * 1e4)
    val assign: Map[Long, Long] = corpus.map { case (id, v) =>
      id -> cents.map { case (cid, cv) => (cid, cos9(v, cv)) }
        .maxBy { case (cid, c9) => (c9, -cid) }._1
    }
    queryIds.flatMap { q =>
      val probed = cents.map { case (cid, cv) => (cid, cos9(corpus(q), cv)) }
        .sortBy { case (cid, c9) => (-c9, cid) }.take(nProbe).map(_._1).toSet
      corpus.keys.filter(v => v != q && probed.contains(assign(v)))
        .map(v => (v, cos4(corpus(q), corpus(v)))).toSeq
        .sortBy { case (v, c4) => (-c4, v) }.take(k).zipWithIndex
        .map { case ((v, c4), r) => (q, v, c4, (r + 1).toLong) }
    }.toSet
  }

  test("topK reads the persisted index and matches the exact probe semantics") {
    val idx = TestSpark.tmpDir("graft-ivf-a")
    val ids = 0 until 120
    IvfIndex.build(idx, vecsDF(ids), col("vec_id"), col("embedding"), cfg)
    val got = collectTopK(IvfIndex.topK(spark, idx, vecsDF(Seq(0, 1, 2)),
      col("vec_id"), col("embedding"), nProbe = 2, k = 3))
    val cents = IvfIndex.readCentroids(spark, idx)
    assert(cents.size === cfg.c)
    val corpus = ids.map(i => i.toLong -> vec(i)).toMap
    assert(got === expectedTopK(corpus, cents, Seq(0L, 1L, 2L), 2, 3))
  }

  test("incremental assignment equals a full retrain on the grown corpus") {
    val idxA = TestSpark.tmpDir("graft-ivf-incr")
    val idxB = TestSpark.tmpDir("graft-ivf-retrain")
    val base = 0 until 120
    val grown = 120 until 160
    IvfIndex.build(idxA, vecsDF(base), col("vec_id"), col("embedding"), cfg)
    // ingest path: new vectors assigned to the FROZEN centroids, O(batch)
    IvfIndex.appendVectors(spark, idxA, vecsDF(grown),
      col("vec_id"), col("embedding"), lit(2L))
    // full retrain on base ∪ grown (what the incremental path replaces)
    IvfIndex.build(idxB, vecsDF(base ++ grown), col("vec_id"), col("embedding"), cfg)
    val q = vecsDF(Seq(0, 1, 2, 121))
    val inc = collectTopK(IvfIndex.topK(spark, idxA, q,
      col("vec_id"), col("embedding"), nProbe = 2, k = 3))
    val full = collectTopK(IvfIndex.topK(spark, idxB, q,
      col("vec_id"), col("embedding"), nProbe = 2, k = 3))
    assert(inc === full,
      "frozen-centroid incremental assignment must serve the same neighbors " +
        "as a full retrain while the distribution is stationary")
    // and the incremental index agrees with the exact probe semantics under
    // ITS OWN (frozen) centroids — the contract that holds unconditionally
    val corpus = (base ++ grown).map(i => i.toLong -> vec(i)).toMap
    assert(inc === expectedTopK(corpus, IvfIndex.readCentroids(spark, idxA),
      Seq(0L, 1L, 2L, 121L), 2, 3))
  }

  test("zero existing probed dirs yield empty candidates without touching the lists root") {
    val idx = TestSpark.tmpDir("graft-ivf-emptyprobe")
    IvfIndex.build(idx, vecsDF(0 until 40), col("vec_id"), col("embedding"), cfg)
    // poison one real list dir: any fallback that lists/schema-infers the
    // ROOT fails loudly, while the probed-paths contract never opens it
    val d = java.nio.file.Paths.get(idx, "lists", "cp=0")
    java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.write(d.resolve("poison.parquet"), "junk".getBytes)
    assert(IvfIndex.listsFor(spark, idx, Seq(9999L)).count() === 0L)
    // a fresh index with NO lists tree at all must also read as empty
    val fresh = TestSpark.tmpDir("graft-ivf-freshprobe")
    assert(IvfIndex.listsFor(spark, fresh, Seq(1L)).count() === 0L)
  }

  test("re-appended vectors resolve by LWW; unprobed list dirs are never opened") {
    val idx = TestSpark.tmpDir("graft-ivf-lww")
    val ids = 0 until 120
    IvfIndex.build(idx, vecsDF(ids), col("vec_id"), col("embedding"), cfg)
    // vector 5 moves from cluster 1 to cluster 2: its new copy lands in
    // another list directory; reads must serve ONLY the new version
    def vec2(i: Int): Seq[Double] = if (i == 5) vec(6) else vec(i)
    IvfIndex.appendVectors(spark, idx, vecsDF(Seq(5), vec2),
      col("vec_id"), col("embedding"), lit(9L))
    val cents = IvfIndex.readCentroids(spark, idx)
    val lists = IvfIndex.listsFor(spark, idx, cents.map(_._1))
    assert(lists.filter(col("vec_id") === 5L).count() === 1L,
      "LWW must collapse the moved vector to one live copy")
    val corpus = ids.map(i => i.toLong -> vec2(i)).toMap
    val got = collectTopK(IvfIndex.topK(spark, idx, vecsDF(Seq(5), vec2),
      col("vec_id"), col("embedding"), nProbe = 2, k = 3))
    assert(got === expectedTopK(corpus, cents, Seq(5L), 2, 3))

    // pruning: poison every list dir the query does NOT probe — topK must
    // succeed (never opens them) while an unpruned scan fails loudly
    val probed = cents.map { case (cid, cv) =>
      def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
      (cid, math.round(dot(vec2(5), cv) /
        (math.sqrt(dot(vec2(5), vec2(5))) * math.sqrt(dot(cv, cv))) * 1e9))
    }.sortBy { case (cid, c9) => (-c9, cid) }.take(2).map(_._1).toSet
    cents.map(_._1).filterNot(probed.contains).foreach { cid =>
      val d = java.nio.file.Paths.get(idx, "lists", s"cp=$cid")
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve("poison.parquet"), "junk".getBytes)
      ()
    }
    intercept[Exception] {
      spark.read.parquet(s"$idx/lists").agg(count(lit(1))).collect()
    }
    assert(collectTopK(IvfIndex.topK(spark, idx, vecsDF(Seq(5), vec2),
      col("vec_id"), col("embedding"), nProbe = 2, k = 3)) === got)
  }
}
