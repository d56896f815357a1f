package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{AnnSearch, VecExprs}

/** Persisted IVF (inverted-file) ANN index — the train-once / probe-many
  * shape of `ann_ivf_topk`.
  *
  * At 100 TB the quantizer cannot be retrained per query (Lloyd's is a full
  * corpus scan per iteration) and the corpus cannot be re-assigned per query
  * (another full scan + shuffle). This index persists both halves once:
  *
  *  - `centroids/` — the trained coarse quantizer: `(cent_id, cvec)`,
  *    C rows ([[AnnSearch.lloydCentroids]] output, deterministic fixed-point
  *    means — an independent engine retrains to bit-identical centroids).
  *  - `lists/cp=N/` — the inverted lists: `(vec_id, embedding, nrm, seq)`
  *    directory-partitioned by assigned centroid. A query probing nProbe of
  *    C centroids reads nProbe/C of the corpus via PARTITION pruning — the
  *    unprobed lists are never listed or opened.
  *
  * Both trees are append-only. New vectors from a CDC micro-batch are
  * assigned to the FROZEN centroids with the same codegen kernel used at
  * build time ([[VecExprs.argMaxCosBroadcast]] — one broadcast of the C×D
  * matrix, no crossJoin) and appended to their lists ([[appendVectors]]);
  * re-delivered or updated vectors resolve by LWW on `seq` at read time
  * ([[listsFor]]), mirroring [[SigStore]]'s head-seq rule. Centroids stay
  * frozen until an explicit [[build]] (retrain) — standard IVF practice:
  * assignment drift from distribution shift degrades recall gracefully and
  * is repaired by retraining, never by silently moving vectors.
  */
object IvfIndex {

  /** `c` coarse centroids, `iters` Lloyd refinement iterations (both shared
    * with the DuckDB oracle, which re-derives identical centroids). */
  final case class Config(c: Int = 16, iters: Int = 2)

  private def centDir(dir: String) = s"$dir/centroids"
  private def listDir(dir: String) = s"$dir/lists"

  // the schema writeAssigned produces (embedding element type follows the
  // engine's Array[Float] embedding column)
  private val listsSchema = StructType(Seq(
    StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType)),
    StructField("nrm", DoubleType), StructField("seq", LongType),
    StructField("cp", LongType)))

  /** Train the quantizer on `corpus` and (re)write the full index. One Lloyd
    * training pass + ONE assignment job + one partitioned write. */
  def build(dir: String, corpus: DataFrame, idCol: Column, vecCol: Column,
      cfg: Config, seq: Column = lit(1L)): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val named = corpus.select(idCol.cast("long").as("vec_id"), vecCol.as("embedding"))
    val trained = AnnSearch.lloydCentroids(named, "vec_id", "embedding", cfg.c, cfg.iters)
    trained.toDF("cent_id", "cvec").coalesce(1)
      .write.mode("overwrite").parquet(centDir(dir))
    writeAssigned(dir, corpus.select(idCol.cast("long").as("vec_id"),
      vecCol.as("embedding"), seq.cast("long").as("seq")), trained,
      overwrite = true)
  }

  /** Assign new vectors to the FROZEN centroids and append them to their
    * inverted lists — the micro-batch ingest path. O(batch) cost: one
    * broadcast of the centroid matrix, one narrow map, one partitioned
    * append; the existing lists are not read. */
  def appendVectors(spark: SparkSession, dir: String, vecs: DataFrame,
      idCol: Column, vecCol: Column, seq: Column = lit(1L)): Unit =
    writeAssigned(dir, vecs.select(idCol.cast("long").as("vec_id"),
      vecCol.as("embedding"), seq.cast("long").as("seq")),
      readCentroids(spark, dir), overwrite = false)

  private def writeAssigned(dir: String, vecs: DataFrame,
      cents: Seq[(Long, Seq[Double])], overwrite: Boolean): Unit = {
    val spark = vecs.sparkSession
    val cnorms = cents.map { case (_, cv) =>
      var acc = 0.0; cv.foreach(x => acc += x * x); math.sqrt(acc)
    }
    val bc = VecExprs.broadcastCentroids(spark, cents.map(_._2), cnorms)
    vecs.select(col("vec_id"), col("embedding"),
        AnnSearch.l2norm(col("embedding")).as("nrm"), col("seq"),
        element_at(typedlit(cents.map(_._1)),
          VecExprs.argMaxCosBroadcast(col("embedding"), bc) + 1).as("cp"))
      // one file per touched list per append (not tasks × C): C scales with
      // the corpus (≥ √N), so the shuffle keeps its parallelism at scale.
      // Pinned partition count (bounded by session parallelism): AQE would
      // coalesce a small append's shuffle to ONE task that then opens and
      // commits every list's file sequentially — per-file writer overhead,
      // not data, dominated the build (same fix as SigStore.writeParallelism)
      .repartition(math.max(1, math.min(cents.size,
        spark.conf.get("spark.sql.shuffle.partitions").toInt)), col("cp"))
      .write.mode(if (overwrite) "overwrite" else "append")
      .partitionBy("cp").parquet(listDir(dir))
    bc.unpersist(blocking = false)
  }

  /** The trained quantizer (C rows — driver-small by construction). */
  def readCentroids(spark: SparkSession, dir: String): Seq[(Long, Seq[Double])] =
    spark.read.parquet(centDir(dir)).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).sortBy(_._1)

  /** The live rows of the probed inverted lists: the `cp` filter is a
    * partition filter (unprobed list directories are never opened); within
    * the probed lists, LWW on seq per vec_id keeps exactly the newest copy
    * of a re-appended vector. */
  def listsFor(spark: SparkSession, dir: String, centIds: Seq[Long]): DataFrame = {
    // explicit probed-list paths: even the file LISTING is O(probed lists) —
    // a root read would discover all C list directories first, and C scales
    // with the corpus
    val paths = centIds.map(c => s"${listDir(dir)}/cp=$c")
      .filter(p => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(p)))
    // zero probed dirs (all probed lists empty, or a fresh index) returns an
    // explicit empty frame — a root read here would list every list dir and
    // schema-infer over files this method promises never to open
    val scan = if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        listsSchema)
      else spark.read.option("basePath", listDir(dir)).parquet(paths: _*)
    scan
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("embedding"), col("nrm"), col("cp")), col("seq")).as("_w"))
      .select(col("vec_id"), col("_w.embedding").as("embedding"),
        col("_w.nrm").as("nrm"), col("_w.cp").as("cent_id"))
  }

  /** Top-k cosine neighbors of each query vector, probing `nProbe` lists per
    * query — reads ONLY the persisted index. Ranking is by the ROUNDED
    * cosine (ties by id), identical to the retrain-per-query formulation it
    * replaces, so results stay oracle-exact. */
  def topK(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: Column, vecCol: Column, nProbe: Int, k: Int): DataFrame = {
    // k <= 0 returned an empty frame under the old `filter(rank <= k)`
    // formulation; keep that contract (TopKAgg itself requires k > 0)
    if (k <= 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("query_id", LongType), StructField("neighbor_id", LongType),
          StructField("cos_e4", LongType), StructField("rank", LongType))))
    val cents = readCentroids(spark, dir)
    val centsDF = spark.createDataFrame(cents.map { case (cid, cv) => (cid, cv) })
      .toDF("cent_id", "cvec")
      .select(col("cent_id"), col("cvec"),
        sqrt(VecExprs.dot(col("cvec"), col("cvec"))).as("cnrm"))
    val q = queries.select(idCol.cast("long").as("query_id"), vecCol.as("qe"),
      AnnSearch.l2norm(vecCol).as("qn"))
    val probes = q.crossJoin(broadcast(centsDF))
      .select(col("query_id"), col("qe"), col("qn"), col("cent_id"),
        round(AnnSearch.cosineWithNorms(col("qe"), col("cvec"), col("qn"), col("cnrm")) * 1e9)
          .cast("long").as("cos9"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos9").desc, col("cent_id"))))
      .filter(col("_rn") <= nProbe)
      .select(col("query_id"), col("qe"), col("qn"), col("cent_id"))
    // the probed centroid ids are tiny (|queries| × nProbe) — collecting them
    // lets the list scan prune DIRECTORIES instead of filtering rows
    val probedIds = probes.select(col("cent_id")).distinct()
      .collect().map(_.getLong(0)).toSeq
    // (query_id, vec_id) pairs are unique by construction — listsFor keeps
    // exactly one LWW row per vec_id across the probed lists — so no distinct
    // is needed, and the final ranking is a BOUNDED top-k aggregate
    // (graft.functions.TopKAgg) rather than a row_number window: each task
    // keeps at most k candidates per query (map-side partial agg), so a
    // query's ~nProbe·N/C candidates never serialize through one window
    // task's sort. Ordering (cos_e4 DESC NULLS LAST, neighbor_id ASC) is the
    // window's exact tie order — results stay oracle-exact.
    val cand = probes.join(listsFor(spark, dir, probedIds), "cent_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(AnnSearch.cosineWithNorms(col("qe"), col("embedding"),
          col("qn"), col("nrm")) * 10000).cast("long").as("cos_e4"))
    cand.groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(col("cos_e4"), col("neighbor_id"), k).as("_tk"))
      .select(col("query_id"), posexplode(col("_tk")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("cos_e4"), (col("pos") + 1).cast("long").as("rank"))
  }
}
