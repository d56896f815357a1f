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
  *
  * Norms are PROJECTED ONCE per row before any join (a cosine that re-folds
  * `l2norm` per pair costs |queries| × |corpus| redundant interpreted folds —
  * measured 6.8 s → the dominant cost of the round-1 `ann_cosine_topk`).
  * Hyperplanes are fixed integer tables ([[OracleHash.planeInts]]) baked into
  * the plan, so the bucketing is reproducible in an external SQL oracle.
  */
object AnnSearch {

  /** in-order dot product — native codegen kernel (the interpreted
    * aggregate/zip_with fold was the round-1 hot spot at ~0.4 ms/pair). */
  def dot(a: Column, b: Column): Column = VecExprs.dot(a, b)

  def l2norm(a: Column): Column = sqrt(VecExprs.dot(a, a))

  /** cosine from a precomputed-norm pair — the join-side kernel. */
  def cosineWithNorms(a: Column, b: Column, an: Column, bn: Column): Column =
    dot(a, b) / (an * bn)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k neighbors for each query vector.
    * @param corpus (idCol, vecCol) frame; @param queries same shape (small!) */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      l2norm(col(vecCol)).as("qnorm"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      l2norm(col(vecCol)).as("cnorm"))
    val pairs = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineWithNorms(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Max vector length supported by the baked hyperplane table. */
  val MaxDim = 256

  /** Plane width the generated DuckDB oracle bakes (SQL literals stay small);
    * oracle-checked queries pass this as `planeDim` so Spark provably uses
    * the identical plane table — and fail LOUDLY on wider vectors instead of
    * silently diverging. */
  val OracleDim = 64

  /** H-bit random-hyperplane sign sketch. Plane q's component i is
    * (planeInts(q)(i)/100000 − 0.5) — a fixed integer table, identical in the
    * Spark plan and the SQL oracle. Each plane projection is one codegen'd
    * [[VecExprs.VecDot]] against a literal double array (same left-to-right
    * IEEE accumulation as the oracle's list_sum). A vector longer than
    * `planeDim` raises at runtime: VecDot's min-length contract would
    * otherwise silently truncate the projection. */
  def hyperplaneSketch(vec: Column, bits: Int, planeDim: Int = MaxDim): Column =
    hyperplaneSketchAt(vec, bits, planeOffset = 0, planeDim)

  /** [[hyperplaneSketch]] over plane-table rows [planeOffset, planeOffset +
    * bits): band b of a BANDED sketch uses offset b*bits, so every band is an
    * independent hash family drawn from the same deterministic table (the
    * oracle indexes the identical rows). */
  def hyperplaneSketchAt(vec: Column, bits: Int, planeOffset: Int, planeDim: Int = MaxDim): Column = {
    require(planeDim > 0 && planeDim <= MaxDim, s"planeDim must be in (0, $MaxDim]")
    val planes = OracleHash.planeInts(planeOffset + bits, MaxDim).drop(planeOffset)
      .map(row => typedlit(row.take(planeDim).map(v => v / 100000.0 - 0.5)))
    val sk = (0 until bits).map { q =>
      when(VecExprs.dot(vec, planes(q)) > 0, lit(1L << q)).otherwise(lit(0L))
    }.reduce(_ + _)
    // null vec first: size(NULL) is null, which would make the dim-check
    // condition null and evaluate the raise_error branch — a single null
    // embedding must yield a null sketch, not abort the query
    when(vec.isNull, lit(null).cast("long"))
      .when(size(vec) <= planeDim, sk)
      .otherwise(raise_error(concat(
        lit(s"embedding dim "), size(vec).cast("string"),
        lit(s" exceeds the baked hyperplane width $planeDim"))))
  }

  /** Deterministic Lloyd (k-means) training for the IVF coarse quantizer.
    *
    * Seed = the first `c` corpus vectors by id; `iters` FIXED iterations.
    * Assignment ranks by round(cos·1e9) (ties by cent_id) and new centroid
    * components are FIXED-POINT means — per-member contributions are rounded
    * to 1e-6 units as integers, summed (integer addition commutes, so the
    * result is independent of aggregation order), divided, and re-rounded —
    * which makes the trained centroids bit-reproducible in ANY engine,
    * including the DuckDB oracle, with no constraint on row order.
    *
    * The driver never sees corpus data: the fixed-point mean (division +
    * round-away) is computed DISTRIBUTIVELY inside the same aggregate job,
    * so the per-iteration collect is exactly the new centroid matrix —
    * C×(dim+1) values, the irreducible minimum (the next iteration's
    * broadcast needs precisely those bytes on the driver). That footprint is
    * the algorithm's real ceiling and is enforced up front: C×dim×8 must fit
    * `maxCentroidBytes` (default 1 GiB ⇒ C ≈ 5·10^5 at D=256, i.e. C ~ √N up
    * to N ≈ 2.5·10^11 corpus rows) — callers above that need a hierarchical
    * (two-level) quantizer, not a bigger driver.
    */
  val DefaultMaxCentroidBytes: Long = 1L << 30

  def lloydCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      c: Int, iters: Int,
      maxCentroidBytes: Long = DefaultMaxCentroidBytes): Seq[(Long, Seq[Double])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // same IEEE formulation as the generated oracle: floor(x+0.5) / ceil(x-0.5)
    def roundAwayCol(x: Column): Column =
      when(x >= 0, floor(x + lit(0.5d))).otherwise(ceil(x - lit(0.5d)))
    val e = corpus.select(col(idCol).cast("long").as("vid"), col(vecCol).as("v"),
      l2norm(col(vecCol)).as("nrm"))
      .persist() // scanned once per Lloyd iteration (assignment + dim sums)
    try { // unpersist on EVERY exit — incl. the seed requires and job failures
    var cents: Seq[(Long, Seq[Double])] = corpus
      .filter(col(idCol) < c)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1).toSeq
    // dim comes from the seed collect that happens anyway — no dedicated
    // sizing job, and an empty corpus fails HERE with a clear message
    // instead of a bare NoSuchElementException
    require(cents.nonEmpty,
      s"lloydCentroids: no seed centroids — corpus has no rows with $idCol < c=$c " +
        "(empty corpus, or ids not 0-based)")
    val dim0 = cents.head._2.length
    require(c.toLong * dim0 * 8 <= maxCentroidBytes,
      s"IVF centroid matrix C=$c × D=$dim0 = ${c.toLong * dim0 * 8} bytes exceeds " +
        s"maxCentroidBytes=$maxCentroidBytes (driver + per-iteration broadcast footprint); " +
        "raise the cap or use a hierarchical quantizer")
    for (_ <- 0 until iters) {
      // assignment as ONE kernel (VecArgMaxCos: argmax over the baked C×D
      // centroid matrix — round(cos·1e9) desc, cent_id asc): no crossJoin,
      // no window, no shuffle, and generated code O(1) in C (the earlier
      // C-unrolled dot expressions made Janino compile time dominate at
      // bench scale and could never hold C ~ √N). The in-order norm fold
      // below performs the same IEEE double ops as the kernel's loop.
      val cnorms = cents.map { case (_, cv) =>
        var acc = 0.0; cv.foreach(x => acc += x * x); math.sqrt(acc)
      }
      // kernel returns the ARRAY INDEX of the winner; cents are id-ascending
      // so first-max-index == lowest cent_id on ties. The matrix rides a
      // Broadcast (unpersisted after this iteration's collect), not the task
      // closure — at C ~ √N the closure must stay flat.
      val bc = VecExprs.broadcastCentroids(spark, cents.map(_._2), cnorms)
      val bestCent = element_at(typedlit(cents.map(_._1)),
        VecExprs.argMaxCosBroadcast(col("v"), bc) + 1)
      // per-dim sums as ONE aggregate column ([[VecSumAgg]]: n + Σ
      // round(x·1e6) longs per dim — order-independent integer math,
      // bit-identical to the oracle's formulation). The previous spelling
      // used `dims` separate sum() columns, whose O(D) expression tree was
      // re-analyzed and re-planned by the driver on EVERY iteration; the
      // fixed-point mean stays computed IN the job (post-aggregate transform
      // on C rows), so the driver still collects finished centroid
      // components only — collected bytes == broadcast bytes == C×(D+1).
      val dims = cents.head._2.length
      val mean = transform(col("_vs.sums"), s =>
        roundAwayCol(s.cast("double") / col("_vs.n").cast("double")).cast("double") / 1e6)
      val sums = e
        .select(bestCent.as("cent_id"), col("v"))
        .groupBy(col("cent_id"))
        .agg(VecSumAgg.vecSum(col("v"), dims).as("_vs"))
        .select(col("cent_id"), mean.as("cvec"))
        .collect()
      cents = sums.map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).sortBy(_._1)
      bc.unpersist(blocking = false)
    }
    cents
    } finally e.unpersist(blocking = false)
  }

  /** Result of [[embedNearDupPairs]]: the candidate-verified pairs plus the
    * per-band rows the bucket cap dropped. At scale the dropped side is the
    * operator's health metric — count it against the corpus size and alert
    * when the dropped fraction is nontrivial (silent truncation was exactly
    * the failure mode of the pre-banded, width-capped design). */
  final case class NearDupResult(pairs: DataFrame, droppedBandRows: DataFrame)

  /** Embedding-cosine near-duplicate pairs, BANDED: `bands` independent
    * `bitsPerBand`-bit hyperplane tables (band b uses plane rows
    * [b*bitsPerBand, (b+1)*bitsPerBand)); a pair is a candidate if it shares
    * a bucket in ANY band, then exact cosine ≥ minCosE4/10000 verifies.
    *
    * Scale shape: banding fixes the old single-table design's ceiling — with
    * one width-capped table, N ≫ 2^bits·bucketCap makes EVERY bucket
    * oversized and the cap silently drops the whole corpus. Bands fail
    * independently: a bucket degenerate in one band drops those rows from
    * that band only, and the pair still meets in its other bands (the
    * MinHash-LSH recall argument). Width additionally scales with the corpus
    * (caller passes bitsPerBand ~ log2(N/targetBucket)), so expected bucket
    * size is constant in N and the join stays sub-quadratic. */
  def embedNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      bitsPerBand: Int, bands: Int, minCosE4: Long,
      bucketCap: Int = TextDedup.DefaultBucketCap,
      planeDim: Int = MaxDim): NearDupResult = {
    require(bands >= 1 && bitsPerBand >= 1)
    val sketches = array((0 until bands).map(b =>
      hyperplaneSketchAt(col(vecCol), bitsPerBand, b * bitsPerBand, planeDim)): _*)
    // FIXED-POINT norms/dots (1e-6 grid): each per-element product is rounded
    // to an integer once (exact IEEE in any engine) and summed as LONGs, so
    // the reported cosine is bit-identical regardless of accumulation order.
    // A double fold is not: Spark folds left-to-right, DuckDB's
    // list_dot_product accumulates differently, and at 20k vectors two pairs
    // landed a last-ulp difference exactly on a round() tie of cos_e4.
    // Computed by a native codegen kernel ([[VecExprs.fixedDotE6]]) — the
    // first formulation used zip_with+aggregate lambdas, which Catalyst
    // interprets per element, per PAIR in the verify stage below: 9.7 s vs
    // 1.3 s at sf0.1 for the whole query.
    val n2 = VecExprs.fixedDotE6(col(vecCol), col(vecCol))
    // persisted: the banded sketch table feeds the cap aggregate AND both
    // self-join sides — un-persisted, the sketch projections and the corpus
    // scan re-run three times (same rationale as minHashLshPairs' signature
    // persist). Pairs are materialized below so it unpersists before return.
    val banded = corpus.select(col(idCol).as("vid"), col(vecCol).as("v"),
        n2.as("n2"), posexplode(sketches))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .persist()
    try {
      // degenerate-bucket cap per (band, bucket): broadcast anti-join of the
      // (tiny) oversized key set — never a window over the skewed bucket key
      val oversized = banded.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("_bsz"))
        .filter(col("_bsz") > bucketCap)
        .select(col("band"), col("bucket"))
      val capped = banded.join(broadcast(oversized), Seq("band", "bucket"), "left_anti")
      val dropped = banded.join(broadcast(oversized), Seq("band", "bucket"), "left_semi")
        .select(col("band"), col("bucket"), col("vid"))
      val a = capped.alias("a"); val b = capped.alias("b")
      val pairs = a.join(b,
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.vid") < col("b.vid"))
        .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"), {
          val qdot = VecExprs.fixedDotE6(col("a.v"), col("b.v"))
          round(qdot.cast("double") /
              sqrt(col("a.n2").cast("double") * col("b.n2").cast("double")) * 10000)
            .cast("long").as("cos_e4")
        })
        .distinct() // a pair meeting in several bands reports once
        .filter(col("cos_e4") >= minCosE4)
      // materialized so the persist can be dropped now; `dropped` stays lazy
      // (recomputes if consumed — health-metric path, not the hot path)
      NearDupResult(pairs.localCheckpoint(true), dropped)
    } finally banded.unpersist(blocking = false)
  }

  /** LSH-bucketed ANN: candidates share a sketch bucket (multi-probe: the
    * query also probes all buckets at hamming distance 1), exact cosine
    * re-rank within candidates. Recall < 1 by construction; measured against
    * [[bruteForceTopK]] in the test suite. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, bits: Int = 12): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      l2norm(col(vecCol)).as("cnorm"),
      hyperplaneSketch(col(vecCol), bits).as("bucket"))
    // query probes: own bucket + all 1-bit flips
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        l2norm(col(vecCol)).as("qnorm"),
        hyperplaneSketch(col(vecCol), bits).as("sk"))
      .select(col("query_id"), col("qvec"), col("qnorm"),
        explode(array(col("sk") +: (0 until bits).map(b =>
          col("sk").bitwiseXOR(lit(1L << b))): _*)).as("bucket"))
    val pairs = q.join(c, "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineWithNorms(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")).as("cos"))
      .distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
