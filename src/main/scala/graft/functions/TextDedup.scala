package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for large text corpora — fully declarative
  * (Catalyst higher-order functions; no UDFs, so everything stays inside
  * whole-stage codegen and scales with executors):
  *
  *  - exact dedup: content-hash groupBy
  *  - MinHash + LSH: shingle → k-permutation minhash signature → banded
  *    bucket join → candidate pairs + signature-similarity estimate
  *  - SimHash: 62-bit sketch + hamming distance with pigeonhole blocking
  *  - n-gram Jaccard: exact set similarity via shingle co-occurrence join
  *
  * All hashing derives from md5 + affine mixing ([[OracleHash]]) so every
  * signature is reproducible bit-for-bit in an external SQL engine — the
  * driver's DuckDB oracle checks these operators' exact output, not just row
  * counts.
  */
object TextDedup {

  /** Default cap on LSH bucket size: a degenerate band bucket (boilerplate
    * shared by half the corpus) would otherwise go quadratic in the
    * self-join. Recall loss only affects pairs whose EVERY shared band is
    * degenerate — near-dup pairs in a boilerplate-heavy corpus still meet in
    * their non-boilerplate bands. */
  val DefaultBucketCap = 2000

  /** Drop rows belonging to buckets larger than `cap`.
    *
    * NOT a window over the bucket key: `count().over(partitionBy(bucket))`
    * would first MATERIALIZE the degenerate bucket in one task's window
    * buffer — the exact skew hotspot the cap exists to prevent. Instead the
    * (tiny, by definition) set of oversized bucket keys is found with a
    * map-side-combining groupBy and anti-joined back as a broadcast — the
    * big side never shuffles on the skewed key at all. */
  private def dropOversizedBuckets(
      df: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    val keyCols = keys.map(col)
    val oversized = df.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("_bsz"))
      .filter(col("_bsz") > cap)
      .select(keyCols: _*)
    df.join(broadcast(oversized), keys, "left_anti")
  }

  /** Word n-gram shingles of a text column (array of strings). */
  def shingles(text: Column, n: Int): Column = {
    val words = split(text, "\\s+")
    when(size(words) < n, array(text))
      .otherwise(transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
  }

  /** Shingle hashes: strings → unsigned 32-bit md5-derived ints, exactly once
    * (fused codegen kernel — `shingles()`'s transform lambda re-evaluates the
    * split per element, which was the real round-1 bottleneck). */
  def shingleHashes(text: Column, n: Int): Column =
    VecExprs.shingleH32(split(text, "\\s+"), text, n)

  /** MinHash signature (array<bigint> of length k) from PRE-HASHED shingles:
    * permutation j re-mixes the 32-bit base hash as (a_j*h + b_j) mod 2^61-1
    * (a_j < 2^30 ⇒ no overflow; constants from [[OracleHash.coefA]]).
    * Implemented as a native codegen kernel ([[VecExprs.MinHashSig]]): the
    * equivalent aggregate/zip_with formulation is interpreted and was the
    * dominant cost of the whole query (k-wide fold per shingle). */
  def minHashSignatureFromHashes(hashes: Column, k: Int): Column =
    VecExprs.minHashSig(hashes, k)

  /** Convenience one-shot form over a shingle array. */
  def minHashSignature(shingleArr: Column, k: Int): Column =
    minHashSignatureFromHashes(VecExprs.md5H32Array(shingleArr), k)

  /** Exact dedup groups: one row per distinct content hash with count and the
    * kept doc (min id) — the hash-groupBy scale path. */
  def exactDupGroups(docs: DataFrame, id: String, text: String): DataFrame =
    docs.groupBy(md5(col(text)).as("content_hash"))
      .agg(count(lit(1)).as("n"), min(col(id)).as("keeper"))

  /** MinHash-LSH candidate pairs.
    *
    * Signature split into `bands` bands of `rowsPerBand`; docs sharing any
    * band bucket become candidates (one shuffle on band-bucket key — the
    * classic sub-quadratic path); pairs are scored by the fraction of equal
    * signature positions (an unbiased Jaccard estimate). Buckets larger than
    * `bucketCap` are dropped (quadratic-blowup guard).
    *
    * The signature table is persisted for the self-join's two sides, the
    * result is materialized via localCheckpoint, and the signatures are
    * UNPERSISTED before returning — repeated invocations leak nothing.
    *
    * @return (id_a, id_b, est_jaccard) with id_a < id_b, est ≥ minEst
    */
  def minHashLshPairs(
      docs: DataFrame, id: String, text: String,
      shingleLen: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      minEst: Double = 0.5, bucketCap: Int = DefaultBucketCap): DataFrame = {
    val k = bands * rowsPerBand
    val sig = docs
      .select(col(id).as("doc"), shingleHashes(col(text), shingleLen).as("hs"))
      .select(col("doc"), minHashSignatureFromHashes(col("hs"), k).as("sig"))
      .persist()
    try {
      // band bucket: band index + the band's signature slice, as a string key
      val banded = sig.select(col("doc"), col("sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => concat_ws("|", b.cast("string"), concat_ws(",",
            transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
              x => x.cast("string")))))).as("bucket"))
      val capped = dropOversizedBuckets(banded, Seq("bucket"), bucketCap)
      val a = capped.alias("a")
      val b = capped.alias("b")
      val est = VecExprs.eqCount(col("a.sig"), col("b.sig")).cast("double") / lit(k)
      val pairs = a.join(b, col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc"))
        .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"), est.as("est_jaccard"))
        .distinct()
        .filter(col("est_jaccard") >= minEst)
      pairs.localCheckpoint(true) // materialize so sig can be unpersisted now
    } finally sig.unpersist(blocking = false)
  }

  /** 62-bit SimHash of a shingle array: bit i is the sign of the sum over
    * shingles of ±1 according to bit i of the shingle's packed md5 hash.
    * 62 bits (31 from each md5 half) keep every mask and sum inside a signed
    * 64-bit integer in any engine. The 62-wide vote fold is a native codegen
    * kernel ([[VecExprs.SimHashSketch]]) — interpreted HOFs made this the
    * slowest query in round 1. */
  def simHash(shingleArr: Column): Column =
    VecExprs.simHashSketch(VecExprs.md5H62Array(shingleArr))

  /** Hamming distance between two sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with pigeonhole blocking: the 62-bit sketch is
    * split into (maxHamming + 1) bit-bands — a pair within hamming distance
    * maxHamming MUST agree on at least one band — candidates share any band
    * value, then the TRUE hamming distance verifies. Recall is exact; cost
    * grows with maxHamming (narrower bands ⇒ more candidates), so the default
    * stays at 6 (7 bands ⇒ 8-bit blocks ⇒ 256+ values per band; the round-1
    * default of 12 made 4-5-bit blocks and went near-cartesian). Oversized
    * blocks are dropped like LSH buckets. */
  def simHashPairs(
      docs: DataFrame, id: String, text: String,
      shingleLen: Int = 3, maxHamming: Int = 6,
      bucketCap: Int = DefaultBucketCap): DataFrame =
    simHashPairsImpl(docs, id, text, shingleLen, maxHamming, bucketCap, materialize = true)

  /** [[simHashPairs]] without the final materialization — plan-inspection
    * hook (the sketch table stays persisted; caller is transient tooling). */
  private[graft] def simHashPairsPlan(
      docs: DataFrame, id: String, text: String,
      shingleLen: Int = 3, maxHamming: Int = 6,
      bucketCap: Int = DefaultBucketCap): DataFrame =
    simHashPairsImpl(docs, id, text, shingleLen, maxHamming, bucketCap, materialize = false)

  private def simHashPairsImpl(
      docs: DataFrame, id: String, text: String,
      shingleLen: Int, maxHamming: Int,
      bucketCap: Int, materialize: Boolean): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 30, "maxHamming out of range")
    val nBands = maxHamming + 1
    val width = 62 / nBands // last band absorbs the remainder bits
    val sk = docs.select(col(id).as("doc"),
      VecExprs.simHashSketch(
        VecExprs.shingleH62(split(col(text), "\\s+"), col(text), shingleLen)).as("sketch"))
      .persist()
    try {
      val bandExprs = (0 until nBands).map { q =>
        val lo = q * width
        val w = if (q == nBands - 1) 62 - lo else width
        val mask = (1L << w) - 1L
        shiftright(col("sketch"), lo).bitwiseAND(lit(mask))
      }
      // null blocks (null text ⇒ null sketch) can never join-match; the
      // grouped path must drop them explicitly for parity
      val blocked = sk.select(col("doc"), col("sketch"),
        posexplode(array(bandExprs: _*)))
        .withColumnRenamed("pos", "q").withColumnRenamed("col", "block")
        .filter(col("block").isNotNull)
      val capped = dropOversizedBuckets(blocked, Seq("q", "block"), bucketCap)
      // Per-BLOCK nested-loop kernel instead of a block-keyed self-join: at
      // high corpus density (N ≈ 2^width · cap, e.g. 500k docs with 8-bit
      // blocks) most blocks sit near the cap and the join materialized
      // ~Σ n_b² ≈ 10⁹ intermediate rows — ~730 s of CPU for a ~10⁴-row
      // result, concentrated on however many partitions the probe side
      // happened to have (measured parallelism ≈ 1). The groupBy spreads
      // blocks across the shuffle width, the collected block is bounded by
      // the cap (≤ bucketCap rows), and [[VecExprs.SimHashBlockPairs]] emits
      // only the surviving (hamming ≤ max) pairs — identical output to the
      // join (id_a < id_b under the doc type's ordering, then distinct
      // because a pair can meet in several bands).
      val grouped = capped.groupBy(col("q"), col("block"))
        .agg(collect_list(struct(col("doc"), col("sketch"))).as("_rows"))
      val pairs = grouped
        .select(explode(VecExprs.simHashBlockPairs(col("_rows"), maxHamming)).as("_p"))
        .select(col("_p.id_a").as("id_a"), col("_p.id_b").as("id_b"),
          col("_p.hamming").as("hamming"))
        .distinct()
      if (materialize) pairs.localCheckpoint(true) // so sk can be unpersisted now
      else pairs
      // always unpersist — also on the plan-hook path and on exceptions (an
      // unpersisted InMemoryRelation in the returned plan simply recomputes)
    } finally sk.unpersist(blocking = false)
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle:
    * explode distinct shingles, self-join on shingle, count intersections,
    * |A∪B| = |A|+|B|−|A∩B|. Quadratic only within shingle groups — which is
    * why `maxDocFreq` caps a shingle's DOCUMENT frequency: a boilerplate
    * shingle present in k docs contributes k² join rows (at 10^6 docs that
    * is the whole query), and such a shingle carries no similarity signal
    * anyway (the stop-word argument). Capped shingles are removed from BOTH
    * the intersection and the set sizes, so the reported Jaccard is exact
    * over the capped shingle space — same broadcast-anti-join shape as
    * [[dropOversizedBuckets]], the big side never shuffles on the hot key. */
  def ngramJaccardPairs(
      docs: DataFrame, id: String, text: String,
      shingleLen: Int = 3, minJaccard: Double = 0.5,
      maxDocFreq: Int = DefaultBucketCap): DataFrame = {
    val sh0 = docs.select(col(id).as("doc"),
        explode(array_distinct(shingles(col(text), shingleLen))).as("sh"))
    val sh = dropOversizedBuckets(sh0, Seq("sh"), maxDocFreq)
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("sz"))
    val a = sh.alias("a"); val b = sh.alias("b")
    val inter = a.join(b, col("a.sh") === col("b.sh") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
