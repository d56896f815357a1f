package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for large text corpora — fully declarative
  * (Catalyst higher-order functions; no UDFs, so everything stays inside
  * whole-stage codegen and scales with executors):
  *
  *  - exact dedup: content-hash groupBy
  *  - MinHash + LSH: shingle → K-permutation minhash signature → banded
  *    bucket join → candidate pairs + signature-similarity estimate
  *  - SimHash: 64-bit hyperplane sketch + hamming distance
  *  - n-gram Jaccard: exact set similarity via shingle co-occurrence join
  *
  * All hashes derive from Spark's xxhash64 (deterministic across sessions),
  * with per-permutation affine mixing (odd multiplier ⇒ bijective mod 2^64).
  */
object TextDedup {

  /** Word n-gram shingles of a text column (array of strings). */
  def shingles(text: Column, n: Int): Column = {
    val words = split(text, "\\s+")
    when(size(words) < n, array(text))
      .otherwise(transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
  }

  /** Shingle hashes: strings hashed to longs exactly once. */
  def shingleHashes(text: Column, n: Int): Column =
    transform(shingles(text, n), s => xxhash64(s))

  /** MinHash signature (array<bigint> of length k) from PRE-HASHED shingles:
    * ONE traversal of the hash array with a k-wide running-min accumulator;
    * permutation j re-mixes the 8-byte base hash as xxhash64(j, h) (no string
    * re-hashing, no affine multiplication that would trip ANSI overflow).
    *
    * Single-traversal matters doubly here: higher-order functions are
    * interpreted, and a per-permutation formulation (k lambdas each folding
    * the array) re-evaluates its argument expression k times — Catalyst's
    * CollapseProject even re-inlines a pre-projected hash column, so the
    * shape of THIS expression is the only reliable way to hash once
    * (a k-lambda draft measured ~18× slower on 5000 docs). */
  def minHashSignatureFromHashes(hashes: Column, k: Int): Column =
    aggregate(
      hashes,
      array_repeat(lit(Long.MaxValue), k),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(k - 1)),
        (a, j) => least(a, xxhash64(j, h))))

  /** Convenience one-shot form over a shingle array. */
  def minHashSignature(shingleArr: Column, k: Int): Column =
    minHashSignatureFromHashes(transform(shingleArr, s => xxhash64(s)), k)

  /** Exact dedup groups: one row per distinct content hash with count and the
    * kept doc (min id) — the hash-groupBy scale path. */
  def exactDupGroups(docs: DataFrame, id: String, text: String): DataFrame =
    docs.groupBy(xxhash64(col(text)).as("content_hash"))
      .agg(count(lit(1)).as("n"), min(col(id)).as("keeper"))

  /** MinHash-LSH candidate pairs.
    *
    * Signature split into `bands` bands of `rowsPerBand`; docs sharing any
    * band bucket become candidates (one shuffle on band-bucket key — the
    * classic sub-quadratic path); pairs are scored by the fraction of equal
    * signature positions (an unbiased Jaccard estimate).
    *
    * @return (id_a, id_b, est_jaccard) with id_a < id_b, est ≥ minEst
    */
  def minHashLshPairs(
      docs: DataFrame, id: String, text: String,
      shingleLen: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      minEst: Double = 0.5): DataFrame = {
    val k = bands * rowsPerBand
    // materialize signatures once — BOTH sides of the LSH self-join would
    // otherwise recompute the k minhash passes per row (at lake scale:
    // checkpoint the signature table instead of caching)
    val sig = docs
      .select(col(id).as("doc"), shingleHashes(col(text), shingleLen).as("hs"))
      .select(col("doc"), minHashSignatureFromHashes(col("hs"), k).as("sig"))
      .persist()
    // band key: hash of the band's slice of the signature
    val banded = sig.select(col("doc"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws("_", b, concat_ws(",",
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.alias("a")
    val b = banded.alias("b")
    val est = {
      val eq = zip_with(col("a.sig"), col("b.sig"), (x, y) => when(x === y, 1).otherwise(0))
      aggregate(eq, lit(0), (acc, x) => acc + x).cast("double") / lit(k)
    }
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"), est.as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= minEst)
  }

  /** 64-bit SimHash of a shingle array: bit i is the sign of the sum over
    * shingles of ±1 according to bit i of the shingle's hash. Declarative:
    * per-bit aggregate over the (hash-projected) shingle array. */
  def simHash(shingleArr: Column): Column = {
    // ONE traversal of the shingle hashes with a 64-wide counter array:
    // counts[i] += ±1 by bit i of xxhash64(shingle). (A per-bit formulation
    // would re-evaluate the hash 64× per shingle — higher-order functions are
    // interpreted, so single-pass matters.) Bit masks are disjoint, so the
    // final OR of per-bit masks is a plain sum.
    val masks = typedlit((0 until 64).map(1L << _))
    val counts = aggregate(
      transform(shingleArr, s => xxhash64(s)),
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, masks,
        (a, m) => a + when(h.bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)))
    aggregate(zip_with(counts, masks, (c, m) => when(c > 0, m).otherwise(lit(0L))),
      lit(0L), (a, x) => a + x)
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with pigeonhole blocking: the 64-bit sketch is
    * split into (maxHamming + 1) bit-bands — a pair within hamming distance
    * maxHamming MUST agree on at least one band — candidates share any band
    * value, then the TRUE hamming distance verifies. (Blocking on fewer bands
    * than maxHamming+1 would silently drop qualifying pairs whose differing
    * bits spread across all bands.) More bands ⇒ narrower bands ⇒ more
    * candidates to verify: recall is exact, cost grows with maxHamming. */
  def simHashPairs(
      docs: DataFrame, id: String, text: String,
      shingleLen: Int = 3, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31, "maxHamming out of range")
    val nBands = maxHamming + 1
    val width = 64 / nBands // last band absorbs the remainder bits
    val sk = docs.select(col(id).as("doc"),
      simHash(shingles(col(text), shingleLen)).as("sketch"))
      .persist() // self-joined below — compute sketches once
    val bandExprs = (0 until nBands).map { q =>
      val lo = q * width
      val w = if (q == nBands - 1) 64 - lo else width
      val mask = if (w >= 64) -1L else (1L << w) - 1L
      shiftright(col("sketch"), lo).bitwiseAND(lit(mask))
    }
    val blocked = sk.select(col("doc"), col("sketch"),
      posexplode(array(bandExprs: _*)))
      .withColumnRenamed("pos", "q").withColumnRenamed("col", "block")
    val a = blocked.alias("a"); val b = blocked.alias("b")
    a.join(b, col("a.q") === col("b.q") && col("a.block") === col("b.block") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        hamming(col("a.sketch"), col("b.sketch")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle:
    * explode distinct shingles, self-join on shingle, count intersections,
    * |A∪B| = |A|+|B|−|A∩B|. Quadratic only within shingle groups. */
  def ngramJaccardPairs(
      docs: DataFrame, id: String, text: String,
      shingleLen: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    val sh = docs.select(col(id).as("doc"),
        explode(array_distinct(shingles(col(text), shingleLen))).as("sh"))
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
