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

  /** MinHash signature (array<bigint> of length k) over a shingle array.
    * The j-th permutation is xxhash64 of (j, shingle) — k independent hash
    * families without affine mixing (whose wraparound would trip ANSI-mode
    * overflow checks); min over shingles per permutation. */
  def minHashSignature(shingleArr: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), j =>
      aggregate(shingleArr, lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(j, s))))

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
    val sig = docs
      .select(col(id).as("doc"), minHashSignature(shingles(col(text), shingleLen), k).as("sig"))
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
    val hashes = transform(shingleArr, s => xxhash64(s))
    // acc_i = Σ_s (2*bit_i(h(s)) - 1); simhash bit i = acc_i > 0.
    // The 64 per-bit aggregates are built at plan time (shift amounts must be
    // literals); at extreme scale a custom TypedImperativeAggregate would
    // collapse this to one pass, but the declarative form stays in codegen.
    (0 until 64).map { i =>
      val bitSum = aggregate(hashes, lit(0L),
        (a2, h) => a2 + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on the 4 16-bit sketch quarters (a pair
    * within hamming distance ≤ 3 of 64 bits must agree on at least one
    * quarter — pigeonhole), then verify with the true hamming distance. */
  def simHashPairs(
      docs: DataFrame, id: String, text: String,
      shingleLen: Int = 3, maxHamming: Int = 3): DataFrame = {
    val sk = docs.select(col(id).as("doc"),
      simHash(shingles(col(text), shingleLen)).as("sketch"))
    val blocked = sk.select(col("doc"), col("sketch"),
      posexplode(array((0 until 4).map(q =>
        shiftright(col("sketch"), q * 16).bitwiseAND(lit(0xffffL))): _*)))
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
