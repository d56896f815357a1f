package graft

import graft.functions.{AnnSearch, Keys, TextDedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data operators: near-dup detection + ANN, verified against
  * brute-force ground truth computed on the driver.
  */
class TextDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    Seq(
      (0L, base),
      (1L, base),                                           // exact dup of 0
      (2L, base.replace("today", "tomorrow")),              // near dup of 0
      (3L, "completely different content about spark catalyst optimizer rules"),
      (4L, "the quick brown fox jumps over the lazy dog again and again next week"), // near dup
      (5L, "another unrelated document mentioning merge snapshots and fences")
    ).toDF("doc_id", "text")
  }

  test("shingles + minhash signature shapes") {
    val sh = docs.select(col("doc_id"), TextDedup.shingles(col("text"), 3).as("sh"))
      .filter(col("doc_id") === 0).collect()(0).getSeq[String](1)
    assert(sh.head === "the quick brown" && sh.contains("lazy dog again"))
    val sig = docs.select(TextDedup.minHashSignature(TextDedup.shingles(col("text"), 3), 16))
      .collect()(0).getSeq[Long](0)
    assert(sig.length === 16)
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = TextDedup.minHashLshPairs(docs, "doc_id", "text", minEst = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)), "exact dup must be found")
    val est01 = pairs.find(p => p._1 == 0L && p._2 == 1L).get._3
    assert(est01 === 1.0, "identical docs have estimate 1.0")
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }

  test("simhash: identical docs distance 0, near dups close, unrelated far") {
    val sk = docs.select(col("doc_id"),
      TextDedup.simHash(TextDedup.shingles(col("text"), 3)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk(0L) === sk(1L))
    assert(java.lang.Long.bitCount(sk(0L) ^ sk(2L)) < java.lang.Long.bitCount(sk(0L) ^ sk(3L)),
      "near dup must be closer than unrelated")
    val pairs = TextDedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("ngram jaccard: exact math on a known pair") {
    val pairs = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", minJaccard = 0.1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) === 1.0)
    // doc 0 vs 2: 13 words ⇒ 11 shingles; only the final word differs and it
    // appears only in the last shingle ⇒ |∩| = 10, |∪| = 12
    assert(math.abs(pairs((0L, 2L)) - 10.0 / 12.0) < 1e-9)
  }

  test("exact dedup groups") {
    val g = TextDedup.exactDupGroups(docs, "doc_id", "text")
      .filter(col("n") > 1).collect()
    assert(g.length === 1 && g(0).getLong(1) === 2 && g(0).getLong(2) === 0L)
  }

  test("ANN: LSH top-k achieves high recall vs brute force") {
    import spark.implicits._
    // deterministic synthetic embeddings: 200 vectors in 16 dims, clustered
    val vecs = (0 until 200).map { i =>
      val cluster = i % 8
      val v = (0 until 16).map { d =>
        val base = math.sin(cluster * 16 + d).toFloat
        base + 0.05f * graft.util.Rand.uniform(7L, i, d).toFloat
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 10)
    val bf = AnnSearch.bruteForceTopK(vecs, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = AnnSearch.lshTopK(vecs, queries, "vec_id", "embedding", 5, bits = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    assert(recall >= 0.8, s"LSH recall too low: $recall")
  }

  test("LSH bucket cap: degenerate boilerplate corpus completes, cap bounds the self-join") {
    import spark.implicits._
    // every doc is identical boilerplate → ALL docs land in the same band
    // buckets; without a cap the candidate join is a 50×50 cartesian blob
    val boiler = (0 until 50).map(i => (i.toLong,
      "exactly the same boilerplate header text repeated across every document in this corpus"))
      .toDF("doc_id", "text")
    val capped = TextDedup.minHashLshPairs(boiler, "doc_id", "text", minEst = 0.1, bucketCap = 5)
    assert(capped.count() === 0, "cap must drop the degenerate buckets entirely")
    val uncapped = TextDedup.minHashLshPairs(boiler, "doc_id", "text", minEst = 0.1)
    assert(uncapped.count() === 50L * 49 / 2, "under the cap, all pairs emerge")
    val simCapped = TextDedup.simHashPairs(boiler, "doc_id", "text", bucketCap = 5)
    assert(simCapped.count() === 0)
  }

  test("adversarial skew: 50% boilerplate corpus — no window over the bucket key in the plan") {
    import spark.implicits._
    // half the corpus is identical boilerplate: the degenerate band buckets
    // that the cap drops. The protective mechanism itself must not be the
    // skew hotspot — a count().over(partitionBy(bucket)) would materialize
    // the whole degenerate bucket in ONE task's window buffer first.
    val docs = (0 until 200).map { i =>
      if (i % 2 == 0) (i.toLong, "exactly the same boilerplate header text repeated across half the corpus")
      else (i.toLong, (0 until 10).map(w => s"w${i}x$w").mkString(" ")) // zero shared words
    }.toDF("doc_id", "text")
    val lsh = TextDedup.minHashLshPairs(docs, "doc_id", "text", minEst = 0.3, bucketCap = 50)
    val lshPlan = lsh.queryExecution.executedPlan.toString
    assert(!lshPlan.contains("Window"), s"bucket cap must not plan a Window:\n${lshPlan.take(2000)}")
    // boilerplate pairs are gone (bucket of 100 > cap 50); unique docs don't pair
    assert(lsh.count() === 0)
    val sim = TextDedup.simHashPairs(docs, "doc_id", "text", bucketCap = 50)
    val simPlan = sim.queryExecution.executedPlan.toString
    assert(!simPlan.contains("Window"), s"simhash cap must not plan a Window:\n${simPlan.take(2000)}")
    assert(sim.count() === 0)
  }

  test("IVF: trained Lloyd centroids are deterministic and beat the bootstrap on recall") {
    import spark.implicits._
    val vecs = (0 until 240).map { i =>
      val cluster = i % 8
      val v = (0 until 16).map { d =>
        val base = math.sin(cluster * 16 + d).toFloat
        base + 0.05f * graft.util.Rand.uniform(13L, i, d).toFloat
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val c1 = AnnSearch.lloydCentroids(vecs, "vec_id", "embedding", 8, 2)
    val c2 = AnnSearch.lloydCentroids(vecs, "vec_id", "embedding", 8, 2)
    assert(c1 === c2, "training must be bit-deterministic (fixed-point means)")
    assert(c1.size === 8 && c1.forall(_._2.size === 16))
    // quality: after 2 Lloyd rounds on an 8-cluster corpus, members of the
    // same generator cluster should agree on their nearest trained centroid
    // far more often than under the raw first-8 bootstrap seeds
    def purity(cents: Seq[(Long, Seq[Double])]): Double = {
      val cdf = cents.toDF("cent_id", "cvec")
      val assigned = vecs.crossJoin(broadcast(cdf))
        .select(col("vec_id"),
          (AnnSearch.dot(col("embedding"), col("cvec")) /
            (AnnSearch.l2norm(col("embedding")) * AnnSearch.l2norm(col("cvec")))).as("cos"),
          col("cent_id"))
        .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
            .orderBy(col("cos").desc, col("cent_id"))))
        .filter(col("_rn") === 1)
        .select(col("vec_id"), col("cent_id"))
        .collect().map(r => (r.getLong(0) % 8, r.getLong(1)))
      // majority centroid per generator cluster
      assigned.groupBy(_._1).map { case (_, xs) =>
        xs.groupBy(_._2).values.map(_.size).max.toDouble / xs.size
      }.sum / 8.0
    }
    val seed = vecs.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    assert(purity(c1) >= purity(seed),
      s"trained purity ${purity(c1)} must be >= bootstrap purity ${purity(seed)}")
    assert(purity(c1) > 0.95, s"trained purity too low: ${purity(c1)}")
  }

  test("IVF: Lloyd trains at C=4096, D=256 (distributed mean; flat closure) and the footprint guard trips") {
    // C ~ sqrt(N) regime: the per-iteration driver payload must be the
    // centroid matrix itself (the division runs inside the aggregate job),
    // and the C×D×8 ceiling must fail fast, not OOM mid-training.
    val n = 8192; val c = 4096; val dim = 256
    val vecs = spark.range(n.toLong).toDF("vec_id")
      .select(col("vec_id"), expr(
        s"transform(sequence(0, ${dim - 1}), d -> " +
          "cast(pmod(hash(vec_id, d), 1999) as float) / 1000.0 - 1.0)").as("embedding"))
    val t0 = System.nanoTime()
    val trained = AnnSearch.lloydCentroids(vecs, "vec_id", "embedding", c, iters = 2)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"C=$c D=$dim n=$n 2 iters: $secs%.1f s, ${trained.size} centroids")
    assert(trained.nonEmpty && trained.size <= c)
    assert(trained.forall(_._2.size === dim))
    assert(trained.forall(_._2.forall(v => !v.isNaN && v.abs <= 1.001)))
    val ex = intercept[IllegalArgumentException] {
      AnnSearch.lloydCentroids(vecs, "vec_id", "embedding", c, iters = 1,
        maxCentroidBytes = 1L << 20)
    }
    assert(ex.getMessage.contains("maxCentroidBytes"), ex.getMessage)
  }

  test("VecArgMaxCos kernel matches the declarative argmax and breaks ties to the lowest id") {
    import spark.implicits._
    import graft.functions.VecExprs
    val vecs = (0 until 200).map { i =>
      (i.toLong, (0 until 16).map(d => graft.util.Rand.uniform(7L, i, d).toFloat - 0.5f))
    }.toDF("vec_id", "embedding")
    // centroids 2 and 5 are IDENTICAL: every row scoring them ties at the
    // rounded cos9, and the contract picks the LOWER index
    val c0 = (0 until 6).map(c =>
      (0 until 16).map(d => math.sin(c * 16 + d) / 2).toIndexedSeq: Seq[Double])
    val cents = c0.updated(5, c0(2))
    val cnorms = cents.map { cv => var a = 0.0; cv.foreach(x => a += x * x); math.sqrt(a) }
    val kernel = vecs.select(col("vec_id"),
      VecExprs.argMaxCos(col("embedding"), cents, cnorms).as("idx")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // declarative reference: crossJoin + Spark round() + row_number window
    val cdf = cents.zipWithIndex.map { case (cv, i) => (i, cv) }.toDF("idx", "cvec")
    val expected = vecs.crossJoin(broadcast(cdf))
      .select(col("vec_id"), col("idx"),
        round(AnnSearch.dot(col("embedding"), col("cvec")) /
          (AnnSearch.l2norm(col("embedding")) * AnnSearch.l2norm(col("cvec"))) * 1e9)
          .cast("long").as("cos9"))
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("cos9").desc, col("idx"))))
      .filter(col("_rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kernel === expected, "kernel argmax must equal round()+window argmax")
    assert(!kernel.values.exists(_ == 5), "ties against an identical centroid must pick index 2")
    assert(kernel.values.toSet.contains(2), "the duplicated centroid must win somewhere")
  }

  test("ngram jaccard: shingle document-frequency cap bounds a boilerplate corpus") {
    import spark.implicits._
    // one shingle shared by 50% of docs: without a DF cap the shingle-group
    // self-join contributes k²/2 candidate rows (the whole query at 10^6 docs)
    val docs = (0 until 200).map { i =>
      if (i % 2 == 0) (i.toLong, s"unique${i}a unique${i}b BOILER")
      else (i.toLong, s"only${i}x only${i}y only${i}z")
    }.toDF("doc_id", "text")
    val capped = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleLen = 1, minJaccard = 0.01, maxDocFreq = 50)
    // the cap is the same broadcast-anti-join shape as the LSH bucket cap —
    // never a window over the hot shingle key
    val plan = capped.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"DF cap must not plan a Window:\n${plan.take(2000)}")
    assert(capped.count() === 0, "with BOILER capped away no doc pair shares a shingle")
    val uncapped = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleLen = 1, minJaccard = 0.01, maxDocFreq = 2000)
    assert(uncapped.count() === 100L * 99 / 2, "under the cap all boilerplate pairs emerge")
    // Jaccard stays exact over the capped shingle space: identical docs that
    // ALSO carry the boilerplate keep jaccard 1.0 on their surviving shingles
    val twins = Seq((1000L, "same same2 BOILER"), (1001L, "same same2 BOILER"))
      .toDF("doc_id", "text").union(docs)
    val t = TextDedup.ngramJaccardPairs(twins, "doc_id", "text",
      shingleLen = 1, minJaccard = 0.5, maxDocFreq = 50)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(t((1000L, 1001L)) === 1.0)
  }

  test("embed near-dup: banded gate survives a corpus where a too-narrow width drops every bucket") {
    import spark.implicits._
    val vecs = (0 until 512).map { i =>
      val cluster = i % 8
      val v = (0 until 16).map { d =>
        math.sin(cluster * 16 + d).toFloat + 0.02f * graft.util.Rand.uniform(31L, i, d).toFloat
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    // the OLD failure shape: width frozen too narrow for the corpus (here
    // 1 bit ⇒ 2 buckets of ~256 ≫ cap) — every bucket oversized in every
    // band, the cap silently dropped the ENTIRE corpus. The banded operator
    // now at least REPORTS the drop instead of hiding it…
    val collapsed = AnnSearch.embedNearDupPairs(vecs, "vec_id", "embedding",
      bitsPerBand = 1, bands = 2, minCosE4 = 8000L, bucketCap = 100, planeDim = 16)
    assert(collapsed.pairs.count() === 0)
    assert(collapsed.droppedBandRows.count() === 512L * 2,
      "the dropped-rows side must expose the silent-truncation failure mode")
    // …and the corpus-scaled width (bitlength(512/64) = 4 bits ⇒ 16 buckets
    // per band ≈ 32 rows each) keeps every bucket under the cap: near-dup
    // pairs flow and nothing is dropped
    val scaled = AnnSearch.embedNearDupPairs(vecs, "vec_id", "embedding",
      bitsPerBand = 4, bands = 2, minCosE4 = 8000L, bucketCap = 200, planeDim = 16)
    assert(scaled.droppedBandRows.count() === 0)
    // the per-band cap must keep the broadcast-anti-join shape (no window
    // over the skewed bucket key), same contract as the text dedup caps
    val plan = scaled.pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"banded cap must not plan a Window:\n${plan.take(1500)}")
    val scaledPairs = scaled.pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(scaledPairs.nonEmpty, "cluster members must surface as near-dups")
    // banding recall: band 0 alone is the single-table gate — two bands can
    // only ADD candidate pairs (pair survives if it meets in ANY band)
    val oneBand = AnnSearch.embedNearDupPairs(vecs, "vec_id", "embedding",
      bitsPerBand = 4, bands = 1, minCosE4 = 8000L, bucketCap = 200, planeDim = 16)
      .pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oneBand.subsetOf(scaledPairs), "banding must be a superset of the single table")
    assert(scaledPairs.size >= oneBand.size)
  }

  test("broadcast centroid kernel: same results as the literal kernel, flat task-closure size at C=256") {
    import spark.implicits._
    import graft.functions.VecExprs
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val vecs = (0 until 100).map { i =>
      (i.toLong, (0 until 64).map(d => graft.util.Rand.uniform(17L, i, d).toFloat - 0.5f))
    }.toDF("vec_id", "embedding")
    val cents = (0 until 256).map(c =>
      (0 until 64).map(d => math.sin(c * 64 + d) / 2).toIndexedSeq: Seq[Double])
    val cnorms = cents.map { cv => var a = 0.0; cv.foreach(x => a += x * x); math.sqrt(a) }
    val bc = VecExprs.broadcastCentroids(spark, cents, cnorms)
    val viaBroadcast = vecs.select(col("vec_id"),
      VecExprs.argMaxCosBroadcast(col("embedding"), bc).as("idx"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaLiteral = vecs.select(col("vec_id"),
      VecExprs.argMaxCos(col("embedding"), cents, cnorms).as("idx"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaBroadcast === viaLiteral, "broadcast kernel must be bit-identical")
    // the closure/plan payload: the literal expression embeds the C×D matrix
    // (256×64 doubles ≈ 131 KB); the broadcast expression carries a handle
    def serializedSize(a: AnyRef): Int = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(a); oos.close(); bos.size()
    }
    val litSize = serializedSize(ColumnBridge.expression(
      VecExprs.argMaxCos(col("embedding"), cents, cnorms)))
    val bcSize = serializedSize(ColumnBridge.expression(
      VecExprs.argMaxCosBroadcast(col("embedding"), bc)))
    assert(litSize > 100000, s"literal kernel should embed the matrix ($litSize bytes)")
    assert(bcSize < 20000, s"broadcast kernel closure must stay flat, was $bcSize bytes")
    bc.unpersist(blocking = false)
  }

  test("diff data: changed fields only, exclude_field dropped, primary key re-attached") {
    import spark.implicits._
    import graft.operators.DiffData
    val df = Seq(
      (1L, ("a", 1.0, "x"), ("a", 2.0, "y")),  // value + excluded props change
      (2L, ("a", 1.0, "x"), ("b", 1.0, "x")),  // name changes
      (3L, ("a", 1.0, "x"), ("a", 1.0, "x"))   // no change → dropped
    ).toDF("id", "before", "after")
      .select(col("id"),
        col("before").cast("struct<name:string,value:double,props:string>"),
        col("after").cast("struct<name:string,value:double,props:string>"))
    val out = DiffData.diff(df, "before", "after", Seq("id"), exclude = Seq("props"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[String](1), r.getMap[String, String](2)))
      .toMap
    assert(out.keySet === Set(1L, 2L), "no-op rows are dropped (reference returns nil)")
    assert(out(1L)._1 === Seq("value") && out(1L)._2 === Map("value" -> "2.0"))
    assert(out(2L)._1 === Seq("name") && out(2L)._2 === Map("name" -> "b"))
  }

  test("key grammar matches the reference's builder") {
    import spark.implicits._
    assert(Keys.buildKey(Some("agg"), Some("t"), "7") === "agg,t:7")
    assert(Keys.buildKey(None, Some("t"), "7") === "t:7")
    assert(Keys.buildKey(None, None, "7") === "7")
    val got = Seq(("agg", "t", "7")).toDF("a", "p", "i")
      .select(
        Keys.aggregationKey(col("a"), col("p"), col("i")),
        Keys.aggregationKey(lit(null).cast("string"), col("p"), col("i")),
        Keys.aggregationKey(col("i")))
      .collect()(0)
    assert(got.getString(0) === "agg,t:7")
    assert(got.getString(1) === "t:7")
    assert(got.getString(2) === "7")
  }

  test("IdxRule config surface: TABLENAME sentinel, aggre/user fields from the image") {
    import spark.implicits._
    val df = Seq(("orders", (7L, "corr-9", "alice")))
      .toDF("tbl", "img")
      .select(col("tbl"), col("img").cast("struct<oid:bigint,corr:string,op_user:string>"))
    val rule = Keys.IdxRule(
      tables = Seq("orders"), idxField = "oid",
      idxPrefix = Some(Keys.TableNameSentinel),
      aggreField = Some("corr"), userField = Some("op_user"),
      primaryKey = Seq("oid"), excludeField = Seq("corr"))
    val r = df.select(
      Keys.keyFor(rule, col("tbl"), col("img")).as("key"),
      Keys.userFor(rule, col("img")).as("user"),
      Keys.userFor(rule.copy(userField = None), col("img")).as("noUser"),
      Keys.keyFor(rule.copy(idxPrefix = Some("x"), aggreField = None), col("tbl"), col("img")).as("key2"))
      .collect()(0)
    assert(r.getString(0) === "corr-9,orders:7")
    assert(r.getString(1) === "alice")
    assert(r.isNullAt(2))
    assert(r.getString(3) === "x:7")
  }
}
