package graft

import graft.ingest.MergeApply
import graft.lake.{LakeTable, Maintenance}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 scale fixes for the table-format metadata path:
  *
  *  - `Maintenance.rebucket` lifts the create-time bucket count (which bounds
  *    strategy-3 merge parallelism and write layout) without losing a row or
  *    breaking time travel;
  *  - optimistic commit-conflict retry (Iceberg semantics) lets maintenance
  *    run BESIDE a live writer instead of crashing one of the two.
  */
class RebucketConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def delta(ids: Seq[Long], op: String, seqOf: Long => Long,
      content: Long => String): DataFrame = {
    import spark.implicits._
    ids.toDF("id").select(
      concat(lit("repo-"), col("id") % 16).as("repo"),
      concat(lit("src/f"), col("id"), lit(".scala")).as("path"),
      lit(op).as("op"),
      udf(seqOf).apply(col("id")).as("seq"),
      struct(
        concat(lit("repo-"), col("id") % 16).as("repo"),
        concat(lit("src/f"), col("id"), lit(".scala")).as("path"),
        lit("c0").as("commit"),
        lit("scala").as("lang"),
        udf(content).apply(col("id")).as("content")).as("after"))
  }

  private def shaSet(df: DataFrame): Set[String] =
    df.select(concat_ws("|", col("repo"), col("path"), sha2(col("content"), 256)))
      .collect().map(_.getString(0)).toSet

  test("rebucket 32→128: converged content, new layout, old snapshots readable") {
    val dir = TestSpark.tmpDir("graft-rebucket")
    val table = LakeTable.create(spark, dir, numBuckets = 32, targetFileRows = 500L)
    MergeApply.merge(table, delta(0L until 5000L, "insert", id => id, id => s"v1-$id"), Map.empty)
    MergeApply.merge(table, delta(Seq(9L), "delete", _ => 9000L, _ => ""), Map.empty)
    val before = shaSet(table.read())
    val vOld = table.snapshot.version

    val r = Maintenance.rebucket(table, 128)
    assert(r.oldBuckets === 32 && r.newBuckets === 128)
    val snap = table.snapshot
    assert(snap.numBuckets === 128)
    assert(snap.files.forall(_.bucket < 128))
    assert(snap.files.map(_.bucket).distinct.size > 32,
      "rewritten data must actually occupy the wider bucket space")
    assert(shaSet(table.read()) === before, "rebucket must not change any row")

    // time travel: the pre-rebucket snapshot still reads (its files survive
    // until expireSnapshots)
    assert(shaSet(table.read(table.snapshotAt(vOld))) === before)

    // post-rebucket merges use the new bucket function end-to-end
    val r2 = MergeApply.merge(table,
      delta(Seq(123L), "update", _ => 10000L, id => s"v2-$id"), Map.empty)
    assert(r2.eventsApplied === 1)
    assert(r2.filesRewritten <= 2, "pruning must survive the rebucket")
    assert(table.read().filter(col("content") === "v2-123").count() === 1)
  }

  test("rebucket to the same count is a no-op") {
    val dir = TestSpark.tmpDir("graft-rebucket-noop")
    val table = LakeTable.create(spark, dir, numBuckets = 8)
    MergeApply.merge(table, delta(0L until 100L, "insert", id => id, id => s"x-$id"), Map.empty)
    val v = table.snapshot.version
    val r = Maintenance.rebucket(table, 8)
    assert(r.filesWritten === 0 && table.snapshot.version === v)
  }

  test("numBuckets cannot change without replacing every live file") {
    val dir = TestSpark.tmpDir("graft-rebucket-guard")
    val table = LakeTable.create(spark, dir, numBuckets = 8)
    MergeApply.merge(table, delta(0L until 100L, "insert", id => id, id => s"x-$id"), Map.empty)
    intercept[IllegalArgumentException] {
      table.commit(Set.empty, Seq.empty, Map.empty, Map.empty, newNumBuckets = Some(16))
    }
  }

  test("two concurrent bulk (strategy-3) merges on DIFFERENT tables proceed in parallel") {
    // round-3 design serialized these behind a session-global planLock (the
    // co-partition conf was set-and-restored per merge); the conf is now an
    // engine-owned session setting, so nothing serializes cross-table merges
    val dirA = TestSpark.tmpDir("graft-par-a")
    val dirB = TestSpark.tmpDir("graft-par-b")
    val tA = LakeTable.create(spark, dirA, numBuckets = 8, targetFileRows = 500L)
    val tB = LakeTable.create(spark, dirB, numBuckets = 8, targetFileRows = 500L)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    def bulk(t: LakeTable, tag: String): Thread = new Thread(() => {
      try {
        barrier.await() // both merges plan/run concurrently on one session
        // 150k rows ≫ BroadcastDeltaMaxRows ⇒ strategy-3 bucket-aligned shuffle
        val r = MergeApply.merge(t,
          delta(0L until 150000L, "insert", id => id, id => s"$tag-$id"), Map.empty)
        assert(r.eventsApplied === 150000L)
      } catch { case e: Throwable => errors.add(e) }
    }, s"bulk-$tag")
    val a = bulk(tA, "a"); val b = bulk(tB, "b")
    a.start(); b.start(); a.join(300000); b.join(300000)
    assert(errors.isEmpty, s"concurrent bulk merges failed: ${errors.peek()}")
    assert(tA.read().count() === 150000L && tB.read().count() === 150000L)
    assert(tA.read().filter(col("content") === "a-7").count() === 1)
    assert(tB.read().filter(col("content") === "b-7").count() === 1)
    // (the round-3 engine-owned co-partition conf is gone: strategy 3 joins
    // on the real key and routes the write by bucket explicitly, so merges
    // no longer touch session conf at all — nothing left to serialize on)
  }

  test("concurrent compaction beside a live writer retries instead of crashing") {
    val dir = TestSpark.tmpDir("graft-concurrent")
    val table = LakeTable.create(spark, dir, numBuckets = 8, targetFileRows = 300L)
    MergeApply.merge(table, delta(0L until 3000L, "insert", id => id, id => s"base-$id"), Map.empty)

    val nRounds = 8
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // writer: a stream of small merges (separate LakeTable handle — two
    // independent committers, like a tail beside a maintenance job)
    val writer = new Thread(() => {
      try {
        val t = LakeTable.load(spark, dir)
        (1 to nRounds).foreach { i =>
          MergeApply.merge(t,
            delta(Seq(7L, 1000L + i), "update", _ => 100000L + i, id => s"w$i-$id"),
            Map.empty)
        }
      } catch { case e: Throwable => errors.add(e) }
    }, "concurrent-writer")
    // maintenance: repeated forced compactions on its own handle
    val compactor = new Thread(() => {
      try {
        val t = LakeTable.load(spark, dir)
        (1 to 4).foreach { _ => Maintenance.compact(t, force = true); Thread.sleep(30) }
      } catch { case e: Throwable => errors.add(e) }
    }, "concurrent-compactor")
    writer.start(); compactor.start()
    writer.join(300000); compactor.join(300000)
    assert(errors.isEmpty, s"concurrent commit crashed: ${errors.peek()}")

    // convergence: the LAST writer round won on key 7; every row intact
    // (keys 1001..1008 exist in the base, so the updates add no rows)
    val t2 = LakeTable.load(spark, dir)
    assert(t2.read().count() === 3000)
    assert(t2.read().filter(col("path") === "src/f7.scala")
      .select("content").collect()(0).getString(0) === s"w$nRounds-7")
    (1 to nRounds).foreach { i =>
      assert(t2.read().filter(col("path") === s"src/f${1000 + i}.scala")
        .select("content").collect()(0).getString(0) === s"w$i-${1000 + i}",
        s"round $i write lost")
    }
  }
}
