package graft

import graft.operators.SessionCollector
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Session-gap window semantics (the reference Collector's re-armed timer,
  * /root/reference/config/collector.go:76-98): events closer than the gap
  * chain into one session; a quiet period of `gap` flushes the group.
  */
class SessionCollectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("declarative session_window groups by gap") {
    import spark.implicits._
    val t0 = 1704067200000L
    def ts(sec: Long) = new java.sql.Timestamp(t0 + sec * 1000)
    val events = Seq(
      ("k1", ts(0)), ("k1", ts(10)), ("k1", ts(25)),   // one session (gaps < 30)
      ("k1", ts(100)), ("k1", ts(120)),                // second session
      ("k2", ts(0))).toDF("key", "ts")
    val out = SessionCollector.sessionize(events, "key", "ts", "30 seconds")
      .orderBy("key", "session_start")
      .collect().map(r => (r.getString(0), r.getLong(3)))
    assert(out.toSeq === Seq(("k1", 3L), ("k1", 2L), ("k2", 1L)))
  }

  test("flatMapGroupsWithState collector: re-armed timer flushes the group after the gap") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val out = SessionCollector.collectGroupsStreaming(input.toDS(), gapMillis = 1500L)
    val q = out.writeStream
      .format("memory").queryName("collector_out")
      .outputMode("append")
      .start()
    // with ProcessingTimeTimeout the engine schedules timer-driven batches
    // continuously, so processAllAvailable never quiesces — poll instead
    def groups(): Map[String, Set[String]] = spark.table("collector_out")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    def eventually[A](deadlineMs: Long)(f: => Option[A]): A = {
      val end = System.currentTimeMillis() + deadlineMs
      var r = f
      while (r.isEmpty && System.currentTimeMillis() < end) { Thread.sleep(200L); r = f }
      r.getOrElse(fail(s"condition not met within ${deadlineMs}ms; groups=${groups()}"))
    }
    try {
      // two appends within the gap: the second RE-ARMS the timer
      input.addData(("a", "e1"), ("b", "x1"))
      Thread.sleep(500L)
      input.addData(("a", "e2"))
      // after a quiet period > gap, timer-driven batches flush the groups
      val g = eventually(20000L) {
        val g0 = groups()
        if (g0.contains("a") && g0.contains("b")) Some(g0) else None
      }
      assert(g("a") === Set("e1", "e2"), "group flushes with ALL buffered events (re-armed timer)")
      assert(g("b") === Set("x1"))
    } finally q.stop()
  }
}
