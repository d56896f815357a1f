package graft

import graft.gen.{ChangelogGen, GenConfig}
import graft.log.ChangeLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The ordered-delivery contract of the log layout: within each log
  * partition, segment FILES cover disjoint, contiguous offset ranges and
  * mtimes increase with offsets — the invariant `orderedDelivery` fence
  * filtering rests on. (A hash repartition by (partition, segment) violated
  * this: two segments of one partition could collide into one file whose
  * range overlapped its siblings'.)
  */
class ChangeLogContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-partition segment files have disjoint offset ranges and offset-ordered mtimes") {
    val cfg = GenConfig(seed = 3L, nEvents = 8000L, nRepos = 20, pathsPerRepo = 10,
      nPartitions = 4, contentLen = 40)
    val dir = TestSpark.tmpDir("graft-logcontract")
    ChangeLog.write(ChangelogGen.events(spark, cfg), dir, segmentsPerPartition = 5)

    val root = java.nio.file.Paths.get(dir)
    val partDirs = scala.util.Using.resource(java.nio.file.Files.list(root))(
      _.iterator().asScala.filter(_.getFileName.toString.startsWith("partition=")).toSeq)
    assert(partDirs.nonEmpty)
    partDirs.foreach { pd =>
      val files = scala.util.Using.resource(java.nio.file.Files.list(pd))(
        _.iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet")).toSeq)
      val ranges = files.map { f =>
        val df = spark.read.parquet(f.toString)
        val r = df.agg(min(col("offset")), max(col("offset"))).collect()(0)
        val mtime = java.nio.file.Files.getLastModifiedTime(f).toMillis
        (r.getLong(0), r.getLong(1), mtime)
      }.sortBy(_._1)
      // disjoint + mtime monotone in offset order
      ranges.sliding(2).foreach {
        case Seq((_, hi1, mt1), (lo2, _, mt2)) =>
          assert(hi1 < lo2, s"overlapping segment ranges in $pd: ($hi1, $lo2)")
          assert(mt1 < mt2, s"mtimes must follow offsets in $pd")
        case _ =>
      }
      // mtime encodes the file's min offset
      ranges.foreach { case (lo, _, mt) => assert(mt === 1704067200000L + lo) }
    }

    // empty changelog writes a valid, readable, empty log
    val emptyDir = TestSpark.tmpDir("graft-logempty")
    ChangeLog.write(ChangelogGen.events(spark, cfg.copy(nEvents = 0L)), emptyDir)
    assert(ChangeLog.readDF(spark, emptyDir).count() === 0)
  }
}
