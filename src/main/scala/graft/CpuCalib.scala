package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Host-calibration: a pure-CPU Spark job (sha256 chain over generated rows,
  * no input IO, no shuffle, discarding output) at two parallelism levels.
  * The ratio is this host's actual parallel-speedup ceiling — virtualized
  * vCPUs may be overcommitted; no engine can scale past the silicon. */
object CpuCalib {
  def main(args: Array[String]): Unit = {
    def run(cores: Int): Double = {
      val s = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      def once(): Double = {
        val t0 = System.nanoTime()
        s.range(0, 512L * 1024 * 1024, 1, cores * 4)
          .select(sum(length(sha2(concat(lit("x"), (col("id") % 97).cast("string")), 256))))
          .collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val best = Seq.fill(2)(once()).min
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      best
    }
    val t8 = run(8); val t32 = run(32)
    println(f"[calib] t8=$t8%.2f t32=$t32%.2f speedup=${t8 / t32}%.2f efficiency=${t8 / t32 / 4.0}%.3f")
  }
}
