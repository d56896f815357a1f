package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: isolate where ann_cosine_topk spends its time. */
object ScaleDiag2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[diag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    timed("count embeddings")(e.count())
    timed("norms only") {
      e.select(col("vec_id"), graft.functions.AnnSearch.l2norm(col("embedding")).as("n")).agg(sum("n")).count()
    }
    timed("full ann_cosine_topk")(SparkEntry.queries("ann_cosine_topk")(spark, dir).count())
    timed("full ann_cosine_topk again")(SparkEntry.queries("ann_cosine_topk")(spark, dir).count())
    SparkEntry.queries("ann_cosine_topk")(spark, dir).explain("formatted")
    timed("full dedup_minhash_lsh")(SparkEntry.queries("dedup_minhash_lsh")(spark, dir).count())
    timed("minhash sig only") {
      import graft.functions.TextDedup
      spark.read.parquet(s"$dir/documents.parquet")
        .select(TextDedup.minHashSignatureFromHashes(
          TextDedup.shingleHashes(col("text"), 3), 16).as("s"))
        .select(explode(col("s"))).agg(sum("col")).count()
    }
    timed("minhash candidates (pre-distinct)") {
      import graft.functions.{TextDedup, VecExprs}
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val sig = docs.select(col("doc_id").as("doc"),
        TextDedup.minHashSignatureFromHashes(TextDedup.shingleHashes(col("text"), 3), 16).as("sig"))
      val banded = sig.select(col("doc"), col("sig"),
        explode(transform(sequence(lit(0), lit(3)),
          b => concat_ws("|", b.cast("string"), concat_ws(",",
            transform(slice(col("sig"), b * 4 + 1, lit(4)), x => x.cast("string")))))).as("bucket"))
      val a = banded.alias("a"); val b = banded.alias("b")
      a.join(b, col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc")).count()
    }
    timed("shingle hashes only") {
      import graft.functions.TextDedup
      spark.read.parquet(s"$dir/documents.parquet")
        .select(TextDedup.shingleHashes(col("text"), 3).as("s"))
        .select(explode(col("s"))).agg(sum("col")).count()
    }
    spark.stop()
  }
}
