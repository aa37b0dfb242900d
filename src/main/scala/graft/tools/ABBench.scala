package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B harness for plan-shape experiments (not part of the public
  * surface; run via `sbt "runMain graft.tools.ABBench"`). Current matchup:
  * inverted-index vs PPJoin-prefix exact Jaccard pairs (see
  * graft.dedup.ngramJaccardPairsPrefix for the measured verdict). */
object ABBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.core.Tables.documents(spark, dir)
    docs.count() // warm
    def time(tag: String)(f: => Long): Unit =
      for (i <- 1 to 2) {
        val t0 = System.nanoTime(); val nr = f
        println(f"[ab] $tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$nr")
      }
    time("ngram-invidx") {
      graft.dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 50).count()
    }
    time("ngram-prefix") {
      graft.dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 2, 50).count()
    }
    val a = graft.dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 50)
      .collect().map(_.toSeq).toSet
    val b = graft.dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 2, 50)
      .collect().map(_.toSeq).toSet
    println(s"[ab] equal=${a == b} n=${a.size} / ${b.size}")
    spark.stop()
  }
}
