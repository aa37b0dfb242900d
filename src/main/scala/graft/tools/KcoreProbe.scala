package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: peel rounds + core sizes for kCore over the lineitem
  * part co-occurrence graph, to pick the graded k and the oracle's
  * fixed unroll depth (which must be >= the measured rounds at every
  * graded scale; extra rounds are idempotent). */
object KcoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val ks = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(2, 3, 4, 6, 8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val edges = graft.operators.PageRank.coOccurrenceEdges(
      li, "l_orderkey", "l_partkey").localCheckpoint()
    println(s"[kcore] directed co-occurrence edges: ${edges.count()}")
    for (k <- ks) {
      val t0 = System.nanoTime()
      // instrumented copy of the KCore loop to expose the round count
      var e = edges.select(col("src"), col("dst"))
        .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
      var m = e.count()
      var rounds = 0
      var converged = m == 0
      while (!converged && rounds < 64) {
        rounds += 1
        val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select(col("src").as("node"))
        val next = e.join(keep.select(col("node").as("src")), "src")
          .join(keep.select(col("node").as("dst")), "dst")
          .select(col("src"), col("dst")).localCheckpoint()
        val m2 = next.count()
        converged = m2 == m
        e = next; m = m2
      }
      val nodes = e.select(col("src")).distinct().count()
      println(f"[kcore] k=$k%-3d rounds=$rounds%-3d coreNodes=$nodes%-7d " +
        f"coreDirectedEdges=$m%-8d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
