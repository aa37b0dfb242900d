package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: time triangleCounts under both closure regimes at one SF. */
object TriStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val li = graft.core.Tables.lineitem(spark, dir)
    val edges = graft.operators.PageRank.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    for ((tag, thr) <- Seq(("wedge", 0L), ("intersect", Long.MaxValue))) {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.operators.Triangles
          .triangleCounts(edges, broadcastEdgeThreshold = thr).count()
        println(f"[tri] $tag run$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }
    spark.stop()
  }
}
