package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch cardinality + per-stage timing probe for the triangle plan
  * (not public surface). */
object TriStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val dur = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1000.0
        if (dur > 0.3)
          println(f"[stage] ${i.stageId}%4d ${dur}%6.2fs tasks=${i.numTasks}%3d ${i.name.take(80)}")
      }
    })
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val li = graft.core.Tables.lineitem(spark, dir)
    val edges = graft.operators.PageRank.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.operators.Triangles.triangleCounts(edges).count()
      println(f"[tri] run$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
