package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Scratch: executed-plan node metrics (numOutputRows) for one query. */
object TriStats2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0); val q = args(1)
    val df = graft.SparkEntry.queries(q)(spark, dir)
    df.collect()
    def walk(p: SparkPlan, depth: Int): Unit = {
      val rows = p.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
      println(f"${"  " * depth}${p.nodeName}%-40s rows=$rows")
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, depth + 1)
        case _ =>
          p.children.foreach(walk(_, depth + 1))
          p.subqueries.foreach(walk(_, depth + 1))
      }
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
