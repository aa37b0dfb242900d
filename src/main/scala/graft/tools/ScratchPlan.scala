package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: print a query's optimized + executed plan for pin design. */
object ScratchPlan {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0) else "t_quality"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(q)(spark, dir)
    println("=== OPTIMIZED ===")
    println(df.queryExecution.optimizedPlan.toString)
    println("=== EXECUTED ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
