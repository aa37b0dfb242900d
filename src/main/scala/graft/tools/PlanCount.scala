package graft.tools

import org.apache.spark.sql.SparkSession

/** Print plan-shape counts (parquet scans, exchanges, reused exchanges)
  * for named queries — the quick iteration face of what PlanQualitySpec
  * pins. Counts come from the FINAL adaptive plan (after an execution),
  * so AQE stage reuse is visible, plus the initial plan for reference.
  *
  * Usage: runMain graft.tools.PlanCount <sfDir> <query> [query...]
  */
object PlanCount {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanCount <sfDir> <query> [query...]")
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def counts(p: String): String = {
      def c(s: String) = s.r.findAllIn(p).size
      s"scans=${c("Scan parquet")} exch=${c("Exchange")} " +
        s"reused=${c("(?i)ReusedExchange")} sorts=${c("\\bSort\\b")}"
    }
    for (q <- args.drop(1)) {
      val df = graft.SparkEntry.queries(q)(spark, args(0))
      println(s"[$q] pre : " + counts(df.queryExecution.executedPlan.toString))
      val n = df.count()
      println(s"[$q] post: " +
        counts(df.queryExecution.executedPlan.toString) + s" rows=$n")
    }
    spark.stop()
  }
}
