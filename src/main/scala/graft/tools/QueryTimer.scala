package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries against any corpus dir — the
  * scale-soak micro-loop (full Bench runs all 123; iterating on one
  * finding needs just the affected handful).
  *
  * Usage: runMain graft.tools.QueryTimer <sfDir> <query> [query...]
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryTimer <sfDir> <query> [query...]")
    val dir = args(0)
    val b0 = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false")
    // ad-hoc conf overrides for A/B timing: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    val spark = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2))
      .foldLeft(b0) { case (b, Array(k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.drop(1)) {
      val fn = graft.SparkEntry.queries.getOrElse(q,
        sys.error(s"unknown query $q"))
      // noop-write, not count(): count-star pruning would delete every
      // non-aggregated computed column from the timed plan (see Bench)
      val n = fn(spark, dir).count() // rows for the report, untimed
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[qt] $q run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }
    spark.stop()
  }
}
