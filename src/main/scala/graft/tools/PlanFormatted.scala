package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the
  * optimization-round evidence artifact (plans/r12/<q>_<tag>.txt).
  *
  * Usage: runMain graft.tools.PlanFormatted <sfDir> <outDir> <tag> <q> [q...]
  *
  * Session mirrors Bench (local[32], shuffle=32) so the dumped plan is
  * the one the bench times, not the 4-core test shape.
  */
object PlanFormatted {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanFormatted <sfDir> <outDir> <tag> <query> [query...]")
    val dir = args(0); val out = args(1); val tag = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(out))
    for (q <- args.drop(3)) {
      val txt =
        try {
          val df = graft.SparkEntry.queries(q)(spark, dir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"ERROR: ${e}" }
      Files.writeString(Paths.get(s"$out/${q}_$tag.txt"), txt)
      println(s"[plan] wrote $out/${q}_$tag.txt (${txt.length} chars)")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
