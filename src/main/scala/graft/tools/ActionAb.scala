package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch A/B: .count() vs noop-write materialization per query — how
  * much does Catalyst's count-star column pruning under-measure a
  * benchmark action for queries without a top-level aggregate? */
object ActionAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.drop(1)) {
      val fn = graft.SparkEntry.queries(q)
      def t(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      fn(spark, dir).count() // warm
      val c = t(fn(spark, dir).count())
      val w = t(fn(spark, dir).write.format("noop").mode("overwrite").save())
      println(f"[ab] $q%-16s count=$c%6.2fs noop=$w%6.2fs ratio=${w / c}%5.2f")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
