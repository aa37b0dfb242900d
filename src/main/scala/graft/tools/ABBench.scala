package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B harness for plan-shape experiments (not part of the public
  * surface; run via `sbt "runMain graft.tools.ABBench"`). */
object ABBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nested = graft.core.Tables.ordersNested(spark, dir)
    nested.count() // warm
    def time(tag: String)(f: => Long): Unit =
      for (i <- 1 to 2) {
        val t0 = System.nanoTime(); val n = f
        println(f"[ab] $tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    val qs = transform(col("items"), _.getField("quantity"))
    time("udaf") {
      nested.agg(graft.reducers.ElementwiseAgg.elementwiseSumCount(qs).as("ew"))
        .select(posexplode(col("ew"))).count()
    }
    time("explode") {
      nested.select(posexplode(qs).as(Seq("pos", "q")))
        .groupBy(col("pos")).agg(round(sum(col("q")), 2).as("s"), count(col("q")).as("n"))
        .count()
    }
    spark.stop()
  }
}
