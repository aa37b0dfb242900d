package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev smoke tool: runs the flagship SparkEntry.entry and prints the row
  * count (a local replica of the CI smoke check). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("ENTRY_ROWS=" + graft.SparkEntry.entry(spark).count())
    spark.stop()
  }
}
