package graft.tools
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("ENTRY_ROWS=" + graft.SparkEntry.entry(spark).count())
    spark.stop()
  }
}
