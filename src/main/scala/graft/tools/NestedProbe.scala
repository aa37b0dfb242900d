package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: what does the scan ReadSchema look like for a lambda-only
  * nested access, with and without workarounds? */
object NestedProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_nested").toString
    Seq((1L, Seq((1.0, 2.0, "a"), (3.0, 4.0, "b"))), (2L, Seq((5.0, 6.0, "c"))))
      .toDF("id", "items")
      .select(col("id"), transform(col("items"),
        x => struct(x.getField("_1").as("p"), x.getField("_2").as("q"),
          x.getField("_3").as("r"))).as("items"))
      .write.mode("overwrite").parquet(d)
    val df = spark.read.parquet(d)
      .select(col("id"), transform(col("items"), x => x.getField("q")).as("qs"))
    val plan = df.queryExecution.executedPlan.toString
    println("LAMBDA ReadSchema: " + "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("?"))
    // multi-field lambda body: the single-field rewrite cannot fire
    val dfm = spark.read.parquet(d)
      .select(col("id"), transform(col("items"),
        x => x.getField("q") * x.getField("p")).as("pq"))
    println("MULTI  ReadSchema: " + "ReadSchema: [^\n]*".r.findFirstIn(
      dfm.queryExecution.executedPlan.toString).getOrElse("?"))
    println("MULTI rows: " + dfm.collect().map(_.toSeq).mkString(" "))
    // aggregate HOF
    val dfa = spark.read.parquet(d)
      .select(col("id"), aggregate(col("items"), lit(0.0),
        (acc, x) => acc + x.getField("q")).as("sq"))
    println("AGG    ReadSchema: " + "ReadSchema: [^\n]*".r.findFirstIn(
      dfa.queryExecution.executedPlan.toString).getOrElse("?"))
    println("AGG rows: " + dfa.collect().map(_.toSeq).mkString(" "))
    // exists HOF
    val dfe = spark.read.parquet(d)
      .select(col("id"), exists(col("items"), x => x.getField("q") > 3.0).as("e"))
    println("EXISTS ReadSchema: " + "ReadSchema: [^\n]*".r.findFirstIn(
      dfe.queryExecution.executedPlan.toString).getOrElse("?"))
    println("EXISTS rows: " + dfe.collect().map(_.toSeq).mkString(" "))
    // explode-based access for comparison
    val df2 = spark.read.parquet(d)
      .select(col("id"), explode(col("items")).as("it"))
      .select(col("id"), col("it.q"))
    val plan2 = df2.queryExecution.executedPlan.toString
    println("EXPLODE ReadSchema: " + "ReadSchema: [^\n]*".r.findFirstIn(plan2).getOrElse("?"))
    // getField on array directly (items.q extracts array of q)
    val df3 = spark.read.parquet(d).select(col("id"), col("items.q").as("qs"))
    val plan3 = df3.queryExecution.executedPlan.toString
    println("ARRAYFIELD ReadSchema: " + "ReadSchema: [^\n]*".r.findFirstIn(plan3).getOrElse("?"))
    spark.stop()
  }
}
