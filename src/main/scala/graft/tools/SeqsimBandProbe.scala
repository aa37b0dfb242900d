package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Band-bucket histogram for the seqsim banded config choices: how many
  * candidate pairs does each (numHashes, bands) generate at scale? */
object SeqsimBandProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val ev = graft.core.Tables.events(spark, dir).withColumn("tok",
      concat(col("event_type"), lit(":"),
        least(floor(col("value") / 25), lit(9.0)).cast("long")))
    val seqs = ev.filter(col("user_id").isNotNull)
      .groupBy(col("user_id").cast("long").as("uid"))
      .agg(transform(sort_array(collect_list(struct(
          col("ts").as("ts"), col("event_id").as("tie"), col("tok").as("tok")))),
        x => x.getField("tok")).as("toks"))
    val grams = seqs.select(col("uid"),
        graft.functions.HashExprs.wordNgrams(col("toks"), 2).as("gs"))
      .filter(size(col("gs")) > 0)
    for ((nh, nb) <- Seq((8, 4), (8, 2), (16, 4))) {
      val keys = grams.select(col("uid"),
        explode(graft.functions.HashExprs.lshBandKeys(
          graft.functions.HashExprs.minHashSignaturePoly(col("gs"), nh),
          nb, nh / nb)).as("bk"))
      val h = keys.groupBy(col("bk")).count()
        .agg(count(lit(1)).as("buckets"), max(col("count")).as("maxb"),
          sum(col("count") * (col("count") - 1)).as("pairs2x"))
        .head()
      println(s"[probe] k=$nh b=$nb r=${nh / nb}: buckets=${h.getLong(0)} " +
        s"maxBucket=${h.getLong(1)} orientedCandPairs=${h.getLong(2)}")
    }
    spark.stop()
  }
}
