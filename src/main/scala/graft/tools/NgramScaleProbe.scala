package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** d_ngram's scale lever, measured: uncapped sum(df^2) candidate volume vs
  * the dfCap'd inverted index on a large corpus dir.
  * Usage: runMain graft.tools.NgramScaleProbe [sfDir] [dfCap]
  */
object NgramScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "target/testdata/sf5"
    val cap = if (args.length > 1) args(1).toInt else 50
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, dir)
    val t0 = System.nanoTime()
    val n = graft.dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 2, minJaccardPct = 50, dfCap = cap).count()
    println(f"[ngramscale] dir=$dir dfCap=$cap pairs=$n " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
