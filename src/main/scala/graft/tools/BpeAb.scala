package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BpeAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/testdata/sf5"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, dir)
    val rules = graft.text.bpeTrainMerges(docs, "text", 200, 12)
      .orderBy(col("merge_rank")).select(col("sym_a"), col("sym_b"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    for (round <- 1 to 3; which <- Seq("expr", "hof")) {
      val t0 = System.nanoTime()
      val df = if (which == "expr")
        graft.text.bpeSegmentCounts(docs, "doc_id", "text", rules)
      else graft.text.bpeSegmentCountsHof(docs, "doc_id", "text", rules)
      val n = df.agg(sum(col("n_bpe"))).head().getLong(0)
      println(f"[ab] $which%s round $round: ${(System.nanoTime()-t0)/1e9}%.2fs sum=$n")
    }
    spark.stop()
  }
}
