package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.core.Tables.documents(spark, dir)
    def t(name: String)(f: => Long): Unit = { val t0=System.nanoTime; val n=f; println(f"$name%-14s $n%10d ${(System.nanoTime-t0)/1e9}%6.2fs") }
    t("warmup")(docs.count())
    val edges = graft.dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 50)
    t("edges")(edges.count())
    val e2 = edges.localCheckpoint()
    t("edges_ckpt")(e2.count())
    // manual CC with round timing
    val sym = e2.select(col("id1").cast("long").as("a"), col("id2").cast("long").as("b"))
      .union(e2.select(col("id2").cast("long").as("a"), col("id1").cast("long").as("b"))).localCheckpoint()
    var labels = sym.groupBy(col("a").as("v")).agg(least(min(col("b")), first(col("a"))).as("l")).localCheckpoint()
    var lastSum = labels.agg(coalesce(sum(col("l")), lit(0L))).head.getLong(0)
    var i = 0; var done = false
    while (!done && i < 25) {
      val t0 = System.nanoTime
      val nbr = sym.join(labels, sym("b") === labels("v")).groupBy(col("a")).agg(min(col("l")).as("nl"))
      val next = labels.join(nbr, labels("v") === nbr("a"), "left")
        .select(labels("v"), least(labels("l"), coalesce(col("nl"), labels("l"))).as("l")).localCheckpoint()
      val s = next.agg(coalesce(sum(col("l")), lit(0L))).head.getLong(0)
      println(f"round $i: sum=$s ${(System.nanoTime-t0)/1e9}%6.2fs")
      labels = next; done = s == lastSum; lastSum = s; i += 1
    }
    t("cc_total_done")(labels.count())
    spark.stop()
  }
}
