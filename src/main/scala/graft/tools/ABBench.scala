package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B harness for plan-shape experiments (not part of the public
  * surface; run via `sbt "runMain graft.tools.ABBench"`). Current matchup:
  * inverted-index vs PPJoin-prefix exact Jaccard pairs (see
  * graft.dedup.ngramJaccardPairsPrefix for the measured verdict). */
object ABBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.core.Tables.documents(spark, dir)
    docs.count() // warm
    def time(tag: String)(f: => Long): Unit =
      for (i <- 1 to 2) {
        val t0 = System.nanoTime(); val nr = f
        println(f"[ab] $tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$nr")
      }
    time("ngram-invidx") {
      graft.dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 50).count()
    }
    time("ngram-hashedkey") {
      val sh = docs.select(col("doc_id").as("id"),
          graft.dedup.wordShingles(col("text"), 2).as("sh"))
        .withColumn("nsh", size(col("sh")))
        .repartition(spark.sessionState.conf.numShufflePartitions, col("id"))
      val inv = sh.select(col("id"), explode(col("sh")).as("g"))
        .select(col("id"), xxhash64(col("g")).as("g"))
      val pairs = inv.as("a").join(inv.as("b"),
          col("a.g") === col("b.g") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
        .agg(count(lit(1)).as("inter"))
      val nshDf = sh.select(col("id"), col("nsh"))
      pairs
        .join(broadcast(nshDf.withColumnRenamed("nsh", "n1")), col("id1") === col("id")).drop("id")
        .join(broadcast(nshDf.withColumnRenamed("nsh", "n2")), col("id2") === col("id")).drop("id")
        .withColumn("uni", col("n1") + col("n2") - col("inter"))
        .filter(col("inter") * 100 >= col("uni") * 50)
        .count()
    }
    time("ngram-prefix") {
      graft.dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 2, 50).count()
    }
    time("spanrm-stringkey") {
      graft.text.dedupSpans(docs, "doc_id", "text", 5).count()
    }
    time("spanrm-hashedkey") {
      graft.text.dedupSpans(docs, "doc_id", "text", 5, hashKeys = true).count()
    }
    val a = graft.dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 50)
      .collect().map(_.toSeq).toSet
    val b = graft.dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 2, 50)
      .collect().map(_.toSeq).toSet
    println(s"[ab] equal=${a == b} n=${a.size} / ${b.size}")
    spark.stop()
  }
}
