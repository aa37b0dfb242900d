package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the d_pipeline composition — scratch profiler
  * for the sf1 soak. */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/testdata/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pp] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = graft.core.Tables.documents(spark, dir)
      .filter(length(col("text")) >= 150)
    time("warm-count")(docs.count())
    val keepers = docs.groupBy(xxhash64(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val surv = time("exact-dedup+checkpoint")(
      docs.join(keepers, "doc_id").localCheckpoint())
    println("[pp] surv rows=" + surv.count())
    println("[pp] surv partitions=" + surv.rdd.getNumPartitions)
    import org.apache.spark.sql.DataFrame
    val sh = graft.core.Partitions.ensureMinParallelism(
      surv.select(col("doc_id").as("id"),
        graft.dedup.wordShingles(col("text"), 2).as("sh"))
        .withColumn("nsh", size(col("sh"))),
      col("id"), 32)
    println("[pp] sh partitions=" + sh.rdd.getNumPartitions)
    val inv = sh.select(col("id"), explode(col("sh")).as("gs"))
      .select(col("id"), xxhash64(col("gs")).as("g"))
    time("inv-count")(println("[pp] inv rows=" + inv.count()))
    val pairs = inv.as("a").join(inv.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    time("pairs-count")(println("[pp] pairs rows=" + pairs.count()))
    println("[pp] === checkpoint-input plan ===")
    println(pairs.queryExecution.executedPlan.toString.take(3500))
    val pairsP = {
      val docsP = graft.core.Tables.documents(spark, dir)
      val shP = graft.core.Partitions.ensureMinParallelism(
        docsP.select(col("doc_id").as("id"),
          graft.dedup.wordShingles(col("text"), 2).as("sh"))
          .withColumn("nsh", size(col("sh"))),
        col("id"), 32)
      val invP = shP.select(col("id"), explode(col("sh")).as("gs"))
        .select(col("id"), xxhash64(col("gs")).as("g"))
      invP.as("a").join(invP.as("b"),
          col("a.g") === col("b.g") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
        .agg(count(lit(1)).as("inter"))
    }
    time("pairs-parquet-count")(println("[pp] pairsP rows=" + pairsP.count()))
    println("[pp] === parquet-input plan ===")
    println(pairsP.queryExecution.executedPlan.toString.take(3500))
    val edges = time("ngram-pairs")(
      graft.dedup.ngramJaccardPairs(surv, "doc_id", "text", 2, 50)
        .localCheckpoint())
    println("[pp] edges rows=" + edges.count())
    time("cc+anti+agg")(
      graft.dedup.dropNearDuplicates(surv, "doc_id", edges)
        .agg(count(lit(1)).as("n_final"), sum(col("doc_id")).as("id_sum"))
        .collect())
    spark.stop()
  }
}
