package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed JVM/codegen/reader warm-up so the alphabetically-first query
    // doesn't absorb ~3s of one-time session cost
    Seq("lineitem", "documents", "embeddings", "orders").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // min of two runs: steady-state per-query cost (first run may absorb
      // codegen compilation for plan shapes no earlier query produced).
      // Second run skipped past 20s so total bench wall-clock stays bounded.
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        // drop caches a query pinned (e.g. LSH signatures): queries are
        // independent; accumulated cache blocks would evict each other's
        // checkpoints and skew later timings
        spark.sharedState.cacheManager.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      val first = once()
      val dt = if (first > 20.0) first else math.min(first, once())
      System.err.println(f"[bench] $name%-20s $dt%8.2fs")
      name -> dt
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
