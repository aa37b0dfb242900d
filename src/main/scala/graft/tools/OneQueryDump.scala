package graft.tools
import org.apache.spark.sql.SparkSession
/** Dump a single SparkEntry query + its oracle into an existing Verify
  * out-dir (targeted re-checks without a full re-dump). */
object OneQueryDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, name) = args
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.getOrElse(name,
        graft.SparkEntry.auxDumps(name))(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    if (!graft.SparkEntry.oracleSql.contains(name)) {
      println(s"[dump] wrote $name (no oracle)"); spark.stop(); return
    }
    // merge the query's oracle into the out-dir's oracle_sql.json:
    // parse-and-put (Jackson ships with Spark) so a re-dump REPLACES the
    // key instead of appending a duplicate, and a fresh out-dir (no file
    // yet) starts a new object instead of crashing
    val p = java.nio.file.Paths.get(s"$outDir/oracle_sql.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val obj =
      if (java.nio.file.Files.exists(p))
        mapper.readTree(java.nio.file.Files.readAllBytes(p))
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      else mapper.createObjectNode()
    // same __OUTDIR__ resolution as Verify: aux-replay oracles read the
    // dump dir's own artifacts
    val outAbs = new java.io.File(outDir).getAbsolutePath
    obj.put(name, graft.SparkEntry.oracleSql(name).replace("__OUTDIR__", outAbs))
    java.nio.file.Files.writeString(p, mapper.writeValueAsString(obj))
    println(s"[dump] wrote $name")
    spark.stop()
  }
}
