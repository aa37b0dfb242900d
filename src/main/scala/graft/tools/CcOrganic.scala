package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Run the DISTRIBUTED connected-components path over ORGANIC near-dup
  * edges (ngramJaccardPairs on a real corpus dir) instead of CcStress's
  * synthetic worst-diameter chains, and differential-check the labeling
  * against the default (driver union-find) path. This is the soak the r4
  * verdict asked for: the >1M-edge regime on data shaped like production,
  * not an adversarial graph.
  *
  * Usage: runMain graft.tools.CcOrganic [sfDir]
  */
object CcOrganic {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "target/testdata/sf5"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, dir)
    val pairs = graft.dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 50)
    val e = pairs.select(col("id1").cast("long").as("a"),
      col("id2").cast("long").as("b")).localCheckpoint()
    val nEdges = e.count()
    println(s"[ccorganic] dir=$dir edges=$nEdges")
    val t0 = System.nanoTime()
    val (labels, rounds) = graft.dedup.ccDistributed(e, maxIter = 25)
    val dist = labels.select(col("v").as("id"), col("l").as("rep"))
    val nNodes = dist.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[ccorganic] distributed: $rounds rounds, $secs%.1f s, " +
      s"nodes=$nNodes")
    // differential vs the driver union-find fast path (same edge frame)
    val drv = graft.dedup.connectedComponents(pairs, "id1", "id2",
      driverSolveMaxEdges = Long.MaxValue)
    val diff = dist.as("a").join(drv.as("b"), col("a.id") === col("b.id"))
      .filter(col("a.rep") =!= col("b.rep")).count()
    require(diff == 0, s"$diff labels differ between distributed and driver")
    println("[ccorganic] PASS: distributed labeling == driver union-find")
    spark.stop()
  }
}
