package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the blocked-linkage quadratic on a SKEWED-block corpus and
  * measures the `blockedPairs` cap doing its job (r11 verdict Next #1 —
  * the coOccurrenceEdges/PowerLawSoak pricing discipline applied to the
  * linkage family). Results land in docs/SCALE_SOAK.md ("linkage skew").
  *
  * Two corpora, both deterministic (PowerLawSoak.zipfItems — no RNG):
  *
  *  1. MID corpus (default 100k rows, hot block 20k): the uncapped
  *     blocked self-join is still runnable — MEASURE it, then measure
  *     the capped build on the same corpus. The delta is the measured
  *     price of one fixed-domain hot block, concentrated in ONE task
  *     (the equi-join puts a block's pairs in a single partition — the
  *     skew is structural, not statistical).
  *  2. SOAK corpus (default 2M rows, hot block 200k): uncapped pair
  *     volume priced ANALYTICALLY (sum n(n-1)/2) and refused when the
  *     hub block alone exceeds `refuseAt` pairs — the refusal is the
  *     point, the same posture as the graph soak's 14.9B-pair refusal.
  *     The capped build runs and reports drop counts via the
  *     plan-native observe metric.
  *
  * Names are 24-hex-char strings from xxhash64 — realistic Jaro-Winkler
  * cost, zero collisions with the >= 0.9 threshold at these sizes, so
  * the verify kernel's cost is pure candidate volume.
  *
  * Usage: runMain graft.tools.LinkageSkewProbe [midRows midMax soakRows soakMax cap]
  */
object LinkageSkewProbe {
  def main(args: Array[String]): Unit = {
    val midRows = if (args.length > 0) args(0).toLong else 100000L
    val midMax = if (args.length > 1) args(1).toLong else 20000L
    val soakRows = if (args.length > 2) args(2).toLong else 2000000L
    val soakMax = if (args.length > 3) args(3).toLong else 200000L
    val cap = if (args.length > 4) args(4).toInt else 512
    val refuseAt = 1000000000L // 1B pairs: ~minutes in ONE task, refuse
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[linkskew] $tag%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // (id, nm, blk): block = zipf group, name = 24 hex chars of xxhash64
    def corpus(nRows: Long, maxGroup: Long) = {
      val items = PowerLawSoak.zipfItems(spark, nRows, nRows, 1.1, maxGroup)
      items.select(
          monotonically_increasing_id().as("id"),
          concat(lpad(hex(xxhash64(col("g"), col("item"))), 16, "0"),
            lpad(hex(xxhash64(col("item"), col("g"))), 8, "0")).as("nm"),
          col("g").as("blk"))
        .localCheckpoint()
    }

    def price(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.groupBy(col("blk")).agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) DIV 2")), max(expr("n * (n - 1) DIV 2")))
        .head()
      (r.getLong(0), r.getLong(1))
    }

    // survivors collected (tiny: random hex names essentially never
    // reach JW >= 0.9) so the observe metric reads off the EXECUTED
    // dataset's own QueryExecution — the GraphSpec discipline
    def verified(pairs: org.apache.spark.sql.DataFrame): (Long, String) = {
      import graft.functions.StringSimExprs.jaroWinklerSim
      val f = pairs
        .filter(jaroWinklerSim(col("a_nm"), col("b_nm")) >= 0.9)
        .select(col("a_id"), col("b_id"))
      val n = f.collect().length.toLong
      (n, f.queryExecution.observedMetrics.get("linkage_block_cap")
        .map(_.toString).getOrElse("(uncapped)"))
    }

    // ---- MID corpus: uncapped measurable, capped measured against it
    val mid = timed(s"mid corpus build ($midRows rows)") {
      val c = corpus(midRows, midMax); c.count(); c
    }
    val (midPairs, midHub) = price(mid)
    println(s"[linkskew] mid: uncappedPairs=$midPairs hubBlockPairs=$midHub")
    timed("mid UNCAPPED blocked self-join + JW verify") {
      val (n, _) = verified(graft.dedup.blockedPairs(mid, col("blk"), "id"))
      println(s"[linkskew] mid uncapped survivors=$n")
    }
    timed(s"mid capped (cap=$cap) + JW verify") {
      val (n, m) = verified(
        graft.dedup.blockedPairs(mid, col("blk"), "id", blockCap = cap))
      println(s"[linkskew] mid capped survivors=$n observe=$m")
    }

    // ---- SOAK corpus: price analytically, refuse the uncapped run
    val soak = timed(s"soak corpus build ($soakRows rows)") {
      val c = corpus(soakRows, soakMax); c.count(); c
    }
    val (soakPairs, soakHub) = price(soak)
    println(s"[linkskew] soak: uncappedPairs=$soakPairs hubBlockPairs=$soakHub")
    if (soakHub > refuseAt)
      println(s"[linkskew] soak uncapped NOT RUN: $soakHub pairs in the hub " +
        "block's ONE task — the refusal is the point")
    else timed("soak UNCAPPED (hub under refusal bound)") {
      val (n, _) = verified(graft.dedup.blockedPairs(soak, col("blk"), "id"))
      println(s"[linkskew] soak uncapped survivors=$n")
    }
    timed(s"soak capped (cap=$cap) + JW verify") {
      val (n, m) = verified(
        graft.dedup.blockedPairs(soak, col("blk"), "id", blockCap = cap))
      println(s"[linkskew] soak capped survivors=$n observe=$m")
    }
    spark.stop()
  }
}
