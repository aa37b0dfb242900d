package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming STATE soak (r11 verdict Next #6): the stream-stream
  * interval join run for real — RocksDB state store, MemoryStream
  * micro-batches — over a Zipf-keyed multi-million-event corpus where
  * ONE hot user holds a large in-range candidate set, with per-batch
  * latency and state-store rows/bytes measured from StreamingQuery
  * progress, and output parity asserted against the graded batch audit
  * (intervalJoinAudit) at that scale. The graded faces (st_ijoin /
  * st_ijoin_outer / st_alerts) grade sf5-cardinality REPLAYS; this
  * probe is the evidence the real streaming runs behave at skewed
  * state, not just fixture scale. Results land in docs/SCALE_SOAK.md
  * ("streaming state soak").
  *
  * Corpus (deterministic, no RNG):
  *  - `nCold` cold events over ~100k users, clicks with a 1-in-13
  *    purchase mix, event time spread over `spanSec` seconds;
  *  - ONE hot user (id 0): `nHot` clicks packed into one 10-minute
  *    window plus 3 purchases inside/at the end of it — each hot
  *    purchase's in-range candidate set is O(nHot), the state skew a
  *    uniform corpus never shows;
  *  - arrival: batch = (sec + jitter) DIV 60 — the st_ijoin displaced-
  *    arrival model, so real late-input drops occur and the audit's
  *    n_stream prediction is non-trivially exercised.
  *
  * Usage: runMain graft.tools.StreamStateSoak [nCold nHot spanSec]
  */
object StreamStateSoak {
  def main(args: Array[String]): Unit = {
    val nCold = if (args.length > 0) args(0).toLong else 2000000L
    val nHot = if (args.length > 1) args(1).toLong else 1000000L
    val spanSec = if (args.length > 2) args(2).toLong else 3600L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.streaming.Streaming.withRocksDBState(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = 1000000000L
    // ---- corpus as ONE deterministic frame: (user_id, event_type, sec)
    // cold: user = multiplicative-hash mod 99991 (+1 so user 0 stays hot-only)
    val cold = spark.range(nCold).select(
      (pmod(col("id") * 2654435761L, lit(99991L)) + 1L).as("user_id"),
      when(pmod(col("id"), lit(13)) === 0, "purchase").otherwise("click")
        .as("event_type"),
      (lit(base) + pmod(col("id") * 40503L, lit(spanSec))).as("sec"))
    // hot: nHot clicks inside [base+1200, base+1800), purchases at the
    // window's middle and end — candidate sets of ~nHot/2 and ~nHot
    val hotClicks = spark.range(nHot).select(
      lit(0L).as("user_id"), lit("click").as("event_type"),
      (lit(base + 1200L) + pmod(col("id"), lit(600L))).as("sec"))
    val hotPurch = Seq(base + 1500L, base + 1740L, base + 1799L)
      .toDF("sec").select(lit(0L).as("user_id"),
        lit("purchase").as("event_type"), col("sec"))
    val corpus = cold.unionByName(hotClicks).unionByName(hotPurch)
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("value", lit(1.0))
      // st_ijoin displaced-arrival model: jitter in [-500, +500] sec
      .withColumn("arr_sec",
        greatest(col("sec") + (pmod(col("event_id") * 37L, lit(21L)) - 10L) * 50L,
          lit(0L)))
      .withColumn("b", expr("arr_sec DIV 60"))
      .localCheckpoint()
    val nAll = corpus.count()
    println(s"[stsoak] corpus: $nAll events (${nCold} cold + ${nHot} hot clicks " +
      s"+ 3 hot purchases), span ${spanSec}s, RocksDB state store")

    // ---- the graded batch audit predicts per-purchase n_stream
    val audit = graft.streaming.Streaming.intervalJoinAudit(
        corpus.select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), expr("timestamp_micros(sec * 1000000)").as("ts"),
          col("b")),
        col("b"))
      .localCheckpoint()
    // map event_id -> (user, psec) for the parity key
    val pkey = corpus.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("pu"), col("sec").as("psec"))
    // sum over the parity key: distinct purchase EVENTS can share a
    // (user, sec) — the streamed side's per-key count is their sum
    val predicted = audit.join(pkey, "event_id")
      .select(col("pu"), col("psec"), col("n_stream"))
      .as[(Long, Long, Long)].collect()
      .groupMapReduce(r => (r._1, r._2))(_._3)(_ + _)
    println(s"[stsoak] audit: ${predicted.size} purchases, " +
      s"ideal=${audit.agg(sum(col("n_ideal"))).head().getLong(0)} " +
      s"stream-predicted=${audit.agg(sum(col("n_stream"))).head().getLong(0)} " +
      s"missed=${audit.agg(sum(col("n_missed"))).head().getLong(0)}")

    // ---- the REAL streaming run, fed batch-by-batch in arrival order
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batches = corpus
      .select(col("b"), col("user_id"), col("event_type"), col("sec"))
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
    val ms = MemoryStream[(Long, String, Long)]
    // the RAW join goes to the memory sink (append-legal); per-purchase
    // counts aggregate sink-side — a downstream streaming agg would
    // need Update mode and hide the join's own emission behavior
    val rawJoined = graft.streaming.Streaming.purchaseAttribution(
        ms.toDF().toDF("user_id", "event_type", "sec")
          .select(col("user_id"), col("event_type"),
            expr("timestamp_micros(sec * 1000000)").as("ts"),
            lit(1.0).as("value")))
      .select(col("p_user"),
        expr("unix_micros(p_ts) DIV 1000000").as("psec"),
        expr("unix_micros(c_ts) DIV 1000000").as("csec"))
    val q = rawJoined.writeStream.format("memory").queryName("stsoak_ij")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_stsoak_chk").toString)
      .outputMode("append").start()
    var peakRows = 0L
    var peakBytes = 0L
    val batchMs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val t0 = System.nanoTime()
    batches.foreach { case (_, rows) =>
      ms.addData(rows.toSeq.map { case (_, u, t, s) => (u, t, s) })
      q.processAllAvailable()
      val p = q.lastProgress
      if (p != null) {
        batchMs += p.durationMs.getOrDefault("triggerExecution", 0L)
        p.stateOperators.foreach { so =>
          peakRows = math.max(peakRows, so.numRowsTotal)
          peakBytes = math.max(peakBytes, so.memoryUsedBytes)
        }
      }
    }
    q.stop()
    val wall = (System.nanoTime() - t0) / 1e9
    val sorted = batchMs.sorted
    println(f"[stsoak] streaming run: ${batches.size} batches in $wall%.1f s; " +
      f"batch ms p50=${sorted(sorted.size / 2)} " +
      f"p99=${sorted(math.min(sorted.size - 1, sorted.size * 99 / 100))} " +
      f"max=${sorted.last}; state peak rows=$peakRows bytes=$peakBytes")

    // ---- parity: streamed per-purchase counts == audit n_stream
    val streamed = spark.table("stsoak_ij")
      .groupBy(col("p_user"), col("psec")).agg(count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
      .map { case (u, p, n) => (u, p) -> n }.toMap
    val zeroPred = predicted.filter(_._2 > 0L)
    val mismatch = (zeroPred.keySet ++ streamed.keySet).filter { k =>
      zeroPred.getOrElse(k, 0L) != streamed.getOrElse(k, 0L) }
    println(s"[stsoak] parity: ${zeroPred.size} purchases with predicted " +
      s"matches, ${streamed.size} streamed, ${mismatch.size} mismatches")
    if (mismatch.nonEmpty) {
      mismatch.take(5).foreach { k => println(s"[stsoak]   MISMATCH $k: " +
        s"predicted=${zeroPred.getOrElse(k, 0L)} streamed=${streamed.getOrElse(k, 0L)}") }
      sys.error(s"parity FAILED: ${mismatch.size} purchases diverge")
    }
    println("[stsoak] parity OK — streaming == audit replay at skewed state")
    spark.stop()
  }
}
