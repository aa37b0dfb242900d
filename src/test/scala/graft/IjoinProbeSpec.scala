package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Boundary pins for the stream-stream interval join contract that
  * [[graft.streaming.Streaming.intervalJoinAudit]] replays. Each test
  * runs a REAL MemoryStream query and asserts the measured behavior the
  * replay's scaladoc claims:
  *   1. late-input drop fires AT the watermark (sec == W drops);
  *   2. state eviction is derived from the JOIN CONDITION, so an
  *      in-state click with c <= W < c + range still matches an on-time
  *      purchase (eviction never races a legal match).
  * If a Spark upgrade shifts either boundary, these fail before the
  * graded st_ijoin row silently diverges from real streaming. */
class IjoinProbeSpec extends SparkSuite {
  import spark.implicits._

  private val base = 1000000200L
  private def t(min: Int) = new java.sql.Timestamp((base + min * 60L) * 1000L)

  private def run(name: String)(
      batches: Seq[Seq[(Long, String, java.sql.Timestamp, Double)]])
      : (Set[(Long, Long, Long)], Long) = {
    implicit val s: SparkSession = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, java.sql.Timestamp, Double)]
    val joined = graft.streaming.Streaming.purchaseAttribution(
      ms.toDF().toDF("user_id", "event_type", "ts", "value"))
      .select($"p_user", unix_timestamp($"p_ts").as("psec"),
        unix_timestamp($"c_ts").as("csec"))
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    val dropped = q.recentProgress
      .flatMap(_.stateOperators.headOption.map(_.numRowsDroppedByWatermark))
      .sum
    q.stop()
    (spark.table(name).as[(Long, Long, Long)].collect().toSet, dropped)
  }

  test("late-input drop fires AT the watermark (equality drops)") {
    // advance both sides so W = t(196), then feed a click exactly at
    // c + range == W (t(186), also c <= W) and a purchase exactly AT the
    // watermark (t(196)): both must be dropped, nothing emitted
    val (emitted, dropped) = run("ij_b1")(Seq(
      Seq((98L, "click", t(206), 0.0), (99L, "purchase", t(206), 9.0)),
      Seq((6L, "click", t(186), 0.0), (6L, "purchase", t(196), 9.0))))
    assert(emitted.isEmpty, s"boundary rows matched: $emitted")
    assert(dropped == 2L, s"expected both boundary rows dropped, got $dropped")
  }

  test("in-state click with c <= W < c+range still matches an on-time purchase") {
    // click t(300) enters state early; both sides then advance so
    // W = t(305) (c <= W < c + 10min); an on-time purchase t(306) in
    // range MUST still find the click — eviction is join-condition-
    // derived, not the plain watermark
    val (emitted, _) = run("ij_b2")(Seq(
      Seq((8L, "click", t(300), 0.0)),
      Seq((98L, "click", t(315), 0.0), (99L, "purchase", t(315), 9.0)),
      Seq((8L, "purchase", t(306), 9.0))))
    assert(emitted == Set((8L, base + 306L * 60L, base + 300L * 60L)),
      s"stored click was evicted early or match lost: $emitted")
  }
}
