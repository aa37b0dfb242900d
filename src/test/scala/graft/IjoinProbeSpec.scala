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

  private def runOuter(name: String)(
      batches: Seq[Seq[(Long, String, java.sql.Timestamp, Double)]])
      : Set[(Long, Long, Option[Long])] = {
    implicit val s: SparkSession = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, java.sql.Timestamp, Double)]
    val joined = graft.streaming.Streaming.purchaseAttributionOuter(
      ms.toDF().toDF("user_id", "event_type", "ts", "value"))
      .select($"p_user", unix_timestamp($"p_ts").as("psec"),
        unix_timestamp($"c_ts").as("csec"))
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
  }

  test("outer: null row emitted only when the watermark passes the purchase STRICTLY") {
    // unmatched purchase at p = t(100); advance both sides so W lands
    // exactly AT p (t(110) maxima − 10 min): NO null row — eviction is
    // p < W, not p <= W
    val at = runOuter("oij_at")(Seq(
      Seq((5L, "purchase", t(100), 1.0)),
      Seq((98L, "click", t(110), 0.0), (99L, "purchase", t(110), 0.0)),
      Seq((98L, "click", t(110), 0.0))))
    assert(!at.exists(_._1 == 5L),
      s"null row emitted at W == p (eviction must be strict): $at")
    // one minute further (W = t(101) > p): the null row MUST appear
    val past = runOuter("oij_past")(Seq(
      Seq((5L, "purchase", t(100), 1.0)),
      Seq((98L, "click", t(111), 0.0), (99L, "purchase", t(111), 0.0)),
      Seq((98L, "click", t(111), 0.0))))
    assert(past.contains((5L, base + 100L * 60L, None)),
      s"null row missing once W > p: $past")
  }

  test("outer: an on-time match suppresses the null row permanently") {
    val got = runOuter("oij_match")(Seq(
      Seq((7L, "click", t(95), 0.0), (7L, "purchase", t(100), 1.0)),
      Seq((98L, "click", t(200), 0.0), (99L, "purchase", t(200), 0.0)),
      Seq((98L, "click", t(200), 0.0))))
    val u7 = got.filter(_._1 == 7L)
    assert(u7 == Set((7L, base + 100L * 60L, Some(base + 95L * 60L))),
      s"expected exactly the matched row, no null row: $u7")
  }

  test("outer: no watermark advancement (absent side) => no null row at stream end") {
    // purchase side only: min-of-sides watermark stays at -inf, state is
    // never evicted, so the unmatched purchase's null row is NEVER
    // emitted — the recent-purchase blind spot the audit's wf-null rule
    // models
    val got = runOuter("oij_noadv")(Seq(
      Seq((9L, "purchase", t(100), 1.0)),
      Seq((9L, "purchase", t(101), 1.0))))
    assert(got.isEmpty, s"null rows emitted without watermark advance: $got")
  }

  test("outer: purchase whose only in-range click was late-dropped reports null") {
    // W reaches t(190); a click at t(150) is then late (dropped), the
    // on-time purchase at t(195) never matches, and once W passes t(195)
    // the stream REPORTS 'no clicks' for a purchase that ideally had one
    // — the poisoned case intervalJoinOuterAudit's n_ideal>0 ∧
    // outer_null=1 row surfaces
    val got = runOuter("oij_late")(Seq(
      Seq((98L, "click", t(200), 0.0), (99L, "purchase", t(200), 0.0)),
      Seq((11L, "click", t(150), 0.0), (11L, "purchase", t(195), 1.0)),
      Seq((98L, "click", t(210), 0.0), (99L, "purchase", t(210), 0.0)),
      Seq((98L, "click", t(210), 0.0))))
    val u11 = got.filter(_._1 == 11L)
    assert(u11 == Set((11L, base + 195L * 60L, None)),
      s"expected the null row for the late-match purchase: $u11")
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
