package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** graft.operators.Timeseries: robust daily anomalies + per-entity EWMA. */
class TimeseriesSpec extends SparkSuite {
  import spark.implicits._

  private def ts(day: Int, sec: Int): Timestamp =
    new Timestamp(86400000L * day + 1000L * sec)

  // --- dailyAnomalies -----------------------------------------------------

  test("dailyAnomalies flags the burst and the dropout, not steady days") {
    // entity 1: 5 events/day for 9 days, one 50-event burst, one 1-event
    // dropout day. median = 5, MAD = 0 -> the strict rule flags exactly
    // the two deviating days. entity 2: perfectly steady, flags nothing.
    val rows =
      (0 until 9).flatMap(d => (0 until 5).map(i => (1L, ts(d, i)))) ++
        (0 until 50).map(i => (1L, ts(9, i))) ++
        Seq((1L, ts(10, 0))) ++
        (0 until 11).flatMap(d => (0 until 3).map(i => (2L, ts(d, i))))
    val out = graft.operators.Timeseries
      .dailyAnomalies(rows.toDF("user_id", "ts"), "user_id", "ts", z = 3.5)
      .collect()
    assert(out.forall(_.getLong(0) == 1L), s"steady entity flagged: ${out.mkString}")
    val byDay = out.map(r => r.getDate(1).toString.takeRight(2) -> r.getInt(5)).toMap
    assert(byDay == Map("10" -> 1, "11" -> -1), // 1970-01-10 / -11
      s"expected burst(+1) and dropout(-1) days, got $byDay")
    val burst = out.find(_.getInt(5) == 1).get
    assert(burst.getLong(2) == 50 && burst.getLong(3) == 10 && // med 5 -> x2
      burst.getLong(4) == 0, s"wrong stats row: $burst")       // MAD 0 -> x4
  }

  test("dailyAnomalies: nonzero MAD shields moderate deviation, half-integer medians are exact") {
    // counts 1,2,3,4,5,6 over 6 days: median 3.5 (exact half), deviations
    // (2.5, 1.5, .5, .5, 1.5, 2.5) -> MAD 1.5 (x4 = 6). With z = 0.45
    // the threshold is 0.45*1.4826*1.5 = 1.0008: days deviating by 1.5+
    // flag, the .5 days don't.
    val rows = (0 until 6).flatMap(d => (0 to d).map(i => (7L, ts(d, i))))
    val out = graft.operators.Timeseries
      .dailyAnomalies(rows.toDF("user_id", "ts"), "user_id", "ts", z = 0.45)
      .collect()
    assert(out.forall(r => r.getLong(3) == 7 && r.getLong(4) == 6),
      s"median x2 / MAD x4 wrong: ${out.mkString(";")}")
    assert(out.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L, 5L, 6L),
      s"flagged wrong days: ${out.mkString(";")}")
  }

  test("dailyAnomalies drops null entities and shuffles at most twice") {
    val rows = Seq((java.lang.Long.valueOf(3L), ts(0, 0)),
      (null.asInstanceOf[java.lang.Long], ts(0, 1)))
    val df = graft.operators.Timeseries
      .dailyAnomalies(rows.toDF("user_id", "ts"), "user_id", "ts")
    assert(df.count() == 0)
    // shape pin: ONE (entity, day) count shuffle + ONE entity-keyed window
    // exchange shared by both percentile Window nodes — a join-based
    // median/MAD would re-run the day-count aggregate per consumer
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val ex = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(ex == 2, s"dailyAnomalies exchanged ${ex}x:\n${plan.take(2500)}")
    val scans = "Scan\\b".r.findAllIn(plan).length
    assert(scans <= 1, s"dailyAnomalies scanned its input ${scans}x")
  }

  // --- ewma ---------------------------------------------------------------

  test("ewma matches the recursive fold and handles singletons") {
    val rows = Seq(
      (1L, ts(0, 10), 100L, 10.0), (1L, ts(0, 20), 101L, 20.0),
      (1L, ts(0, 30), 102L, 30.0), (1L, ts(0, 40), 103L, 0.0),
      (2L, ts(0, 5), 104L, 42.5))
    val out = graft.operators.Timeseries
      .ewma(rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "event_id", "value", alpha = 0.125)
      .collect().map(r => r.getLong(0) -> r).toMap
    // reference: the textbook recursion (a different FP rounding route —
    // agreement at 1e-9 relative, not bit equality, is the contract)
    val rec = Seq(10.0, 20.0, 30.0, 0.0)
      .reduceLeft((e, v) => 0.125 * v + 0.875 * e)
    val got = out(1L).getLong(3) / 1e6
    assert(math.abs(got - rec) < 1e-6, s"ewma $got vs recursive $rec")
    assert(out(1L).getLong(1) == 4 && out(1L).getDouble(2) == 0.0)
    assert(out(2L).getLong(3) == 42500000L, // singleton: ewma == value
      s"singleton ewma: ${out(2L)}")
  }

  test("ewma is tie-broken deterministically and plans ONE exchange") {
    // two events at the SAME timestamp: event_id order decides which is
    // "last" (weight alpha^0 side) — swap ids, the ewma must move
    val a = Seq((1L, ts(0, 1), 1L, 5.0), (1L, ts(0, 1), 2L, 9.0))
    val b = Seq((1L, ts(0, 1), 2L, 5.0), (1L, ts(0, 1), 1L, 9.0))
    def run(rows: Seq[(Long, Timestamp, Long, Double)]): Long =
      graft.operators.Timeseries.ewma(
        rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "event_id", "value").collect()(0).getLong(3)
    val (ra, rb) = (run(a), run(b))
    assert(ra != rb, "tiebreak has no effect — ordering is not total")
    assert(ra == math.floor((0.125 * 9.0 + 0.875 * 5.0) * 1e6).toLong)
    val df = graft.operators.Timeseries.ewma(
      a.toDF("user_id", "ts", "event_id", "value"),
      "user_id", "ts", "event_id", "value")
    df.collect()
    // AQE's toString appends the pre-adaptive "Initial Plan" — count
    // exchanges in the final section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val ex = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(ex == 1, s"ewma should shuffle once on the entity key, got $ex:\n${plan.take(2500)}")
  }

  test("ewma decay powers are bit-stable (the cross-engine replay contract)") {
    // the ev_ewma oracle replays pow(0.875, n) in DuckDB and hash-compares
    // the resulting doubles; that only holds while the JVM's Math.pow
    // stays correctly rounded on this base. Pin sampled values by bit
    // pattern so a JDK libm change fails HERE, not in the driver gate.
    val pins = Map(3 -> 0x3fe5700000000000L, 7 -> 0x3fd921ee00000000L,
      50 -> 0x3f54a536b7f4f2eeL, 399 -> 0x3b219095a92eae28L)
    for ((n, bits) <- pins)
      assert(java.lang.Double.doubleToLongBits(math.pow(0.875, n)) == bits,
        s"Math.pow(0.875, $n) drifted")
    for (n <- 0 to 1000) // base-1/2 powers must be EXACT
      assert(math.pow(0.5, n) == java.lang.Math.scalb(1.0, -n))
  }

  test("cusum window closed form equals the textbook recursion") {
    import spark.implicits._
    // one bursty entity, one quiet entity, one singleton
    val rows = Seq(
      (1L, 1000L, 1L, 10.0), (1L, 2000L, 2L, 80.0), (1L, 3000L, 3L, 90.0),
      (1L, 4000L, 4L, 5.0), (1L, 5000L, 5L, 95.0),
      (2L, 1000L, 6L, 10.0), (2L, 2000L, 7L, 12.0),
      (3L, 9000L, 8L, 300.0))
    val drift = 5000L; val h = 6000L
    // reference: the literal recursion s = max(0, s + xq - drift)
    val expect = rows.groupBy(_._1).map { case (ent, rs) =>
      var s = 0L; var maxS = 0L; var alarms = 0L; var firstRn: Option[Int] = None
      rs.sortBy(r => (r._2, r._3)).zipWithIndex.foreach { case (r, i) =>
        s = math.max(0L, s + math.floor(r._4 * 100).toLong - drift)
        maxS = math.max(maxS, s)
        if (s > h) { alarms += 1; if (firstRn.isEmpty) firstRn = Some(i + 1) }
      }
      ent -> ((rs.size.toLong, alarms, maxS, firstRn))
    }
    val got = graft.operators.Timeseries.cusum(
      rows.toDF("user_id", "ts", "event_id", "value"),
      "user_id", "ts", "event_id", "value", drift, h)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getInt(4))))).toMap
    assert(got == expect, s"got $got\nexpect $expect")
    // sanity on the chosen fixture: entity 1 alarms, entity 2 never does
    assert(got(1L)._2 > 0 && got(2L)._2 == 0L)
  }

  test("cusum plans one exchange on the entity key (no fold, no collect_list)") {
    import spark.implicits._
    val df = graft.operators.Timeseries.cusum(
      Seq((1L, 1000L, 1L, 10.0)).toDF("user_id", "ts", "event_id", "value"),
      "user_id", "ts", "event_id", "value", 5000L, 6000L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val ex = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(ex == 1, s"cusum should shuffle once, got $ex:\n${plan.take(2500)}")
    assert(!plan.contains("collect_list"), "cusum must not fold per-entity arrays")
  }
}
