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

  // --- mergeIntervals -----------------------------------------------------

  test("mergeIntervals merges overlap and touch, splits on gap, exact seconds") {
    // span 10s: events at 0s, 5s (overlap), 15s (touch: starts exactly at
    // 15s = 5s+10s end), 40s (gap of 15s -> new island); entity 2 single
    val rows = Seq((1L, ts(0, 0), 1L), (1L, ts(0, 5), 2L),
      (1L, ts(0, 15), 3L), (1L, ts(0, 40), 4L), (2L, ts(0, 0), 5L))
    val out = graft.operators.Timeseries.mergeIntervals(
        rows.toDF("user_id", "ts", "event_id"),
        "user_id", "ts", "event_id", spanUs = 10000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(t => (t._1, t._2))
    // day-0 epoch offset: ts(0, s) = s seconds after 86400000L*0
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, 0L, 25L, 25L),   // 0-10, 5-15, 15-25 coalesce
      (1L, 2L, 1L, 40L, 50L, 10L),  // the post-gap island
      (2L, 1L, 1L, 0L, 10L, 10L)), s"got ${out.mkString(";")}")
  }

  test("mergeIntervals drops null ids AND null timestamps (no spurious island 0)") {
    val rows = Seq(
      (Option(1L), Option(ts(0, 0)), 1L),
      (Option(1L), Option.empty[java.sql.Timestamp], 2L), // null ts: dropped
      (Option.empty[Long], Option(ts(0, 5)), 3L),         // null id: dropped
      (Option(1L), Option(ts(0, 40)), 4L))
    val out = graft.operators.Timeseries.mergeIntervals(
        rows.toDF("user_id", "ts", "event_id"),
        "user_id", "ts", "event_id", spanUs = 10000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq((1L, 1L, 1L, 0L, 10L), (1L, 2L, 1L, 40L, 50L)),
      s"got ${out.mkString(";")}")
  }

  test("mergeIntervals matches a brute sequential sweep on random data") {
    for (seed <- Seq(907, 11213, 65537)) {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until 400).map(i =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(2), rnd.nextInt(3000)), i.toLong))
    val span = 120000000L // 2 min
    val out = graft.operators.Timeseries.mergeIntervals(
        rows.toDF("user_id", "ts", "event_id"),
        "user_id", "ts", "event_id", spanUs = span)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val brute = rows.groupBy(_._1).flatMap { case (ent, es) =>
      val sorted = es.map(e => (e._2.getTime * 1000L, e._3)).sortBy(identity)
      var islands = List.empty[(Long, Long, Long)] // (start, end, n)
      sorted.foreach { case (s, _) =>
        islands match {
          case (st, en, n) :: rest if s <= en =>
            islands = (st, math.max(en, s + span), n + 1) :: rest
          case _ => islands = (s, s + span, 1L) :: islands
        }
      }
      islands.reverse.zipWithIndex.map { case ((st, en, n), i) =>
        (ent, i + 1L) -> (n, st / 1000000L, en / 1000000L, (en - st) / 1000000L) }
    }
    assert(out == brute,
      s"seed $seed: mismatch ${out.size} vs ${brute.size} islands")
    }
  }

  // --- activityFeatures -----------------------------------------------------

  test("activityFeatures: calendar lag nulls across gaps, 7d RANGE sums, recency") {
    // user 1 active on days 0,1,3 (gap at 2), day 10 (outside any 7d
    // window of the earlier days)
    def evs(day: Int, n: Int, v: Double) =
      (0 until n).map(i => (1L, new Timestamp(day * 86400000L + i * 1000L), v))
    val rows = evs(0, 2, 1.0) ++ evs(1, 3, 2.0) ++ evs(3, 1, 0.5) ++
      evs(10, 4, 1.25)
    val out = graft.operators.Timeseries.activityFeatures(
        rows.toDF("user_id", "ts", "value"), "user_id", "ts", "value")
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), if (r.isNullAt(8)) -1L else r.getLong(8)))).toMap
    assert(out(0L) == ((2L, 200L, -1L, 2L, 1L, 200L, -1L)), s"day0 ${out(0L)}")
    assert(out(1L) == ((3L, 600L, 2L, 5L, 2L, 800L, 1L)), s"day1 ${out(1L)}")
    // day 3: calendar lag (day 2) is NULL — a ROWS lag would wrongly
    // surface day 1's count; 7d window still sees days 0,1
    assert(out(3L) == ((1L, 50L, -1L, 6L, 3L, 850L, 2L)), s"day3 ${out(3L)}")
    // day 10: 7d window [4,10] sees only itself; recency = 7
    assert(out(10L) == ((4L, 500L, -1L, 4L, 1L, 500L, 7L)), s"day10 ${out(10L)}")
  }

  // --- seasonalNaiveBacktest ----------------------------------------------

  test("seasonalNaiveBacktest: exact integer SAEs, RANGE lag skips gaps, MASE ratio") {
    // 10 days hourly, holdout = last 48 buckets. cnt = 5 + (b%24==2 ? b/24 : 0):
    // seasonal-naive error is 0 except on the %24==2 phase where it's 1.
    // Drop bucket 50 entirely: the RANGE lag must null out t=50+24=74
    // (skipped), NOT slide to bucket 49's count.
    val rows = (0 until 240).filter(_ != 50).flatMap { b =>
      val n = 5 + (if (b % 24 == 2) b / 24 else 0)
      (0 until n).map(i => Tuple1(new Timestamp(b * 3600000L + i * 1000L)))
    }
    val out = graft.operators.Timeseries
      .seasonalNaiveBacktest(rows.toDF("ts"), "ts", period = 24, holdout = 48)
      .collect()(0)
    // buckets with a defined prev: 24..239 minus {50, 74} -> 214 pairs;
    // test = buckets 192..239 (48), train = the other 166
    assert(out.getLong(0) == 166L && out.getLong(1) == 48L,
      s"counts ${out.getLong(0)}/${out.getLong(1)}")
    // |err| = 1 exactly on %24==2 phase buckets with prev: train has
    // 26, 74(dropped), 98, 122, 146, 170 -> 5 ones (74 skipped);
    // test has 194, 218 -> 2 ones
    assert(out.getLong(2) == 5L && out.getLong(3) == 2L,
      s"saes ${out.getLong(2)}/${out.getLong(3)}")
    assert(out.getDouble(4) == (2.0 * 166.0) / (5.0 * 48.0))
  }

  // --- seasonalDecompose --------------------------------------------------

  test("seasonalDecompose recovers an exact periodic signal with zero residual") {
    // 4 days of hourly counts: 10/hour, except hour-of-day 3 gets 15.
    // A perfectly periodic series has constant 2x24 MA = 48*10 + 48*(5/24)
    // = 490 (in 48ths), detr48 = 230 on the spike phase / -10 elsewhere,
    // per-phase seasonal mean equals detr48 exactly -> residual 0.
    val rows = (0 until 96).flatMap { b =>
      val n = if (b % 24 == 3) 15 else 10
      (0 until n).map(i => Tuple1(new Timestamp(b * 3600000L + i * 1000L)))
    }
    val out = graft.operators.Timeseries
      .seasonalDecompose(rows.toDF("ts"), "ts", period = 24).collect()
    assert(out.length == 96)
    val edge = out.filter(r => r.getLong(0) < 12 || r.getLong(0) > 83)
    assert(edge.length == 24 && edge.forall(_.isNullAt(2)),
      "first/last 12 buckets must have null trend")
    val mid = out.filter(r => !r.isNullAt(2))
    assert(mid.length == 72)
    mid.foreach { r =>
      val (b, cnt, trend, seas, resid) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(trend == 490L, s"bucket $b trend $trend")
      val expSeas = if (b % 24 == 3) 230000000L else -10000000L
      assert(seas == expSeas && resid == 0L && cnt == (if (b % 24 == 3) 15 else 10),
        s"bucket $b: seas $seas resid $resid")
    }
  }

  test("seasonalDecompose floor-divides negative seasonal means exactly (pmod floor)") {
    // engineered so a phase's detrended mean is negative and NOT an
    // integer multiple: floor semantics (toward -inf) are the contract —
    // Spark DIV truncation would round toward zero and differ
    val rows = (0 until 50).flatMap { b =>
      val n = 3 + (b % 7) // period 7 pattern sampled by a period-4 decompose
      (0 until n).map(i => Tuple1(new Timestamp(b * 3600000L + i * 1000L)))
    }
    val out = graft.operators.Timeseries
      .seasonalDecompose(rows.toDF("ts"), "ts", period = 4).collect()
    // cross-check one non-edge phase against a driver-side exact rational
    val byB = out.map(r => r.getLong(0) -> r).toMap
    val cnts = (0 until 50).map(b => 3L + b % 7)
    def trend8(b: Int): Long =
      (b - 2 to b + 2).map(cnts(_)).sum + (b - 1 to b + 1).map(cnts(_)).sum
    val detr = (2 to 47).map(b => b -> (8L * cnts(b) - trend8(b))).toMap
    for (h <- 0 until 4) {
      val ds = detr.filter(_._1 % 4 == h).values.toSeq
      val num = ds.sum * 1000000L
      val den = ds.size.toLong
      val expSeas = Math.floorDiv(num, den)
      val got = byB.values.filter(r => !r.isNullAt(3) && r.getLong(0) % 4 == h)
        .map(_.getLong(3)).toSet
      assert(got == Set(expSeas), s"phase $h: got $got want $expSeas")
    }
  }
}
