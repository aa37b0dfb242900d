package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity time-series analytics over an event stream: robust anomaly
  * detection (median/MAD z-score on daily activity) and exponentially
  * weighted moving averages. The reference has no time-series surface;
  * this is the Spark-native superset companion to [[Funnel]]/
  * [[Retention]]/[[Experiment]] — the ops a training-data or product
  * pipeline runs to spot scraper bursts, dead sensors, and drifting
  * engagement before the data poisons downstream aggregates.
  *
  * Scale shape (both ops): ONE corpus scan, one shuffle keyed by entity;
  * everything after the per-entity fold is entity- or entity×day-sized.
  * No driver collects, no corpus-sized broadcasts.
  *
  * Determinism: daily counts are exact integers; the median/MAD pipeline
  * uses exact `percentile` (midpoint interpolation of two integers is an
  * IEEE-exact half), and the anomaly test multiplies through by the MAD
  * consistency constant as integers (|cnt-med|*10000 > z*14826*mad) so no
  * engine-specific division is compared. EWMA decay powers replay
  * bit-exact cross-engine (Java's `Math.pow` and DuckDB's libm `pow`
  * agree on these bases — pinned in TimeseriesSpec) and the weighted
  * terms fold in a SINGLE ordered running-sum window frame, so the
  * floating-point addition sequence is identical in any engine that
  * accumulates frame-ordered. Outputs quantize to micro units.
  */
object Timeseries {

  /** Robust per-entity anomaly detection on daily event counts — the
    * median/MAD z-score (Iglewicz–Hoaglin): a day is anomalous when
    * |cnt - median| > z * 1.4826 * MAD. Unlike mean/stddev, one burst day
    * cannot inflate its own yardstick (the median absorbs it), which is
    * the whole point on scraper/bot data.
    *
    * Returns only the flagged rows: (idCol, day, cnt, med_x2, mad_x4,
    * dev_sign): the median of an integer multiset is a multiple of 1/2
    * (midpoint interpolation), the MAD — a median over those half-integer
    * deviations — a multiple of 1/4, so ×2/×4 scale both into EXACT
    * integers. dev_sign is +1/-1 for burst/dropout days. Entities with
    * MAD = 0 (perfectly regular activity) flag any deviating day — the
    * strictest reading, documented rather than NULL-ed.
    *
    * Plan: one corpus scan → groupBy(entity, day) count (map-side
    * combined — events collapse to entity×day rows BEFORE the wire) →
    * median and MAD as two whole-partition WINDOW aggregates over the
    * entity key (one extra Exchange, shared by both Window nodes) →
    * filter. Exactly two shuffles, no self-joins — a join-based
    * median/MAD would re-aggregate the corpus once per consumer (the
    * divergent-subtree trap ev_seqsim fell into in r7; pinned ≤2
    * exchanges + 1 scan in TimeseriesSpec). */
  def dailyAnomalies(df: DataFrame, idCol: String, tsCol: String,
      z: Double = 3.5): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val byEnt = org.apache.spark.sql.expressions.Window.partitionBy("ent")
    // integer-side test: |cnt-med|*4 and mad*4 are exact integers, so
    // the threshold compare |cnt-med| > z·1.4826·mad becomes
    // adev4·10^8 > mad4·14826·(z·10^4) — integer×integer on both sides,
    // no division, no rounding, engine-exact.
    val zq = math.round(z * 10000).toInt
    df.filter(col(idCol).isNotNull)
      .groupBy(col(idCol).as("ent"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("med", percentile(col("cnt"), lit(0.5)).over(byEnt))
      .withColumn("adev", abs(col("cnt") - col("med")))
      .withColumn("mad4",
        (percentile(col("adev"), lit(0.5)).over(byEnt) * 4).cast("long"))
      .filter((col("adev") * 4).cast("long") * 10000L * 10000L >
        col("mad4") * 14826L * zq)
      .select(col("ent").as(idCol), col("day"), col("cnt"),
        (col("med") * 2).cast("long").as("med_x2"), col("mad4").as("mad_x4"),
        when(col("cnt") > col("med"), 1).otherwise(-1).as("dev_sign"))
  }

  /** Per-entity exponentially weighted moving average of `valCol` over
    * event order (tsCol, tieCol): e_1 = v_1, e_i = α·v_i + (1-α)·e_{i-1}.
    * Computed in closed form as an ORDERED running sum of
    * w_i·v_i (w_1 = (1-α)^(k-1), w_i = α·(1-α)^(k-i)) taken at the last
    * row — one window pass, no recursion, no per-row UDF.
    *
    * Returns one row per entity: (idCol, n_events, last_val, ewma_micro)
    * with the EWMA floored to micro units.
    *
    * Plan: one scan, ONE Exchange on the entity key; the ordered
    * row_number/running-sum and the unordered per-entity count share the
    * same partitioning so Catalyst plans a single shuffle. The frame is
    * ROWS UNBOUNDED PRECEDING — sequential in-order accumulation, which
    * is what makes the double sum deterministic and replayable. Decay
    * powers stay exact-representable territory: (1-α)^400 ≈ 1e-24 is a
    * normal double, and pow agrees bit-for-bit cross-engine (pinned). */
  def ewma(df: DataFrame, idCol: String, tsCol: String, tieCol: String,
      valCol: String, alpha: Double = 0.125): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    val ord = Window.partitionBy("ent").orderBy(col("ts"), col("tie"))
    val all = Window.partitionBy("ent")
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("ent"), col(tsCol).as("ts"),
        col(tieCol).as("tie"), col(valCol).cast("double").as("v"))
      .withColumn("rn", row_number().over(ord))
      .withColumn("k", count(lit(1)).over(all))
      .withColumn("term", col("v") *
        when(col("rn") === 1, pow(lit(1 - alpha), col("k") - 1))
          .otherwise(lit(alpha) * pow(lit(1 - alpha), col("k") - col("rn"))))
      .withColumn("acc", sum(col("term")).over(run))
      .filter(col("rn") === col("k"))
      .select(col("ent").as(idCol), col("k").as("n_events"),
        col("v").as("last_val"),
        floor(col("acc") * 1000000).cast("long").as("ewma_micro"))
  }

  /** One-sided CUSUM change detection per entity (Page 1954): the
    * classic recursion s_i = max(0, s_{i-1} + (x_i - drift)) with an
    * alarm whenever s_i > threshold.
    *
    * The recursion LOOKS like a sequential per-entity fold, but it has
    * an exact window-parallel closed form:
    *
    *   s_i = P_i − min(0, min_{j ≤ i} P_j),  P_i = Σ_{t ≤ i} (x_t − drift)
    *
    * (s_i = max_{0 ≤ j ≤ i} (P_i − P_j): the clamp at 0 is the j = i
    * term, restarts are the running-min of the prefix sum). So the
    * whole detector is a prefix sum plus a running min — two frames of
    * the SAME ordered window, one Exchange on the entity key, no
    * collect_list fold, no per-entity sequential floor. That is the
    * formulation that survives 100 TB: a power-law entity with 10^8
    * events is still just a window partition, not a driver-sized array.
    *
    * Values are quantized xq = floor(x · 100) (centi-units — one IEEE
    * multiply + floor, engine-exact), so every downstream number is
    * int64 and the output hashes identically cross-engine. `drift` and
    * `threshold` are in the same centi-units.
    *
    * Returns one row per entity: n_events, n_alarms (rows with
    * s > threshold), max_s, first_alarm_rn (1-based rank of the first
    * alarm, null when none) — the per-entity changepoint report. */
  def cusum(df: DataFrame, idCol: String, tsCol: String, tieCol: String,
      valCol: String, driftCenti: Long, thresholdCenti: Long): DataFrame = {
    val ord = Window.partitionBy("ent").orderBy(col("ts"), col("tie"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("ent"), col(tsCol).as("ts"),
        col(tieCol).as("tie"),
        floor(col(valCol).cast("double") * 100).cast("long").as("xq"))
      .withColumn("rn", row_number().over(ord))
      .withColumn("p", sum(col("xq") - lit(driftCenti)).over(run))
      .withColumn("s", col("p") - least(min(col("p")).over(run), lit(0L)))
      .groupBy(col("ent"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("s") > thresholdCenti, 1L).otherwise(0L)).as("n_alarms"),
        max(col("s")).as("max_s"),
        min(when(col("s") > thresholdCenti, col("rn"))).as("first_alarm_rn"))
      .withColumnRenamed("ent", idCol)
  }

  /** Merge overlapping (or touching) per-entity time intervals — the
    * gaps-and-islands primitive. Each event opens an interval
    * `[ts, ts + spanUs)`; intervals of the same entity that overlap or
    * touch coalesce into one "island" (a contiguous activity span:
    * machine uptime from heartbeats, user presence from page events,
    * sensor coverage from reports).
    *
    * The textbook formulation is a per-entity sequential sweep; the
    * window-parallel closed form is two frames of ONE ordered window:
    * a row starts a new island iff its start exceeds the running max of
    * all PRECEDING ends (not just the previous row's — an early long
    * interval can swallow many later short ones), and the island id is
    * the running sum of those start flags. Same scale shape as
    * [[sessionize]]/[[cusum]]: one corpus scan, one Exchange on the
    * entity key, windows and the final aggregate all entity-partitioned,
    * so a power-law entity is a window partition, never a driver array.
    *
    * All arithmetic is exact epoch-micros int64 (duration uses integer
    * division of non-negative micros, so truncation == floor in every
    * engine). Returns one row per island: (idCol, island_id, n_events,
    * start_sec, end_sec, dur_sec). */
  def mergeIntervals(df: DataFrame, idCol: String, tsCol: String,
      tieCol: String, spanUs: Long): DataFrame = {
    require(spanUs > 0, s"spanUs must be positive, got $spanUs")
    val ord = Window.partitionBy("ent").orderBy(col("s_us"), col("tie"))
    val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a null ts would yield a null s_us that sorts FIRST, takes flag 0
    // through the when/otherwise, and lands in a spurious island 0 with
    // null bounds — filter it out like every other timeseries operator
    df.filter(col(idCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).as("ent"), col(tieCol).as("tie"),
        unix_micros(col(tsCol)).as("s_us"),
        (unix_micros(col(tsCol)) + spanUs).as("e_us"))
      .withColumn("flag",
        when(col("s_us") > coalesce(max(col("e_us")).over(prev),
          lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("island_id", sum(col("flag")).over(run))
      .groupBy(col("ent"), col("island_id"))
      .agg(count(lit(1)).as("n_events"),
        expr("min(s_us) DIV 1000000").as("start_sec"),
        expr("max(e_us) DIV 1000000").as("end_sec"),
        expr("(max(e_us) - min(s_us)) DIV 1000000").as("dur_sec"))
      .withColumnRenamed("ent", idCol)
  }

  /** Per-entity daily activity FEATURE FRAME — the standard lag/rolling
    * block a training pipeline derives from an event log before any
    * model sees it (churn/propensity features: yesterday's activity,
    * trailing-week volume, recency).
    *
    * Features per active (entity, day):
    *   cnt / vsum_centi        — that day's events and centi-quantized
    *                             value sum (exact int64)
    *   lag1_cnt                — the PREVIOUS CALENDAR DAY's count via a
    *                             RANGE [-1,-1] frame: null across gaps,
    *                             never silently the last active day (the
    *                             ev_mase lag discipline)
    *   cnt_7d / days_active_7d / vsum_7d_centi — trailing-7-day RANGE
    *                             frame sums (absent days are exact
    *                             implicit zeros)
    *   days_since_prev         — recency: gap to the previous ACTIVE day
    *                             (a ROWS lag — here the jump IS the
    *                             semantics), null on the first.
    *
    * Scale shape: one corpus scan collapses to (entity, day) in a
    * map-side-combined groupBy; every window is entity-partitioned over
    * that frame. All features are exact integers — the whole frame
    * replays hash-identically in SQL. */
  def activityFeatures(df: DataFrame, idCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val ord = Window.partitionBy("ent").orderBy(col("day"))
    df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("ent"),
        expr(s"unix_micros($tsCol) DIV 86400000000").as("day"),
        floor(col(valCol).cast("double") * 100).cast("long").as("vq"))
      .groupBy(col("ent"), col("day"))
      .agg(count(lit(1)).as("cnt"), sum(col("vq")).as("vsum_centi"))
      .withColumn("lag1_cnt", max(col("cnt")).over(ord.rangeBetween(-1, -1)))
      .withColumn("cnt_7d", sum(col("cnt")).over(ord.rangeBetween(-6, 0)))
      .withColumn("days_active_7d",
        count(lit(1)).over(ord.rangeBetween(-6, 0)))
      .withColumn("vsum_7d_centi",
        sum(col("vsum_centi")).over(ord.rangeBetween(-6, 0)))
      .withColumn("days_since_prev", col("day") - lag(col("day"), 1).over(ord))
      .withColumnRenamed("ent", idCol)
  }

  /** Seasonal-naïve forecast backtest on the hourly event-count series:
    * forecast ĉ(t) = c(t − period), scored by MASE (mean absolute
    * scaled error, Hyndman–Koehler 2006) — the standard "is my
    * forecaster better than doing nothing" yardstick, and the sanity
    * gate a pipeline runs before trusting any fancier model.
    *
    * The last `holdout` buckets are the test window; earlier buckets
    * train. Both the test MAE and the scaling denominator (in-sample
    * seasonal-naïve MAE) are integer sums of |c(t) − c(t−period)|, and
    * MASE = (saeTest·nTrain)/(saeTrain·nTest) needs only ONE IEEE
    * division of exact int64 products — hash-exact cross-engine.
    *
    * The season lag is fetched with a RANGE frame pinned at exactly
    * `period` behind (`RANGE BETWEEN period PRECEDING AND period
    * PRECEDING`), so a missing bucket yields NULL (that t is skipped and
    * counted nowhere) instead of a ROWS lag silently sliding to the
    * wrong hour across gaps. Scale shape: one corpus scan → bounded
    * bucket domain → one ordered window over it.
    *
    * Returns one row: (n_train, n_test, sae_train, sae_test, mase —
    * null when either side is empty or sae_train = 0). */
  def seasonalNaiveBacktest(df: DataFrame, tsCol: String,
      period: Int = 24, holdout: Int = 168): DataFrame = {
    require(period > 0 && holdout > 0, s"bad period=$period holdout=$holdout")
    val ord = Window.orderBy(col("bucket"))
    val whole = ord.rangeBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    df.select(expr(s"unix_micros($tsCol) DIV 3600000000").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .withColumn("prev", max(col("cnt")).over(
        ord.rangeBetween(-period.toLong, -period.toLong)))
      .withColumn("isTest",
        col("bucket") > max(col("bucket")).over(whole) - holdout.toLong)
      .withColumn("ae", abs(col("cnt") - col("prev")))
      .agg(
        count(when(!col("isTest"), col("ae"))).as("n_train"),
        count(when(col("isTest"), col("ae"))).as("n_test"),
        coalesce(sum(when(!col("isTest"), col("ae"))), lit(0L)).as("sae_train"),
        coalesce(sum(when(col("isTest"), col("ae"))), lit(0L)).as("sae_test"))
      .select(col("n_train"), col("n_test"), col("sae_train"), col("sae_test"),
        expr("CASE WHEN n_train = 0 OR n_test = 0 OR sae_train = 0 THEN NULL " +
          "ELSE CAST(sae_test * n_train AS DOUBLE) / " +
          "(CAST(sae_train AS DOUBLE) * n_test) END").as("mase"))
  }

  /** Classical additive seasonal decomposition of the corpus's hourly
    * event-count series: cnt = trend + seasonal + residual, with the
    * trend a centered 2×`period` moving average and the seasonal the
    * per-phase mean of the detrended series — the decomposition a data
    * pipeline runs to separate daily rhythm from drift before alerting
    * on the residual.
    *
    * Exactness discipline: the classical estimator is rational, not
    * integer, so everything is carried in EXACT scaled integers —
    * `trend48` is the (1,2,…,2,1)/2·period weighted window sum (48ths
    * for period=24: two RANGE frames of the same ordered window, wide
    * [-p/2,+p/2] plus narrow [-(p/2-1),+(p/2-1)] — endpoints once,
    * middles twice; RANGE frames make absent buckets exact implicit
    * zeros of the count series), `detr48 = 2p·cnt − trend48`, and the
    * seasonal mean is floor-divided to micro-48ths with an explicit
    * pmod-based floor (Spark's `DIV` truncates toward zero, SQL `//`
    * floors — they disagree on negatives, so neither is used raw).
    *
    * Scale shape: ONE corpus scan collapses to the bucket domain in a
    * map-side-combined groupBy (hours: 100 TB of events is still <10⁶
    * buckets); every window after that runs over the bounded domain,
    * never the corpus. Trend/seasonal/residual are null on the first and
    * last `period/2` buckets (no centered window exists — the classical
    * edge contract, not an implementation gap).
    *
    * Returns one row per hour bucket: (bucket epoch-hour, cnt, trend48,
    * seas_micro48, resid_micro48). */
  def seasonalDecompose(df: DataFrame, tsCol: String, period: Int = 24)
      : DataFrame = {
    require(period > 0 && period % 2 == 0,
      s"period must be positive and even, got $period")
    val half = period / 2
    val ord = Window.orderBy(col("bucket"))
    val whole = ord.rangeBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val buckets = df
      .select(expr(s"unix_micros($tsCol) DIV 3600000000").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    buckets
      .withColumn("trend48",
        when(col("bucket") - min(col("bucket")).over(whole) >= half &&
             max(col("bucket")).over(whole) - col("bucket") >= half,
          sum(col("cnt")).over(ord.rangeBetween(-half, half)) +
            sum(col("cnt")).over(ord.rangeBetween(-(half - 1), half - 1))))
      .withColumn("detr48",
        lit(2L * period) * col("cnt") - col("trend48"))
      .withColumn("h", pmod(col("bucket"), lit(period.toLong)))
      .withColumn("seas_sum",
        sum(col("detr48")).over(Window.partitionBy(col("h"))))
      .withColumn("n_h",
        count(col("detr48")).over(Window.partitionBy(col("h"))))
      .withColumn("seas_micro48", when(col("detr48").isNotNull,
        expr("(seas_sum * 1000000 - pmod(seas_sum * 1000000, n_h)) DIV n_h")))
      .select(col("bucket"), col("cnt"), col("trend48"),
        col("seas_micro48"),
        (col("detr48") * 1000000L - col("seas_micro48")).as("resid_micro48"))
  }
}
