package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis — the Amplitude/Mixpanel staple the events
  * table begs for: per entity, how deep into an ordered stage sequence
  * (view -> click -> purchase, ...) did its time-ordered events get?
  * An event advances the funnel only when it matches the NEXT expected
  * stage; everything else (including out-of-order or repeated stages) is
  * passed over — the strict-order semantics analytics products call an
  * "in this order" funnel.
  *
  * Shape: ONE ragged build (ordered collect_list — the ev_seqsim
  * discipline: explicit tiebreak column, null-id prefilter) and then a
  * row-local fold over the ordered types inside whole-stage codegen:
  * `aggregate(types, 0, (d, t) -> if t = stages[d+1] then d+1 else d)`.
  * An entity past the last stage leaves `try_element_at` out of range
  * -> null -> condition false -> depth stays (the plain element_at
  * THROWS there under ANSI mode) — DuckDB's list indexing nulls the
  * same way, so the fold replays exactly.
  * No joins, no windows, no per-stage passes (the k-self-join spelling
  * pays k corpus scans; this pays one).
  *
  * Returns one row per entity: (idCol, depth) with depth in [0, #stages].
  */
object Funnel {

  def funnelDepth(df: DataFrame, idCol: String, tsCol: String,
      tieCol: String, typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be non-empty and distinct: $stages")
    val stagesArr: Column = array(stages.map(lit): _*)
    df.filter(col(idCol).isNotNull)
      .groupBy(col(idCol).cast("long").as("uid"))
      .agg(transform(sort_array(collect_list(struct(
          col(tsCol).as("ts"), col(tieCol).as("tie"),
          col(typeCol).as("t")))),
        x => x.getField("t")).as("types"))
      .select(col("uid").as(idCol),
        aggregate(col("types"), lit(0),
          (d, t) => when(try_element_at(stagesArr, d + 1) === t, d + 1)
            .otherwise(d)).as("depth"))
  }

  /** Conversion-window funnel: each stage beyond the first must occur
    * within `windowUs` microseconds of the PREVIOUS matched stage's
    * event — the "within N hours" knob every funnel product exposes.
    * Greedy first-match semantics (the industry convention): the fold
    * commits to the first qualifying event per stage and never
    * backtracks, which is exactly what a per-stage min-tuple chain
    * replays in SQL. Fold state is (depth, matched-event ts); the
    * window condition is skipped for stage 1 via the `d = 0` guard
    * (the init ts of 0 therefore never participates — no sentinel
    * overflow). Same one-ragged-build shape as [[funnelDepth]]; the
    * per-event ts rides inside the fold as epoch micros.
    */
  def funnelDepthWindowed(df: DataFrame, idCol: String, tsCol: String,
      tieCol: String, typeCol: String, stages: Seq[String],
      windowUs: Long): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be non-empty and distinct: $stages")
    require(windowUs > 0, s"windowUs must be positive: $windowUs")
    val stagesArr: Column = array(stages.map(lit): _*)
    df.filter(col(idCol).isNotNull)
      .groupBy(col(idCol).cast("long").as("uid"))
      .agg(transform(sort_array(collect_list(struct(
          unix_micros(col(tsCol)).as("ts"), col(tieCol).as("tie"),
          col(typeCol).as("t")))),
        x => struct(x.getField("ts").as("ts"), x.getField("t").as("t")))
        .as("evs"))
      .select(col("uid").as(idCol),
        aggregate(col("evs"),
          struct(lit(0).as("d"), lit(0L).as("mts")),
          (s, e) => {
            val d = s.getField("d"); val mts = s.getField("mts")
            when(try_element_at(stagesArr, d + 1) === e.getField("t") &&
                (d === 0 || e.getField("ts") <= mts + windowUs),
              struct((d + 1).as("d"), e.getField("ts").as("mts")))
              .otherwise(s)
          },
          s => s.getField("d")).as("depth"))
  }

  /** Per-entity matched-stage timestamps — the raw material for
    * time-to-convert analytics: for each entity, the epoch-micros of
    * the event that matched stage i (null from the first unreached
    * stage on). Same single ragged build and greedy fold as
    * [[funnelDepthWindowed]], with the fold state carrying the
    * bounded #stages-length array of matched times instead of just the
    * depth. Returns (idCol, s1_us .. sK_us). */
  def funnelStageTimes(df: DataFrame, idCol: String, tsCol: String,
      tieCol: String, typeCol: String, stages: Seq[String],
      windowUs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be non-empty and distinct: $stages")
    windowUs.foreach(w => require(w > 0, s"windowUs must be positive: $w"))
    val stagesArr: Column = array(stages.map(lit): _*)
    val k = stages.size
    df.filter(col(idCol).isNotNull)
      .groupBy(col(idCol).cast("long").as("uid"))
      .agg(transform(sort_array(collect_list(struct(
          unix_micros(col(tsCol)).as("ts"), col(tieCol).as("tie"),
          col(typeCol).as("t")))),
        x => struct(x.getField("ts").as("ts"), x.getField("t").as("t")))
        .as("evs"))
      .select(col("uid").as(idCol),
        aggregate(col("evs"),
          // state: matched micros per reached stage, growing array
          array().cast("array<long>").as("m"),
          (m, e) => {
            val d = size(m)
            val inWindow = windowUs match {
              case Some(w) => d === 0 ||
                e.getField("ts") <= try_element_at(m, lit(-1)) + w
              case None => lit(true)
            }
            when(d < k &&
                try_element_at(stagesArr, d + 1) === e.getField("t") &&
                inWindow,
              concat(m, array(e.getField("ts")))).otherwise(m)
          })
          .as("m"))
      .select(col(idCol) +: (1 to k).map(i =>
        try_element_at(col("m"), lit(i)).as(s"s${i}_us")): _*)
  }

  /** Skew-safe funnel build: identical output to [[funnelDepth]] /
    * [[funnelDepthWindowed]], but the ragged build runs through
    * `Skew.saltedCollectSortedList` — phase 1 packs each entity's
    * events into per-(entity, salt) segments in parallel, phase 2's
    * shuffle carries `salts` packed arrays per entity instead of one
    * row per event. The fix for the one scale hazard of the plain
    * build: a pathological hot entity (a bot with 10^8 events)
    * otherwise serializes its whole collect_list into one task. The
    * fold itself is unchanged — it runs on the reassembled, fully
    * sorted sequence, and being per-entity sequential it is the floor
    * neither form can parallelize (measured: 1.34x at 16M events with
    * 99% on one entity, a tie at 90%/4M — tools/FunnelSkewProbe,
    * docs/SCALE_SOAK.md). Reach for this when the hot entity's SORT
    * dominates (very wide rows, spilling); the plain build is one
    * shuffle stage cheaper otherwise. */
  def funnelDepthSalted(df: DataFrame, idCol: String, tsCol: String,
      tieCol: String, typeCol: String, stages: Seq[String],
      salts: Int = 32, windowUs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be non-empty and distinct: $stages")
    val stagesArr: Column = array(stages.map(lit): _*)
    val base = df.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("uid"),
        unix_micros(col(tsCol)).as("__ts"), col(tieCol).as("__tie"),
        col(typeCol).as("__t"))
    val built = graft.core.Skew.saltedCollectSortedList(base, "uid",
      struct(col("__ts").as("ts"), col("__tie").as("tie"),
        col("__t").as("t")),
      "evs", salts, Seq(col("__ts"), col("__tie")))
    windowUs match {
      case Some(w) =>
        built.select(col("uid").as(idCol),
          aggregate(col("evs"),
            struct(lit(0).as("d"), lit(0L).as("mts")),
            (s, e) => {
              val d = s.getField("d"); val mts = s.getField("mts")
              when(try_element_at(stagesArr, d + 1) === e.getField("t") &&
                  (d === 0 || e.getField("ts") <= mts + w),
                struct((d + 1).as("d"), e.getField("ts").as("mts")))
                .otherwise(s)
            },
            s => s.getField("d")).as("depth"))
      case None =>
        built.select(col("uid").as(idCol),
          aggregate(transform(col("evs"), x => x.getField("t")), lit(0),
            (d, t) => when(try_element_at(stagesArr, d + 1) === t, d + 1)
              .otherwise(d)).as("depth"))
    }
  }

  /** The funnel report: per-depth entity counts plus the cumulative
    * "reached at least this stage" counts and conversion shares that
    * analytics UIs chart. One extra #stages-row aggregate over the
    * per-entity depths; the cumulative sum runs over that bounded frame
    * (never the corpus). Returns (depth, n, n_reached, pct_of_entered)
    * for depth in [0, #stages]. */
  def funnelReport(df: DataFrame, idCol: String, tsCol: String,
      tieCol: String, typeCol: String, stages: Seq[String],
      windowUs: Option[Long] = None): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("depth").desc)
      .rowsBetween(Long.MinValue, 0)
    val winAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val depths = windowUs match {
      case Some(w) =>
        funnelDepthWindowed(df, idCol, tsCol, tieCol, typeCol, stages, w)
      case None => funnelDepth(df, idCol, tsCol, tieCol, typeCol, stages)
    }
    depths
      .groupBy(col("depth")).agg(count(lit(1)).as("n"))
      .select(col("depth"), col("n"),
        sum(col("n")).over(win).as("n_reached"),
        sum(col("n")).over(winAll).as("total"))
      .select(col("depth"), col("n"), col("n_reached"),
        // integer-quantized share — the qualityScore convention: integer
        // division (n_reached * 10^6) DIV total, then ONE exact division
        // by 10^4 yields a 4-decimal percent identical in any engine
        (expr("n_reached * 1000000 DIV total").cast("double") / 10000.0)
          .as("pct_of_entered"))
  }
}
