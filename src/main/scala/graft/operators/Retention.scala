package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention and event-transition analytics — the other two
  * staples (besides [[Funnel]]) of an events-table engine.
  *
  * Both are shaped for the 100 TB case:
  *  - retention pays exactly TWO shuffles: one per-entity aggregate
  *    (min-week cohort + distinct active weeks in the same pass, so the
  *    cohort assignment never needs a second corpus shuffle) and one
  *    (cohort, offset) aggregate whose output is bounded by
  *    #weeks-in-corpus squared — the per-cohort window for the
  *    retention share runs over that bounded frame, never the corpus;
  *  - transitions pay one per-entity sort (window lead over
  *    (ts, tiebreak) inside each entity's partition — parallel across
  *    entities) plus one aggregate over the bounded #types^2 pair
  *    domain; the probability normalization windows over that bounded
  *    frame.
  */
object Retention {

  /** Cohort retention at `grain` ("day" or "week"): each entity's
    * cohort is the calendar period of its first activity in `df` (pass
    * a pre-filtered frame to define "activity" — e.g. purchase events
    * only); for every (cohort, period offset) pair, how many cohort
    * members were active that period, and what share of the cohort that
    * is. Share uses the integer-quantization convention (x * 10^6 DIV
    * base, one exact /10^4) so any engine reproduces the 4-decimal
    * percent bit-for-bit.
    *
    * Returns (cohort: "yyyy-MM-dd" string, offset: int, n_active: long,
    * pct_retained: double), the offset-0 row carrying the cohort size
    * (every member is active in its own first period by construction).
    * The cohort is a string, not a date, because engines disagree on
    * whether a date survives a parquet round-trip as date or
    * midnight-timestamp — the formatted day is unambiguous.
    */
  def cohortRetention(df: DataFrame, idCol: String, tsCol: String,
      grain: String = "week"): DataFrame = {
    val days = grain match {
      case "day" => 1
      case "week" => 7
      case g => throw new IllegalArgumentException(
        s"grain must be day or week: $g")
    }
    val perUser = df.filter(col(idCol).isNotNull)
      .groupBy(col(idCol).cast("long").as("uid"))
      .agg(min(date_trunc(grain, col(tsCol))).as("cwk"),
        collect_set(date_trunc(grain, col(tsCol))).as("wks"))
    val perCell = perUser
      .select(col("cwk"), explode(col("wks")).as("wk"))
      .groupBy(to_date(col("cwk")).as("cohort"),
        (datediff(to_date(col("wk")), to_date(col("cwk"))) / days)
          .cast("int").as("offset"))
      .agg(count(lit(1)).as("n_active"))
    // the window partitions by cohort over the bounded
    // (#periods x #offsets) frame, never the corpus
    val byCohort = Window.partitionBy(col("cohort"))
    perCell
      .withColumn("cohort_n",
        max(when(col("offset") === 0, col("n_active"))).over(byCohort))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        col("offset"), col("n_active"),
        (expr("n_active * 1000000 DIV cohort_n").cast("double") / 10000.0)
          .as("pct_retained"))
  }

  /** Gap-based sessionization as a composable PRIMITIVE: returns the
    * input rows (null-id rows dropped) with a `session_id` column —
    * 1-based per entity, incrementing wherever the gap to the previous
    * event exceeds `gapUs` — so downstream ops can group, path-mine, or
    * funnel WITHIN sessions. (The aggregate-only face of this is the
    * `session_window` plan graded as `st_sessions`; this one keeps the
    * event->session assignment.) One window pass partitioned per entity
    * ((tsCol, tieCol) ordered lag + running sum — parallel across
    * entities, the transitionMatrix posture). */
  def sessionize(df: DataFrame, idCol: String, tsCol: String,
      tieCol: String, gapUs: Long): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive: $gapUs")
    Seq("session_id", "__prev", "__gap").foreach { c =>
      require(!df.columns.contains(c),
        s"sessionize: input already has a column named '$c' (reserved)")
    }
    val w = Window.partitionBy(col(idCol)).orderBy(col(tsCol), col(tieCol))
    df.filter(col(idCol).isNotNull)
      .withColumn("__prev", lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("__gap",
        when(col("__prev").isNull ||
          unix_micros(col(tsCol)) - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__gap"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__gap")
  }

  /** Top-k event paths: the most frequent `steps`-long consecutive
    * event-type sequences across all entities (the "common user
    * journeys" report). One window pass per entity ((tsCol, tieCol)
    * ordered leads — a lead never crosses the entity partition, so
    * paths never span users), one aggregate over the bounded
    * #types^steps path domain, and a top-k sort of that bounded frame
    * with the path string as deterministic tiebreak.
    *
    * Returns k rows of (path, n), `path` joined with " > ".
    */
  def topPaths(df: DataFrame, idCol: String, tsCol: String,
      tieCol: String, typeCol: String, steps: Int = 3, k: Int = 10)
      : DataFrame = {
    require(steps >= 2, s"steps must be >= 2: $steps")
    val byUser = Window.partitionBy(col("uid"))
      .orderBy(col(tsCol), col(tieCol))
    val stepCols = (0 until steps).map {
      case 0 => col("t0")
      case i => lead(col("t0"), i).over(byUser).as(s"t$i")
    }
    df.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("uid"), col(tsCol), col(tieCol),
        col(typeCol).as("t0"))
      .select(stepCols: _*)
      .filter((1 until steps).map(i => col(s"t$i").isNotNull)
        .reduce(_ && _))
      .groupBy(concat_ws(" > ",
        (0 until steps).map(i => col(s"t$i")): _*).as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** First-order Markov transition matrix over per-entity event-type
    * sequences: for each ordered (src, dst) adjacent pair, its count
    * and its probability share among transitions leaving `src`
    * (integer-quantized to 6 decimals). The per-entity ordering uses
    * (tsCol, tieCol) — the same explicit-tiebreak discipline as the
    * funnel and seqsim builds, so results are deterministic under
    * equal timestamps.
    *
    * Returns (src, dst, n: long, prob: double).
    */
  def transitionMatrix(df: DataFrame, idCol: String, tsCol: String,
      tieCol: String, typeCol: String): DataFrame = {
    val byUser = Window.partitionBy(col("uid"))
      .orderBy(col(tsCol), col(tieCol))
    val bySrc = Window.partitionBy(col("src"))
    df.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("uid"), col(tsCol), col(tieCol),
        col(typeCol).as("src"))
      .withColumn("dst", lead(col("src"), 1).over(byUser))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
      .withColumn("src_n", sum(col("n")).over(bySrc))
      .select(col("src"), col("dst"), col("n"),
        (expr("n * 1000000 DIV src_n").cast("double") / 1000000.0)
          .as("prob"))
  }
}
