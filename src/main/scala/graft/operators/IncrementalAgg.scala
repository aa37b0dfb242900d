package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of algebraic aggregates — the materialized-
  * view delta-refresh primitive: a grouped rollup over an append-only
  * fact table updates by aggregating ONLY the new batch and merging its
  * partial state into the stored state, never rescanning history. At
  * 100 TB this is the difference between a per-batch job proportional
  * to |delta| and one proportional to |corpus|.
  *
  * State layout: one row per group with `_n` (count) plus `_sum_<c>` /
  * `_min_<c>` / `_max_<c>` per measure — exactly Catalyst's own
  * partial-aggregation decomposition, lifted to a storable frame. For
  * the algebraic kinds kept here (count/sum/min/max, and avg derived as
  * sum/count at read time) the merge is associative and commutative, so
  * state built in any batch order equals the from-scratch aggregate
  * (differential-pinned in ModulesSpec). Non-algebraic aggregates
  * (exact distinct, median) need sketch states instead — see
  * [[graft.sketches]] for the mergeable forms.
  */
object IncrementalAgg {

  /** Partial-aggregate state of `df`: per group, count plus sum/min/max
    * for each measure column. One map-side-combined shuffle. */
  def buildState(df: DataFrame, groups: Seq[String],
      measures: Seq[String]): DataFrame = {
    require(groups.nonEmpty && measures.nonEmpty, "groups and measures required")
    val aggs: Seq[Column] =
      count(lit(1)).as("_n") +:
        measures.flatMap(c => Seq(
          sum(col(c)).as(s"_sum_$c"),
          min(col(c)).as(s"_min_$c"),
          max(col(c)).as(s"_max_$c")))
    df.groupBy(groups.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge any number of state frames (stored state + fresh delta
    * states) into one: groups union, counts and sums add, mins/maxes
    * fold. Shuffles only state rows — group-cardinality-sized, not
    * corpus-sized. */
  def mergeState(states: Seq[DataFrame], groups: Seq[String],
      measures: Seq[String]): DataFrame = {
    require(states.nonEmpty, "at least one state frame")
    val aggs: Seq[Column] =
      sum(col("_n")).as("_n") +:
        measures.flatMap(c => Seq(
          sum(col(s"_sum_$c")).as(s"_sum_$c"),
          min(col(s"_min_$c")).as(s"_min_$c"),
          max(col(s"_max_$c")).as(s"_max_$c")))
    states.reduce(_ unionByName _)
      .groupBy(groups.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental maintenance of an equi-JOIN view under APPEND-ONLY
    * deltas — the other half of materialized-view refresh (this object's
    * aggregate states cover Σ; joins need the algebraic delta rule):
    *
    *   Δ(A ⋈ B) = ΔA ⋈ B₀  ∪  A₀ ⋈ ΔB  ∪  ΔA ⋈ ΔB
    *
    * Returns exactly that view-delta; the caller appends it to the
    * stored view (parquet append / [[graft.io.GraftIO]] snapshot
    * commit), so a refresh never rejoins the two base tables. Work per
    * refresh: the two Δ-side joins are |Δ|-proportional (a small delta
    * broadcasts — AQE picks that up from its actual size), and the
    * A₀ ⋈ ΔB term probes the base table WITHOUT re-joining it to B —
    * with bucketed/co-partitioned base layouts (`writeBucketed`) that
    * probe is shuffle-free. Append-only is the CONTRACT: updates or
    * deletes need retraction rows (negative multiplicities) — rejected
    * here rather than silently mis-maintained; route keyed upserts
    * through snapshot CDC instead. */
  def deltaJoin(aBase: DataFrame, aDelta: DataFrame,
      bBase: DataFrame, bDelta: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "join keys required")
    aDelta.join(bBase, keys)
      .unionByName(aBase.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))
  }
}
