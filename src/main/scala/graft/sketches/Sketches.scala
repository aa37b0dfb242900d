package graft.sketches

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Sketch aggregates for 100 TB-scale approximate analytics.
  *
  * The reference has no sketches (its only aggregation is whole-array /
  * per-row reduction, SURVEY §2.5); these are Spark-native extensions for
  * the data-pipeline cases where exact distinct/quantile/frequency over
  * 100 TB is a shuffle-the-world operation but a mergeable fixed-size
  * summary is a map-side partial:
  *
  *  - distinct counts: HLL (Datasketches) — 1-2% error from a KB-sized
  *    state that merges associatively across partitions AND across runs
  *    (persist the binary sketch, union later — incremental daily rollups);
  *  - quantiles: percentile_approx (KLL-style) — bounded-error without a
  *    global sort;
  *  - per-item frequencies: CountMinSketch — overestimate-only counts from
  *    a fixed-size grid, queryable on the driver.
  *
  * All of these run as ordinary partial+final Catalyst aggregates: the
  * shuffle carries one sketch per (partition, group), never raw values.
  */
object Sketches {

  /** Mergeable HLL sketch state (binary). Persist / `hllUnion` it for
    * incremental distinct counts across batches. lgK=12 → ~1.6% rel. err. */
  def hllSketch(c: Column, lgK: Int = 12): Column = hll_sketch_agg(c, lit(lgK))

  /** Distinct-count estimate in one aggregation. */
  def hllEstimate(c: Column, lgK: Int = 12): Column =
    hll_sketch_estimate(hllSketch(c, lgK))

  /** Merge previously materialized HLL sketch states (e.g. per-day rollups
    * unioned into a month) — the incremental-aggregation path. All inputs
    * must share one lgK (allowDifferentLgConfigK=false: a mixed-precision
    * union fails loudly instead of silently degrading to the coarsest). */
  def hllUnion(sketchCol: Column): Column =
    hll_sketch_estimate(hll_union_agg(sketchCol, lit(false)))

  /** Approximate quantile(s) without a global sort; `accuracy` trades state
    * size for error (err <= 1/accuracy). */
  def quantileApprox(c: Column, percentage: Column, accuracy: Int = 10000): Column =
    percentile_approx(c, percentage, lit(accuracy))

  /** CountMinSketch aggregate (binary, driver-queryable via [[cmsCount]]).
    * eps = relative overestimate bound, confidence = probability the bound
    * holds; state is ceil(e/eps) x ceil(ln(1/(1-confidence))) longs. */
  def cmSketch(c: Column, eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): Column =
    count_min_sketch(c, lit(eps), lit(confidence), lit(seed))

  /** Query a collected CountMinSketch binary for an item's frequency
    * (never underestimates). */
  def cmsCount(bytes: Array[Byte], item: Any): Long =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      .estimateCount(item)
}
