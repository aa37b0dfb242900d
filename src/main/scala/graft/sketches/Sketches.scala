package graft.sketches

import org.apache.spark.sql.{Column, DataFrame}
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

  // ------------------------------------------------------------------
  // SQL-replayable deterministic sketch faces (r11 verdict Next #4).
  //
  // The Datasketches faces above are production-grade but their merged
  // state is an opaque binary — no SQL engine can replay the estimate,
  // so q_sketch sat on the rows-only allowlist. These faces make the
  // sketch itself the engine's own deterministic state: xxhash64
  // register/sample frames a DataFrame aggregate builds exactly, dumped
  // as aux artifacts (the aux_tri_edges precedent — the hash is not
  // SQL-replayable, the ARITHMETIC on the dumped state is), so the
  // DuckDB oracle replays the estimator arithmetic bit-for-bit.
  // Same 100 TB posture as the binary faces: per-group state is fixed
  // size (HLL_M registers / k sample rows), built by partial+final
  // aggregates — the shuffle carries state, never raw values.
  // ------------------------------------------------------------------

  /** Register count (2^9) and max rank of the replayable HLL face. */
  val HLL_M = 512
  val HLL_RMAX = 48
  /** alpha_m for m = 512 (0.7213 / (1 + 1.079/m)) in exact ppm — a
    * CONSTANT of this sketch's spec, chosen once so both engines use
    * the identical integer. */
  val HLL_ALPHA_PPM = 719783L

  /** Deterministic HLL register frame: one row per OCCUPIED register,
    * (grp, field, bucket, r) with r = 1 + trailing-zero count of a
    * second independent xxhash64 (capped at [[HLL_RMAX]]), register
    * value = max r. Trailing zeros are computed by an integer-exact
    * string spelling (bin/lpad/reverse/instr — no floating log), and
    * the whole frame is one map + one partial+final max aggregate:
    * at most m rows per group survive the map-side combine. */
  def hllRegisters(df: DataFrame, grpCol: Column, valCol: Column,
      field: String): DataFrame = {
    val w = pmod(xxhash64(valCol, lit(1)), lit(1L << HLL_RMAX))
    val rank = when(w === 0L, lit(HLL_RMAX)).otherwise(
      least(instr(reverse(lpad(bin(w), HLL_RMAX, "0")), "1"),
        lit(HLL_RMAX)))
    df.select(grpCol.as("grp"), lit(field).as("field"),
        pmod(xxhash64(valCol), lit(HLL_M.toLong)).as("bucket"),
        rank.as("rr"))
      .groupBy(col("grp"), col("field"), col("bucket"))
      .agg(max(col("rr")).cast("int").as("r"))
  }

  /** The estimate arithmetic over a register frame — exactly what the
    * DuckDB oracle replays from the dumped registers:
    *
    *   S   = Σ_occupied 2^(RMAX−r)  +  (m − occupied)·2^RMAX
    *   est = α_ppm·m²·2^RMAX DIV S DIV 10⁶
    *
    * All integer: S ≤ m·2^RMAX = 2^57 (int64); the numerator needs
    * 128 bits, so it runs in DECIMAL(38,0) here and HUGEINT in DuckDB
    * — identical values (two-step DIV == single DIV by S·10⁶ for
    * positive integers). Raw HLL estimator by spec (no small/large-
    * range correction): deterministic and replayable beats a few
    * percent of low-cardinality bias for an auditable sketch; accuracy
    * is pinned in RangeJoinSketchSpec against exact counts. */
  def hllEstimateFromRegisters(regs: DataFrame): DataFrame =
    regs.groupBy(col("grp"), col("field"))
      .agg((sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HLL_RMAX - r)"))
          + (lit(HLL_M.toLong) - count(lit(1))) * lit(1L << HLL_RMAX))
        .as("ssum"))
      .select(col("grp"), col("field"),
        expr(s"CAST($HLL_ALPHA_PPM AS DECIMAL(38,0)) * ${HLL_M.toLong * HLL_M} " +
          s"* ${1L << HLL_RMAX} DIV ssum DIV 1000000").as("est"))

  /** Deterministic bottom-k (KMV) value sample per group: the k rows
    * with the smallest xxhash64 over `keyCols` — a uniform sample
    * under the random-oracle hash, mergeable (min-combine), state
    * exactly k rows per group via [[graft.operators.GroupTopK]] (the
    * bounded aggregate: the shuffle carries ≤ k rows per partition
    * per group, never the corpus). Returns (grp, v) exploded rows —
    * the dumpable sample frame. */
  def bottomKSample(df: DataFrame, grpCol: Column, keyCols: Seq[Column],
      valCol: Column, k: Int): DataFrame =
    df.select(grpCol.as("grp"),
        struct(xxhash64(keyCols: _*).as("h"), valCol.as("v")).as("hv"))
      .groupBy(col("grp"))
      .agg(graft.operators.GroupTopK.smallestK(col("hv"), k).as("top"))
      .select(col("grp"), explode(col("top.v")).as("v"))

  /** Lower median of a sampled value frame (grp, v): the (n+1) DIV 2-th
    * smallest — an integer pick, never an interpolation, so the replay
    * is a row_number window in any engine. */
  def sampleLowerMedian(sample: DataFrame): DataFrame =
    sample.groupBy(col("grp"))
      .agg(sort_array(collect_list(col("v"))).as("vs"))
      .select(col("grp"),
        element_at(col("vs"), ((size(col("vs")) + 1) / 2).cast("int"))
          .as("median_v"))
}
