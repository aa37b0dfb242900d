package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Reducers (reference `src/dask_awkward/lib/reducers.py`), both regimes:
  *
  *  - **axis >= 1 (intra-row)**: per-list reductions as codegen'd HOFs over
  *    array columns (reference dispatches these to partitionwise
  *    `map_partitions`, `reducers.py:58-68`).
  *  - **axis = 0 / None (cross-partition)**: use plain `df.agg(sum(...))` —
  *    Catalyst's partial+final aggregation IS the reference's tree reduction
  *    (`AwkwardTreeReductionLayer`, `layers/layers.py:372-644`), with
  *    map-side combine replacing the hand-built `split_every=8` fan-in.
  *    Nothing to implement: the reducers below that the reference left
  *    unimplemented at axis=0 (`mean`/`std`/`var`, `reducers.py:328-358`)
  *    are native Spark aggregates.
  *
  * Null semantics match `mask_identity=True`: empty lists reduce to null
  * (e.g. `array_min(array())` is null), the analogue of awkward's masked
  * identity (reference `reducers.py:40-44`).
  */
package object reducers {

  private def dbl(c: Column): Column = c.cast(DoubleType)

  /** `ak.sum(axis=1)` (reference `reducers.py:517-548`). Null elements are
    * skipped, like awkward option handling. Empty list -> 0 (sum identity is
    * unmasked in awkward too). */
  def sumList(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + coalesce(dbl(x), lit(0.0)))

  /** `ak.prod(axis=1)` (reference `reducers.py:418-449`). */
  def prodList(c: Column): Column =
    aggregate(c, lit(1.0), (acc, x) => acc * coalesce(dbl(x), lit(1.0)))

  /** `ak.min/max(axis=1)` (reference `reducers.py:361-401,285-325`);
    * null on empty (mask_identity). */
  def minList(c: Column): Column = array_min(c)
  def maxList(c: Column): Column = array_max(c)

  /** `ak.count(axis=1)` (reference `reducers.py:187-219`): non-null count. */
  def countList(c: Column): Column = size(filter(c, x => x.isNotNull))

  /** `ak.count_nonzero(axis=1)` (reference `reducers.py:222-254`). */
  def countNonzeroList(c: Column): Column =
    size(filter(c, x => x.isNotNull && x =!= 0))

  /** `ak.any/all(axis=1)` (reference `reducers.py:71-102,37-68`). Empty list:
    * any=false, all=true (boolean identities, matching numpy/awkward). */
  def anyList(c: Column): Column = exists(c, x => x)
  def allList(c: Column): Column = forall(c, x => x)

  /** `ak.argmin/argmax(axis=1)` — 0-based position of the first extremum
    * (reference `reducers.py:105-170`); null on empty list. A codegen'd
    * single-scan expression ([[graft.functions.ReducerExprs.ArgExtremum]]):
    * the previous `aggregate(c, struct(best, idx, i), ...)` HOF spelling
    * allocated a struct and evaluated three interpreted when-chains per
    * element (measured 3x slower at sf0.1). The HOF-equality pin lives in
    * ReducersSpec. */
  def argminList(c: Column): Column =
    graft.functions.ReducerExprs.argExtremum(c, smaller = true)
  def argmaxList(c: Column): Column =
    graft.functions.ReducerExprs.argExtremum(c, smaller = false)

  /** The old HOF spelling, kept as the differential-test witness for
    * [[argminList]]/[[argmaxList]]. Implements the same explicit NaN
    * contract as the kernel (numpy propagation: first NaN wins both
    * directions) — Spark's raw `<`/`>` ordering treats NaN as greatest,
    * so the NaN clause must be spelled out here, not inherited. */
  private[graft] def argExtremumHof(c: Column, smaller: Boolean): Column = {
    val zero = struct(lit(null).cast(DoubleType).as("best"),
      lit(null).cast(LongType).as("idx"), lit(0L).as("i"))
    aggregate(c, zero, (acc, x) => {
      val better = x.isNotNull && !isnan(acc.getField("best")) &&
        (acc.getField("best").isNull || isnan(dbl(x)) ||
          (if (smaller) dbl(x) < acc.getField("best")
           else dbl(x) > acc.getField("best")))
      struct(
        when(better, dbl(x)).otherwise(acc.getField("best")).as("best"),
        when(better, acc.getField("i")).otherwise(acc.getField("idx")).as("idx"),
        (acc.getField("i") + 1).as("i"))
    }, acc => acc.getField("idx"))
  }

  /** `ak.mean(axis=1)` — unimplemented at axis=0 in the reference
    * (`reducers.py:328-358`); native both ways in Spark. */
  def meanList(c: Column): Column =
    when(countList(c) > 0, sumList(c) / countList(c))

  /** `ak.var(axis=1, ddof)` (reference `reducers.py:559-589`). */
  def varList(c: Column, ddof: Int = 0): Column = {
    val n = countList(c)
    val mu = meanList(c)
    val ss = aggregate(c, lit(0.0),
      (acc, x) => acc + coalesce(pow(dbl(x) - mu, 2), lit(0.0)))
    when(n > ddof, ss / (n - lit(ddof)))
  }

  /** `ak.std(axis=1, ddof)` (reference `reducers.py:484-514`). */
  def stdList(c: Column, ddof: Int = 0): Column = sqrt(varList(c, ddof))

  /** `ak.ptp(axis=1)` — max minus min (reference stub `reducers.py:452-461`). */
  def ptpList(c: Column): Column = array_max(c) - array_min(c)

  /** `ak.moment(n, axis=1)` — n-th raw moment (reference stub
    * `reducers.py:404-415`). */
  def momentList(c: Column, n: Int): Column =
    when(countList(c) > 0,
      aggregate(c, lit(0.0),
        (acc, x) => acc + coalesce(pow(dbl(x), n), lit(0.0))) / countList(c))

  /** `ak.softmax(axis=1)` (reference stub `reducers.py:464-473`).
    * Max-subtracted for numerical stability at scale. */
  def softmaxList(c: Column): Column = {
    val m = dbl(array_max(c))
    val z = aggregate(c, lit(0.0), (acc, x) => acc + exp(dbl(x) - m))
    transform(c, x => exp(dbl(x) - m) / z)
  }

  /** `ak.corr(x, y, axis=1)` — Pearson correlation of two parallel inner
    * lists (reference stub `reducers.py:173-184`). */
  def corrList(x: Column, y: Column): Column = {
    val n = size(x).cast(DoubleType)
    val sx = sumList(x); val sy = sumList(y)
    val sxx = aggregate(x, lit(0.0), (a, v) => a + dbl(v) * dbl(v))
    val syy = aggregate(y, lit(0.0), (a, v) => a + dbl(v) * dbl(v))
    val sxy = aggregate(zip_with(x, y, (a, b) => dbl(a) * dbl(b)),
      lit(0.0), (a, v) => a + v)
    val denom = sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)
    when(denom =!= 0, (n * sxy - sx * sy) / denom) // null on zero variance
  }

  /** `ak.covar(x, y, axis=1)` population covariance (reference stub
    * `reducers.py:257-268`). */
  def covarList(x: Column, y: Column): Column = {
    val n = size(x).cast(DoubleType)
    val sxy = aggregate(zip_with(x, y, (a, b) => dbl(a) * dbl(b)),
      lit(0.0), (a, v) => a + v)
    sxy / n - (sumList(x) / n) * (sumList(y) / n)
  }

  /** `ak.linear_fit(x, y, axis=1)` — least-squares slope+intercept
    * (reference stub `reducers.py:271-282`). Returns a struct. */
  def linearFitList(x: Column, y: Column): Column = {
    val n = size(x).cast(DoubleType)
    val sx = sumList(x); val sy = sumList(y)
    val sxx = aggregate(x, lit(0.0), (a, v) => a + dbl(v) * dbl(v))
    val sxy = aggregate(zip_with(x, y, (a, b) => dbl(a) * dbl(b)),
      lit(0.0), (a, v) => a + v)
    val denom = n * sxx - sx * sx
    val slope = when(denom =!= 0, (n * sxy - sx * sy) / denom) // null: zero x-variance
    struct(slope.as("slope"), ((sy - slope * sx) / n).as("intercept"))
  }
}
