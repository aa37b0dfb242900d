package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for the ragged-build shuffle.
  *
  * `groupBy(key).agg(sort_array(collect_list(...)))` (the [[Tables.ordersNested]]
  * shape) sends every row of a hot key to ONE reducer as individual shuffle
  * records. Catalyst's map-side partial aggregation does apply to
  * collect_list, but a key that dominates its input partitions still yields
  * one huge record stream into a single task; AQE's skew handling splits
  * joins, not aggregates.
  *
  * [[saltedCollectSortedList]] runs the standard two-phase fix: phase 1
  * groups on (key, salt) — the hot key's rows spread over `salts` cells
  * that pre-pack into arrays in parallel — and phase 2 merges the packed
  * arrays per key (`flatten` + one final `sort_array`). The final sort
  * makes the result independent of merge order, so the output is
  * bit-identical to the unsalted build. The wide row for the hot key still
  * exists (it IS the output), but the final shuffle carries `salts`
  * pre-packed records per key instead of millions of row-records, and
  * phase-1 parallelism scales with `salts`.
  */
object Skew {

  /** Deterministic per-row salt in [0, salts): hash of the given columns. */
  def rowSalt(salts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salts.toLong)).cast("int")

  /** Two-phase salted equivalent of
    * `groupBy(keyCol).agg(sort_array(collect_list(valueStruct)))`.
    *
    * `saltCols` must be row-distinguishing enough to spread a hot key
    * (e.g. a line number or the value struct itself). Output: (keyCol,
    * outCol) with outCol the fully sorted array — identical to the
    * unsalted form. */
  def saltedCollectSortedList(df: DataFrame, keyCol: String,
      valueStruct: Column, outCol: String, salts: Int,
      saltCols: Seq[Column]): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn("__graft_salt", rowSalt(salts, saltCols: _*))
      .groupBy(col(keyCol), col("__graft_salt"))
      .agg(collect_list(valueStruct).as("__graft_part"))
      .groupBy(col(keyCol))
      .agg(sort_array(flatten(collect_list(col("__graft_part")))).as(outCol))
  }
}
