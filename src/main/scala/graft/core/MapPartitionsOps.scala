package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.types.StructType

/** `map_partitions` (SURVEY §2.12; reference `core.py:2072-2204`) — the
  * reference's central operator: an arbitrary user function over each
  * partition. Spark's `Dataset.mapPartitions` is the direct equivalent;
  * the output schema must be declared explicitly (the analog of the
  * reference's `meta=` — Catalyst cannot simulate an opaque fn, and the
  * reference's typetracer fallback chain exists for exactly the same
  * reason).
  *
  * Partition alignment (`*colls` zipping) needs no analog: columns of one
  * DataFrame are always aligned, and cross-frame alignment is a join.
  */
object MapPartitionsOps {

  /** Untyped (DataFrame) variant: fn over Row iterators, with the output
    * schema declared up front. */
  def mapPartitionsRows(df: DataFrame, schema: StructType)(
      fn: Iterator[Row] => Iterator[Row]): DataFrame =
    df.mapPartitions(fn)(Encoders.row(schema))

  /** Typed variant: schema travels in the Encoder. */
  def mapPartitionsTyped[T, U: Encoder](ds: Dataset[T])(
      fn: Iterator[T] => Iterator[U]): Dataset[U] =
    ds.mapPartitions(fn)
}
