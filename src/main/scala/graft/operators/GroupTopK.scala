package graft.operators

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK

/** Bounded per-group top-k as an AGGREGATE, not a window.
  *
  * `row_number().over(partitionBy(g).orderBy(o)) <= k` (the q_window shape;
  * the reference itself has no windows — SURVEY §2.7) shuffles EVERY row to
  * its group's reducer and sorts whole partitions, keeping k of n only at
  * the very end. At 100 TB that is a full-data shuffle for a k·|groups|-row
  * answer.
  *
  * These wrap Spark's internal `CollectTopK` aggregate (a fixed k-entry
  * BoundedPriorityQueue per group): map-side partials already hold ≤k
  * values, partials merge by heap-union, so the shuffle carries at most
  * k values per (input partition, group) — the same partial-aggregation
  * contract every other agg in the engine rides on. Ordering is the value
  * type's own (structs compare lexicographically, field order = sort
  * priority; negate a numeric field to flip its direction).
  */
object GroupTopK {

  private def topK(c: Column, k: Int, reverse: Boolean): Column = {
    require(k > 0, s"k must be positive, got $k")
    GraftBridge.column(new CollectTopK(GraftBridge.expression(c), k, reverse, 0, 0)
      .toAggregateExpression())
  }

  /** The k SMALLEST values of `c` per group, ascending (rank order). */
  def smallestK(c: Column, k: Int): Column = topK(c, k, reverse = true)

  /** The k LARGEST values of `c` per group, descending (rank order). */
  def largestK(c: Column, k: Int): Column = topK(c, k, reverse = false)

  /** Deterministic per-group cap: keep the `k` rows with the smallest
    * stable hash — the domain-quota / per-source-cap operation of a
    * training pipeline (e.g. at most N documents per domain so no source
    * dominates the mix), with no RNG, identical picks on any cluster or
    * partitioning, and bounded aggregation state instead of a per-group
    * window sort. `hashCol` must be deterministic (e.g. polyhash of an
    * id or the content) and non-null — struct ordering puts null hashes
    * FIRST, so null-hash rows would deterministically claim cap slots;
    * ties break on `idCol`. Returns (groupCol, idCol, cap_hash) —
    * semi-join back for the full rows. */
  def capPerGroup(df: org.apache.spark.sql.DataFrame, groupCol: String,
      idCol: String, hashCol: Column, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.groupBy(col(groupCol))
      .agg(smallestK(struct(hashCol.as("h"), col(idCol).as("i")), k).as("top"))
      .select(col(groupCol), explode(col("top")).as("t"))
      .select(col(groupCol), col("t.i").as(idCol), col("t.h").as("cap_hash"))
  }
}
