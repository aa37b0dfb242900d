package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join.
  *
  * The reference has no relational joins at all (SURVEY §2.6,
  * `src/dask_awkward/__init__.py:1-108`); this is a Spark-native extension
  * for the event-pipeline family (windows, attribution, sensor alignment).
  *
  * Spark has no native range-join optimization: a bare
  * `left.join(right, pt.between(start, end))` has no equi key, so Catalyst
  * plans a BroadcastNestedLoopJoin (small right) or a cartesian product —
  * O(|L|x|R|) predicate evaluations, fatal at 100 TB.
  *
  * [[pointInInterval]] manufactures an equi key instead: pick a bucket width
  * `w`, explode each interval to the buckets it overlaps
  * (`sequence(floor(start/w), floor(end/w))`), map each point to its single
  * bucket (`floor(pt/w)`), and equi-join on the bucket with the residual
  * `BETWEEN` predicate attached. Every (point, interval) match shares exactly
  * one bucket, so results are exact with no duplicates. The join is then a
  * plain shuffled hash / sort-merge join: partial aggregation, AQE skew
  * splitting, and broadcast promotion all apply as usual.
  *
  * Scale notes (100 TB design):
  *  - shuffle volume is O(|L| + |R| * avgSpan/w): choose `w` near the median
  *    interval width so each interval lands in ~1-2 buckets;
  *  - a hot bucket (many intervals covering one time range) is an ordinary
  *    skewed join key — AQE skew-join splitting handles it without salting
  *    because the build side is replicated per split;
  *  - if the interval table is small, skip all of this and use
  *    [[pointInIntervalBroadcast]] — one broadcast pass over L with no
  *    shuffle or row replication is strictly better.
  */
object RangeJoin {

  /** Tag `colName` with a per-join bucket width for
    * [[graft.plans.RangeJoinRewrite]]: joins whose range predicate touches
    * this column rewrite with THIS width instead of the session-wide
    * `spark.graft.rangeJoin.bucketWidth`. The width travels as column
    * metadata on the attribute — it survives pruning, pushdown, and
    * aliasing, so two range joins with different natural widths (e.g. a
    * seconds-scale event join and a days-scale calendar join) coexist in
    * one session. */
  def withBucketWidthHint(df: DataFrame, colName: String, width: Long): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(df.schema(colName).metadata)
      .putLong(graft.plans.RangeJoinRewrite.WidthMetaKey, width)
      .build()
    df.withColumn(colName, df(colName).as(colName, meta))
  }

  /** Exact inner point-in-interval join via bucket equi-keys.
    *
    * `pt`, `start`, `end` must be numeric or timestamp columns in the same
    * unit (timestamps are cast to epoch seconds). Column names must be
    * distinct across `left` and `right`.
    */
  def pointInInterval(left: DataFrame, right: DataFrame,
      pt: String, start: String, end: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"left/right column names must be distinct, both have: $overlap")
    val b = "__rj_bucket"
    require(!left.columns.contains(b) && !right.columns.contains(b),
      s"input already has internal column $b")

    def secs(c: Column) = c.cast("double")
    val lb = left.withColumn(b, floor(secs(col(pt)) / bucketWidth).cast("long"))
    // Clamp the sequence end to >= its start: a degenerate start>end interval
    // otherwise explodes to a DESCENDING sequence (Spark default step -1) —
    // one sentinel row like [epoch, -1] allocates tens of millions of
    // elements. Clamped it yields a single bucket row, and the residual
    // BETWEEN (unsatisfiable when start>end) vetoes it — same results.
    val loB = floor(secs(col(start)) / bucketWidth).cast("long")
    val hiB = floor(secs(col(end)) / bucketWidth).cast("long")
    val rb = right.withColumn(b, explode(sequence(loB, greatest(loB, hiB))))
    lb.join(rb,
        lb(b) === rb(b) && col(pt) >= col(start) && col(pt) <= col(end),
        "inner")
      .drop(b)
  }

  /** Exact inner interval-overlap join (`[lstart,lend] ∩ [rstart,rend] ≠ ∅`)
    * via the same bucket scheme, both sides exploded. An overlapping pair
    * shares every bucket in `[max(⌊ls/w⌋,⌊rs/w⌋), min(⌊le/w⌋,⌊re/w⌋)]`, so
    * the join keeps only the FIRST shared bucket (`b = max(⌊ls/w⌋,⌊rs/w⌋)`)
    * — exactly one surviving copy per pair, no distinct pass over the
    * output. Shuffle volume is O(|L|·spanL/w + |R|·spanR/w).
    *
    * Degenerate (start > end) intervals follow the raw predicate, exactly
    * like the SQL form `lstart <= rend AND rstart <= lend` — fuzz-verified
    * in DifferentialFuzzSpec. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lstart: String, lend: String, rstart: String, rend: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"left/right column names must be distinct, both have: $overlap")
    val b = "__rj_bucket"
    require(!left.columns.contains(b) && !right.columns.contains(b),
      s"input already has internal column $b")

    def secs(c: Column) = c.cast("double")
    // Clamped like pointInInterval. Degenerate-interval matches survive the
    // clamp: a pair matching the raw predicate joins on bucket
    // b = max(⌊ls/w⌋,⌊rs/w⌋), and each side still generates it — if
    // ⌊rs/w⌋ > ⌊ls/w⌋ then rs <= lend (from the predicate) gives
    // ⌊rs/w⌋ <= ⌊lend/w⌋ <= the clamped end, symmetrically on the right.
    def buckets(s: String, e: String) = {
      val loB = floor(secs(col(s)) / bucketWidth).cast("long")
      val hiB = floor(secs(col(e)) / bucketWidth).cast("long")
      explode(sequence(loB, greatest(loB, hiB)))
    }
    val lb = left.withColumn(b, buckets(lstart, lend))
    val rb = right.withColumn(b, buckets(rstart, rend))
    lb.join(rb,
        lb(b) === rb(b) &&
          col(lstart) <= col(rend) && col(rstart) <= col(lend) &&
          lb(b) === greatest(
            floor(secs(col(lstart)) / bucketWidth).cast("long"),
            floor(secs(col(rstart)) / bucketWidth).cast("long")),
        "inner")
      .drop(b)
  }

  /** Small-interval-table path: broadcast nested loop IS the right plan when
    * R fits in a broadcast — one pass over L, zero shuffle, no row
    * replication. Caller asserts smallness by choosing this method. */
  def pointInIntervalBroadcast(left: DataFrame, right: DataFrame,
      pt: String, start: String, end: String): DataFrame =
    left.join(broadcast(right),
      col(pt) >= col(start) && col(pt) <= col(end), "inner")
}
