package graft.sketches

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Bounded-memory heavy hitters (Misra-Gries) for key spaces too large to
  * group exactly — frequent n-grams / URLs / shingles over 100 TB, where
  * even the per-partition distinct set of an exact `groupBy(key).count`
  * would blow the shuffle.
  *
  * The reference has no frequency operators at all (SURVEY §2.5); this is a
  * Spark-native extension in the same family as [[Sketches]].
  *
  * Shape: one Misra-Gries summary per input partition (`mapPartitions`,
  * mutable map capped at `capacity` entries), then one ordinary groupBy-sum
  * over the ≤ `capacity × numPartitions` surviving (item, count) rows. The
  * shuffle carries summaries, never raw items.
  *
  * Guarantees (classic MG analysis, applied per partition then summed):
  *  - every emitted count is a LOWER bound on the true count, undercounting
  *    by at most N/(capacity+1) globally (N = total rows);
  *  - every item with true count > N/(capacity+1) is present in the output
  *    (if it beat the threshold globally, it beat it in ≥1 partition);
  *  - if no partition ever overflows `capacity` distinct items, counts are
  *    EXACT — capacity ≥ vocabulary turns this into an exact top-k that
  *    never shuffles more than the vocabulary.
  */
object FrequentItems {

  /** Candidate heavy hitters of `itemCol`: (item, count_low), unordered.
    * Filter/order/limit downstream (`count_low` is exact when no partition
    * overflowed, a ≤N/(capacity+1) undercount otherwise). Null items are
    * skipped — they count toward neither N nor any counter. */
  def frequentItems(df: DataFrame, itemCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    import df.sparkSession.implicits._
    val items: Dataset[String] = df.select(col(itemCol).cast("string")).as[String]
    val partials = items.mapPartitions { it =>
      val m = mutable.HashMap.empty[String, Long]
      it.foreach { s =>
        if (s != null) {
          m.get(s) match {
            case Some(n) => m.update(s, n + 1)
            case None if m.size < capacity => m.update(s, 1L)
            case None =>
              // overflow: decrement every counter (the new item's single
              // occurrence is spent as part of the same round), drop zeros
              m.mapValuesInPlace((_, v) => v - 1)
              m.filterInPlace((_, v) => v > 0)
          }
        }
      }
      m.iterator
    }.toDF("item", "cnt")
    partials.groupBy(col("item")).agg(sum(col("cnt")).as("count_low"))
  }
}
