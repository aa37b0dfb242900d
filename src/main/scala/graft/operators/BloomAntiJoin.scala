package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._

/** Anti join with a Bloom-filter pre-prune — exact semantics, sub-shuffle
  * cost (the reference has no joins at all, SURVEY §2.6; this is the Spark-
  * native scale path for "drop everything already present in that corpus",
  * the contamination/blocklist filter of training-data pipelines).
  *
  * A plain `left_anti` join shuffles the ENTIRE left side on the join key.
  * But anti-join membership is one-sided: a Bloom filter over the right
  * keys proves non-membership with zero false negatives, so every left row
  * whose key misses the filter is part of the answer WITHOUT being
  * shuffled. Only the (fpp-small) might-contain candidate set pays the
  * exact anti join. At 100 TB: the filter is a few MB broadcast to every
  * executor, the shuffle shrinks from |left| to ~|matches| + fpp*|left|,
  * and the result is still bit-exact — the residual exact join clears the
  * false positives. (Catalyst's InjectRuntimeFilter applies the same trick
  * to equi-joins but never to the anti side's full-result path.)
  *
  * Both sides hash through xxhash64 into the filter, so membership tests
  * long-vs-long — no boxing, and `BloomFilterMightContain` stays
  * codegen-friendly next to the scan.
  */
object BloomAntiJoin {

  /** Serialized Bloom filter over xxhash64 of `keyCol`, built distributed
    * (one pass over df, partial filters OR-merged). */
  private def buildFilter(df: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = df.select(xxhash64(col(keyCol)).as("__graft_h"))
      .stat.bloomFilter("__graft_h", expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `might_contain(filter, xxhash64(key))` as a Column. */
  private def mightContain(filterBytes: Array[Byte], key: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal.create(filterBytes),
      GraftBridge.expression(xxhash64(key))))

  /** All left rows whose `leftKey` does not appear in right's `rightKey` —
    * identical to `left.join(right, ..., "left_anti")`, cheaper shuffle.
    *
    * `expectedItems`/`fpp` size the filter (~1.2 MB per million items at
    * 1%); correctness does not depend on them, only the candidate-set
    * size does. */
  def bloomAntiJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bytes = buildFilter(right, rightKey, expectedItems, fpp)
    val might = mightContain(bytes, col(leftKey))
    // definite misses pass straight through (no shuffle); only candidates
    // (true matches + false positives) run the exact anti join
    val misses = left.filter(!might)
    val candidates = left.filter(might)
      .join(right.select(col(rightKey)).withColumnRenamed(rightKey, "__graft_rk"),
        col(leftKey) === col("__graft_rk"), "left_anti")
    misses.unionByName(candidates)
  }
}
