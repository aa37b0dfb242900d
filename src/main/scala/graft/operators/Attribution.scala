package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov-chain multi-touch attribution with removal effects
  * (Anderl et al.'s standard formulation): estimate the transition matrix
  * of the event-type journey graph from the corpus, then measure each
  * channel's worth as how much the START→conversion probability drops
  * when that channel is knocked out of the chain. The model-based answer
  * to "which touchpoint deserves credit" that last-touch/linear rules
  * fake — and the distributed part is exactly the part that needs Spark:
  * journey assembly + transition counting over the corpus.
  *
  * Scale shape: ONE corpus scan, one shuffle on the entity key (the
  * journey windows), then a transition aggregate whose cardinality is
  * (|types|+1)² — bounded by contract, so the chain solve runs on the
  * driver over a handful of integers. No per-entity state leaves the
  * aggregate.
  *
  * Determinism: probabilities and conversion values are fixed-point
  * integers (ppb — parts per 1e9): p = n·10⁹ DIV rowsum, and each
  * power-iteration term floors (p·w) DIV 10⁹ before summing, so `iters`
  * rounds produce identical integers in any engine — the ev_markov
  * oracle replays the journeys, the matrix, and every unrolled round in
  * SQL (same discipline as q_pagerank's fixed-point replay). */
object Attribution {

  private val SCALE = 1000000000L

  /** Journey semantics: per entity, events ordered by (tsCol, tieCol),
    * truncated AT the first `convType` event (purchase absorbs; later
    * events are post-conversion noise); a journey with no conversion
    * absorbs into DROP after its last event; START precedes every first
    * event. Returns one row per removable channel:
    * (channel, conv_ppb, conv_removed_ppb, removal_ppm) — the base
    * chain's START→conversion probability, the same with the channel
    * knocked out (its state forced worthless: reaching it converts
    * nothing), and the relative drop in ppm. */
  def markovRemovalEffects(df: DataFrame, idCol: String, tsCol: String,
      tieCol: String, typeCol: String, convType: String,
      iters: Int = 15): DataFrame = {
    require(iters > 0, s"iters must be positive, got $iters")
    val spark = df.sparkSession
    val byEnt = Window.partitionBy("ent")
    val ord = byEnt.orderBy(col("ts"), col("tie"))
    val evs = df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("ent"), col(tsCol).as("ts"),
        col(tieCol).as("tie"), col(typeCol).as("t"))
      .withColumn("pos", row_number().over(ord))
      .withColumn("cpos",
        min(when(col("t") === convType, col("pos"))).over(byEnt))
      .filter(col("cpos").isNull || col("pos") <= col("cpos"))
    val ordPos = Window.partitionBy("ent").orderBy("pos")
    val steps = evs
      .withColumn("src", coalesce(lag(col("t"), 1).over(ordPos), lit("START")))
      .select(col("src"), col("t").as("dst"))
    val ends = evs
      .withColumn("mpos", max(col("pos")).over(byEnt))
      .filter(col("cpos").isNull && col("pos") === col("mpos"))
      .select(col("t").as("src"), lit("DROP").as("dst"))
    val counts = steps.unionByName(ends)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
      .collect() // bounded by contract: at most (|types|+1)·(|types|+2) rows
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val rowSum = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    // p in ppb, floored — the exact integers the oracle reproduces
    val p = counts.map { case (s, d, n) => (s, d, n * SCALE / rowSum(s)) }
    val transient = p.map(_._1).distinct.sorted
    def solve(removed: Option[String]): Long = {
      var v = transient.map(_ -> 0L).toMap
      for (_ <- 1 to iters) {
        v = transient.map { s =>
          s -> (if (removed.contains(s)) 0L
          else p.iterator.filter(_._1 == s).map { case (_, d, pj) =>
            val w =
              if (d == convType) SCALE
              else if (removed.contains(d)) 0L
              else v.getOrElse(d, 0L) // DROP and unseen states are worth 0
            pj * w / SCALE
          }.sum)
        }.toMap
      }
      v.getOrElse("START", 0L)
    }
    val base = solve(None)
    val channels = transient.filter(c => c != "START" && c != convType)
    val out = channels.map { c =>
      val rem = solve(Some(c))
      val drop = if (base == 0) 0L else (base - rem) * 1000000L / base
      (c, base, rem, drop)
    }
    spark.createDataFrame(out)
      .toDF("channel", "conv_ppb", "conv_removed_ppb", "removal_ppm")
  }

  /** Position-based ("U-shaped") multi-touch attribution — the rule-
    * based industry staple next to the model-based
    * [[markovRemovalEffects]]: for each conversion, the touches since
    * the previous conversion split 40% / 20% / 40% between the first
    * touch, the middles (evenly), and the last touch (one touch takes
    * 100%, two split 50/50).
    *
    * Credits are exact integer micros: 400000 / 400000 to the ends,
    * floor(200000/(m−2)) per middle — sums replay hash-identically (the
    * flooring means a conversion credits ≤ 10⁶, not always exactly 10⁶;
    * that is the documented contract, not a rounding bug to chase).
    *
    * Plan: ONE corpus scan, one entity-key exchange; the conversion
    * segments are a running purchase-count frame and the within-segment
    * ranks a second frame of the same ordered window (touches after the
    * entity's last conversion credit nothing). Returns one row per
    * touch channel: (channel, n_touches, credit_micro). */
  def positionBasedAttribution(df: DataFrame, idCol: String, tsCol: String,
      tieCol: String, typeCol: String, convType: String): DataFrame = {
    val ord = Window.partitionBy("ent").orderBy(col("ts"), col("tie"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byEnt = Window.partitionBy("ent")
    val seg = Window.partitionBy(col("ent"), col("segAfter"))
    val segOrd = seg.orderBy(col("ts"), col("tie"))
    df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("ent"), col(tsCol).as("ts"),
        col(tieCol).as("tie"), col(typeCol).as("ch"),
        when(col(typeCol) === convType, 1L).otherwise(0L).as("isConv"))
      .withColumn("segAfter", sum(col("isConv")).over(run))
      .withColumn("nConv", sum(col("isConv")).over(byEnt))
      .filter(col("isConv") === 0L && col("segAfter") < col("nConv"))
      .withColumn("rn", row_number().over(segOrd))
      .withColumn("m", count(lit(1)).over(seg))
      .withColumn("credit",
        when(col("m") === 1L, 1000000L)
          .when(col("m") === 2L, 500000L)
          .when(col("rn") === 1 || col("rn") === col("m"), 400000L)
          .otherwise(expr("200000 DIV (m - 2)")))
      .groupBy(col("ch").as("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit")).as("credit_micro"))
  }
}
