package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment (A/B) analysis over an event stream — the two-proportion
  * z-test every growth/quality team runs at corpus scale. The reference
  * has no statistics surface at all; this is the Spark-native superset
  * companion to the funnel/retention family in [[Funnel]]/[[Retention]].
  *
  * Scale shape: ONE corpus scan, per-entity conversion folded in a
  * map-side-combined aggregate keyed by entity (the only shuffle moves
  * one row per entity), then a bounded per-arm rollup. Everything after
  * the entity aggregate is arm-cardinality-sized; the multi-metric face
  * folds N conversion definitions in the SAME single scan (one extra
  * aggregate column per metric, not one extra pass).
  *
  * Determinism: counts are exact integers; rates are integer basis
  * points; the z statistic is computed from those integers with IEEE
  * double division/sqrt (correctly rounded, engine-identical — every
  * literal is cast to DOUBLE so neither engine falls into decimal
  * division) and floored to micro units — so the whole report replays
  * hash-exact in SQL.
  */
object Experiment {

  /** Shared finisher: from integer (n_a, conv_a, n_b, conv_b) counts to
    * basis-point rates and the pooled two-proportion z statistic in
    * floor-micro units (null when a denominator or the pooled variance
    * is 0). `keyCols` pass through in front (e.g. the metric tag). */
  private def zReport(counts: DataFrame, keyCols: Seq[String]): DataFrame =
    counts
      .withColumn("pa",
        expr("CASE WHEN n_a = 0 THEN NULL ELSE CAST(conv_a AS DOUBLE) / n_a END"))
      .withColumn("pb",
        expr("CASE WHEN n_b = 0 THEN NULL ELSE CAST(conv_b AS DOUBLE) / n_b END"))
      .withColumn("pp",
        expr("CASE WHEN n_a + n_b = 0 THEN NULL ELSE CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) END"))
      .withColumn("pv", expr(
        "pp * (1 - pp) * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)"))
      .select(keyCols.map(col) ++ Seq(
        col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        expr("CASE WHEN n_a = 0 THEN NULL ELSE (conv_a * 10000) DIV n_a END")
          .as("rate_a_bp"),
        expr("CASE WHEN n_b = 0 THEN NULL ELSE (conv_b * 10000) DIV n_b END")
          .as("rate_b_bp"),
        expr("CASE WHEN pv IS NULL OR pv <= 0 THEN NULL ELSE " +
          "CAST(floor((pa - pb) / sqrt(pv) * 1000000) AS BIGINT) END")
          .as("z_micro")): _*)

  /** Two-proportion z-test: entities split into arms by `armExpr`
    * (deterministic, e.g. a user-id column — the assignment is its value
    * mod 2), an entity converts when ANY of its events satisfies
    * `convExpr` (nulls count as non-converting). Returns one row:
    * per-arm entity/conversion counts, rates in basis points, and the
    * pooled two-proportion z statistic in floor-micro units. */
  def abTest(df: DataFrame, idCol: String, armExpr: Column,
      convExpr: Column): DataFrame =
    abTestMetrics(df, idCol, armExpr, Seq("m" -> convExpr)).drop("metric")

  /** The multi-metric face: N named conversion definitions evaluated in
    * ONE corpus scan — the per-entity aggregate carries one max-flag
    * column per metric, the per-arm rollup one pair of sums per metric,
    * and a `stack` unpivot emits one z-test row per metric. Output:
    * (metric, n_a, conv_a, n_b, conv_b, rate_a_bp, rate_b_bp, z_micro).
    */
  def abTestMetrics(df: DataFrame, idCol: String, armExpr: Column,
      metrics: Seq[(String, Column)]): DataFrame = {
    require(metrics.nonEmpty, "abTestMetrics: at least one metric")
    metrics.foreach { case (nm, _) =>
      require(nm.matches("[A-Za-z0-9_]+"), s"metric name not an identifier: $nm") }
    val entityAggs = first(armExpr.cast("long") % 2).as("arm") +:
      metrics.map { case (nm, c) =>
        max(coalesce(c.cast("int"), lit(0))).as(s"c_$nm") }
    val perEntity = df
      .filter(col(idCol).isNotNull)
      .groupBy(col(idCol).as("ent"))
      .agg(entityAggs.head, entityAggs.tail: _*)
    val armAggs = Seq(
      sum(when(col("arm") === 0, 1).otherwise(0)).as("n_a"),
      sum(when(col("arm") === 1, 1).otherwise(0)).as("n_b")) ++
      metrics.flatMap { case (nm, _) => Seq(
        sum(when(col("arm") === 0, col(s"c_$nm")).otherwise(0)).cast("long")
          .as(s"ca_$nm"),
        sum(when(col("arm") === 1, col(s"c_$nm")).otherwise(0)).cast("long")
          .as(s"cb_$nm")) }
    val wide = perEntity.agg(armAggs.head, armAggs.tail: _*)
    val stacked = wide.selectExpr("n_a", "n_b",
      s"stack(${metrics.size}, " + metrics.map { case (nm, _) =>
        s"'$nm', ca_$nm, cb_$nm" }.mkString(", ") +
        ") AS (metric, conv_a, conv_b)")
    zReport(stacked, Seq("metric"))
  }
}
