package graft

import org.apache.spark.sql.DataFrame

/** Config-robustness gate (r10 verdict ask #1), the CI face of
  * tools/config_matrix.sh: a representative graded-query subset runs
  * under every adversarial [[graft.core.SessionConfigs]] preset and must
  * produce CANON-IDENTICAL results to the default config.
  *
  * Why: the pid-offset class (r9/r10) proved a correctness bug can hide
  * behind an optimizer premise — two branches joined on
  * spark_partition_id were only consistent because ReuseExchange
  * happened to serve both from one shuffle; every oracle passed at the
  * blessed config. The fix materialized the premise at the six known
  * sites; this spec turns "no seventh site" from an argument into a
  * regression gate. The subset leans on exactly the shapes that could
  * care: every two-level pid-offset statistic, the salted skew build,
  * broadcast-hinted joins, the eager-loop graph family, and one query
  * per remaining wave. The FULL 229-query sweep runs out-of-band via
  * tools/config_matrix.sh (results in SCALE_SOAK.md "config matrix").
  *
  * Normalization matches the driver's compare (tools/check.py): columns
  * sorted by name, rows sorted, floats at 10 significant digits — so
  * "identical here" is the same claim the driver's hash makes.
  */
class ConfigMatrixSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  /** The subset: every pid-offset/two-level statistic + cross-wave
    * representatives. Kept ~20 strong so the spec stays minutes, not the
    * full sweep's hour. */
  private val subset = Seq(
    // two-level pid-offset family (the class under test)
    "t_auc", "t_ks", "t_gini", "t_prcurve", "t_qnorm", "r_quantiles_grp",
    "str_categorical",
    // partition-machinery users: salted build, run-lengths, exact slice
    "q_skew_build", "s_runlengths", "g_slice_rows",
    // joins/aggregates incl. broadcast hints
    "q1_agg", "q5_join", "q_topk_group",
    // eager-loop graph family (plan picks + checkpointed rounds) +
    // the r11 approximate faces (deterministic samplers + count-driven
    // scale-ups — new machinery the matrix must cover)
    "q_pagerank", "q_triangles", "q_kcore",
    "q_triangles_approx", "q_harmonic_approx",
    // r12: the two queries that LEFT the rows-only allowlist (their
    // determinism claim is new) + the capped linkage build
    "q_sketch", "st_neardup", "str_linkage",
    // dedup / text / similarity / events waves
    "d_minhash", "t_pack", "t_split", "sim_topk",
    "ev_funnel", "ev_asof", "st_ijoin", "st_ijoin_outer", "st_alerts")

  private def canonCell(v: Any): String = v match {
    case null => "NULL"
    case d: Double =>
      if (d.isNaN) "NaN" else f"$d%.10g"
    case f: Float => canonCell(f.toDouble)
    case s: collection.Seq[_] => s.map(canonCell).mkString("[", ",", "]")
    case a: Array[_] => a.map(canonCell).mkString("[", ",", "]")
    case r: org.apache.spark.sql.Row =>
      r.toSeq.map(canonCell).mkString("(", ",", ")")
    case x => x.toString
  }

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(r => r.toSeq.map(canonCell).mkString("|"))
      .toSeq.sorted
  }

  private def runAll(): Map[String, Seq[String]] =
    subset.map { name =>
      name -> canon(SparkEntry.queries(name)(spark, dir))
    }.toMap

  test("graded subset is canon-identical under every adversarial config preset") {
    assert(subset.forall(SparkEntry.queries.contains),
      s"unknown queries in subset: ${subset.filterNot(SparkEntry.queries.contains)}")
    val base = runAll()
    base.foreach { case (n, rows) =>
      // q_kcore's 80-core is legitimately empty at the sf0.001 fixture
      // (degrees too small) — it still must stay empty under every preset
      assert(rows.nonEmpty || n == "q_kcore", s"$n returned no rows at sf0.001")
    }
    for (preset <- Seq("no-reuse", "no-broadcast", "aqe-off", "shuffle7")) {
      val saved = graft.core.SessionConfigs(spark, preset)
      try {
        val got = runAll()
        for (n <- subset) {
          assert(got(n) == base(n),
            s"$n diverges under preset '$preset': " +
              s"${got(n).size} vs ${base(n).size} rows; first diff: " +
              got(n).zipAll(base(n), "<missing>", "<missing>")
                .find { case (a, b) => a != b }
                .map { case (a, b) => s"\n  $preset: $a\n  default: $b" }
                .getOrElse("(row count)"))
        }
      } finally graft.core.SessionConfigs.restore(spark, saved)
    }
  }
}
