package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized in waves under `graft.queries`; each wave object
  * contributes a `queries` map (Spark implementations) and an `oracle` map
  * (equivalent DuckDB SQL the driver hash-compares against). Non-SQL-
  * expressible / approximate operators appear in `queries` only (weaker
  * rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises the nested ("ragged") path end-to-end: build order-with-items
    * rows, reduce the inner axis with codegen'd HOFs, top-k the result. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val nested = Tables.ordersNested(spark, dir)
    nested.select(
      col("o_orderkey"),
      graft.structure.num(col("items")).as("n_items"),
      round(graft.reducers.sumList(
        transform(col("items"),
          x => x.getField("extendedprice") * (lit(1) - x.getField("discount")))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(20)
  }

  private val waves: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (_root_.graft.queries.Relational.queries, _root_.graft.queries.Relational.oracle),
      (_root_.graft.queries.Structure.queries, _root_.graft.queries.Structure.oracle),
      (_root_.graft.queries.ReducerQueries.queries, _root_.graft.queries.ReducerQueries.oracle),
      (_root_.graft.queries.StringQueries.queries, _root_.graft.queries.StringQueries.oracle),
      (_root_.graft.queries.TextQueries.queries, _root_.graft.queries.TextQueries.oracle),
      (_root_.graft.queries.DedupQueries.queries, _root_.graft.queries.DedupQueries.oracle),
      (_root_.graft.queries.SimilarityQueries.queries, _root_.graft.queries.SimilarityQueries.oracle),
      (_root_.graft.queries.EventQueries.queries, _root_.graft.queries.EventQueries.oracle),
      (_root_.graft.queries.GetitemIoQueries.queries, _root_.graft.queries.GetitemIoQueries.oracle)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    waves.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * SQL may contain the literal `__OUTDIR__`: Verify substitutes the
    * resolved output directory when writing oracle_sql.json, letting an
    * oracle read an [[auxDumps]] artifact (e.g. replay an LSH pipeline
    * over Spark-dumped xxh64 signatures that no SQL engine can recompute). */
  def oracleSql: Map[String, String] =
    waves.iterator.map(_._2).reduce(_ ++ _)

  /** Auxiliary artifacts Verify dumps alongside the graded queries — NOT
    * graded rows themselves; they exist so an oracle in [[oracleSql]] can
    * ground a structural replay on Spark-computed intermediates. */
  def auxDumps: Map[String, (SparkSession, String) => DataFrame] =
    _root_.graft.queries.DedupQueries.aux ++
      _root_.graft.queries.SimilarityQueries.aux ++
      _root_.graft.queries.Relational.aux ++
      _root_.graft.queries.EventQueries.aux
}
