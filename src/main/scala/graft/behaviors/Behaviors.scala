package graft.behaviors

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Metadata, MetadataBuilder}

/** Behaviors (SURVEY §2.12): the reference attaches methods/properties to
  * named record types via `ak.mixin_class` and dispatches unknown attribute
  * access into per-partition method calls (reference `lib/core.py:1600-1630`,
  * `tests/test_behavior.py:15-51`).
  *
  * The idiomatic Scala equivalent is an implicit (extension) class over
  * `Column`/`DataFrame`: methods resolve at compile time, the bodies are
  * ordinary Column expressions, so "behavior methods" stay inside
  * WholeStageCodegen — strictly better than the reference's Python-level
  * dispatch. Record-type *names* (`ak.with_name`) map to column Metadata.
  */
object Behaviors {

  /** `ak.with_name` / `with_parameter`: tag a column with a record-type name
    * and free-form parameters via Catalyst Metadata
    * (reference `lib/structure.py:1119-1228`). */
  implicit class NamedColumnOps(val df: DataFrame) extends AnyVal {
    def withRecordName(colName: String, recordName: String): DataFrame = {
      val md: Metadata = new MetadataBuilder()
        .withMetadata(fieldMetadata(df, colName))
        .putString("graft.record_name", recordName).build()
      df.withColumn(colName, df(colName).as(colName, md))
    }

    def recordName(colName: String): Option[String] = {
      val md = fieldMetadata(df, colName)
      if (md.contains("graft.record_name")) Some(md.getString("graft.record_name"))
      else None
    }

    /** `ak.with_parameter` / `without_parameters` (reference
      * `lib/structure.py:1161-1228`): free-form string parameters ride the
      * same column Metadata channel, namespaced under graft.param. */
    def withParameter(colName: String, key: String, value: String): DataFrame = {
      val md: Metadata = new MetadataBuilder()
        .withMetadata(fieldMetadata(df, colName))
        .putString(s"graft.param.$key", value).build()
      df.withColumn(colName, df(colName).as(colName, md))
    }

    def parameter(colName: String, key: String): Option[String] = {
      val md = fieldMetadata(df, colName)
      if (md.contains(s"graft.param.$key")) Some(md.getString(s"graft.param.$key"))
      else None
    }

    /** In awkward the record name itself is a parameter (`__record__`),
      * so dropping parameters drops the name too. */
    def withoutParameters(colName: String): DataFrame =
      df.withColumn(colName, df(colName).as(colName, Metadata.empty))
  }

  private def fieldMetadata(df: DataFrame, colName: String): Metadata =
    df.schema.fields.find(_.name == colName).map(_.metadata)
      .getOrElse(Metadata.empty)

  /** The reference's canonical behavior example: a `Point` mixin with a
    * `distance` method (reference `tests/test_behavior.py:15-26`). Works on
    * a struct column with `x`/`y` fields, at any nesting depth. */
  implicit class PointColumnOps(val c: Column) extends AnyVal {
    /** Euclidean distance to another point. */
    def distance(other: Column): Column =
      sqrt(pow(c.getField("x") - other.getField("x"), 2) +
        pow(c.getField("y") - other.getField("y"), 2))

    /** Distance to origin — a behavior "property". */
    def mag: Column =
      sqrt(pow(c.getField("x"), 2) + pow(c.getField("y"), 2))
  }

  /** Behavior over a ragged column of points: per-element method dispatch
    * inside `transform` — the analogue of the reference's partitionwise
    * `_BehaviorMethodFn` (reference `lib/core.py:2642-2656`). */
  implicit class PointListOps(val c: Column) extends AnyVal {
    def mags: Column = transform(c, p => new PointColumnOps(p).mag)
    def pairwiseDistances(other: Column): Column =
      zip_with(c, other, (a, b) => new PointColumnOps(a).distance(b))
  }
}
