package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.DataType

/** The fluent face of the library: dask-awkward's Array API surface
  * (reference `src/dask_awkward/lib/core.py:1331-1795` getitem family,
  * `lib/structure.py:38-79` operator list, `lib/reducers.py`) re-expressed
  * as zero-cost extension methods, so a reference user's spelling carries
  * over almost verbatim:
  *
  * {{{
  * import graft.core.Ragged._
  * // reference: ak.sum(ds.items.quantity, axis=1)[ds.num(items) > 2]
  * nested
  *   .whereRows($"items".num > 2)
  *   .select($"o_orderkey", $"items".field("quantity").sum1.as("qty"))
  * }}}
  *
  * Everything delegates to the operator modules (`graft.structure`,
  * `graft.reducers`) — these classes add NO logic, only the reference's
  * method-style surface. All wrappers are `AnyVal` extension classes:
  * they compile away entirely, the expressions stay inside whole-stage
  * codegen, and chaining builds one Catalyst tree (the lazy "graph" the
  * reference builds with task layers falls out of Spark's plan for free).
  */
object Ragged {

  /** List-typed column ops at axis 1 — the `map_partitions`-wrapped
    * structure/reducer operators of the reference, named to match. */
  implicit class RaggedColumn(private val c: Column) extends AnyVal {
    // --- structure (reference lib/structure.py) ---
    /** `ak.flatten(a, axis=1)` — one list level removed (list-of-list rows). */
    def flattenL: Column = graft.structure.flattenInner(c)
    /** `ak.num(a, axis=1)`. */
    def num: Column = graft.structure.num(c)
    /** `ak.num(a, axis=2)`. */
    def num2: Column = graft.structure.numAxis2(c)
    /** `ak.firsts(a)` — first element or null. */
    def firsts: Column = graft.structure.firsts(c)
    /** `ak.singletons(a)` — option value to length-0/1 list. */
    def singletons: Column = graft.structure.singletons(c)
    /** `ak.pad_none(a, target)` (+`clip=True` variant). */
    def padNone(target: Int): Column = graft.structure.padNone(c, target)
    def padNoneClip(target: Int): Column = graft.structure.padNoneClip(c, target)
    /** `ak.fill_none(a, v)`. */
    def fillNone(v: Column): Column = graft.structure.fillNone(c, v)
    /** `ak.drop_none(a)`. */
    def dropNone: Column = graft.structure.dropNone(c)
    /** `ak.is_none(a, axis=1)`. */
    def isNone: Column = graft.structure.isNone(c)
    /** `ak.local_index(a)`. */
    def localIndex: Column = graft.structure.localIndex(c)
    /** `ak.sort(a)` / `ak.argsort(a)` — intra-row. */
    def sortL(ascending: Boolean = true): Column =
      graft.structure.sortList(c, ascending)
    def argsortL: Column = graft.structure.argsortList(c)
    /** `ak.run_lengths(a)`. */
    def runLengths: Column = graft.structure.runLengths(c)
    /** `a[:, start:stop]` — inner-axis slice. */
    def sliceL(start: Int, stop: Int): Column =
      graft.structure.sliceList(c, start, stop)
    /** `a[idxs]` — per-row gather by index arrays. */
    def gather(idxs: Column): Column = graft.structure.gather(c, idxs)
    /** `ak.combinations(a, 2)` / `ak.argcombinations(a, 2)`. */
    def combinations2: Column = graft.structure.combinations2(c)
    def argcombinations2: Column = graft.structure.argcombinations2(c)
    /** `ak.combinations(a, n, replacement=)` — custom Expression for general n. */
    def combinationsN(n: Int, replacement: Boolean = false): Column =
      graft.structure.combinationsN(c, n, replacement)
    /** `ak.cartesian([a, b], axis=1)` (+nested variant). */
    def cartesianWith(b: Column): Column = graft.structure.cartesianLists(c, b)
    def cartesianNestedWith(b: Column): Column =
      graft.structure.cartesianNested(c, b)
    /** `ak.concatenate([a, b], axis=1)`. */
    def concatL(b: Column): Column = graft.structure.concatLists(c, b)
    /** `ak.mask(a, pred, valid_when=)` — shape-preserving null-out. */
    def maskL(pred: Column => Column, validWhen: Boolean = true): Column =
      graft.structure.maskList(c, pred, validWhen)
    /** `ak.values_astype(a, to)`. */
    def valuesAstype(dt: DataType): Column = graft.structure.valuesAstype(c, dt)
    /** `ak.full_like / ones_like / zeros_like`. */
    def fullLike(v: Column): Column = graft.structure.fullLike(c, v)
    def onesLike: Column = graft.structure.onesLike(c)
    def zerosLike: Column = graft.structure.zerosLike(c)
    /** record field projection inside a list: `a.field` at axis 1
      * (reference `__getattr__`, core.py:1600-1630). */
    def field(name: String): Column = graft.structure.unzipField(c, name)

    // --- reducers at axis=1 (reference lib/reducers.py) ---
    def sum1: Column = graft.reducers.sumList(c)
    def prod1: Column = graft.reducers.prodList(c)
    def min1: Column = graft.reducers.minList(c)
    def max1: Column = graft.reducers.maxList(c)
    def count1: Column = graft.reducers.countList(c)
    def countNonzero1: Column = graft.reducers.countNonzeroList(c)
    def any1: Column = graft.reducers.anyList(c)
    def all1: Column = graft.reducers.allList(c)
    def argmin1: Column = graft.reducers.argminList(c)
    def argmax1: Column = graft.reducers.argmaxList(c)
    def mean1: Column = graft.reducers.meanList(c)
    def var1(ddof: Int = 0): Column = graft.reducers.varList(c, ddof)
    def std1(ddof: Int = 0): Column = graft.reducers.stdList(c, ddof)
    def ptp1: Column = graft.reducers.ptpList(c)
    def moment1(n: Int): Column = graft.reducers.momentList(c, n)
    def softmax1: Column = graft.reducers.softmaxList(c)
  }

  /** Row-level (axis 0) ops — the reference's collection-level getitem /
    * inspection family over a DataFrame of (possibly ragged) rows. */
  implicit class RaggedFrame(private val df: DataFrame) extends AnyVal {
    /** `a[boolean_array]` — row filter (reference core.py:1314-1329). */
    def whereRows(cond: Column): DataFrame = df.filter(cond)
    /** `a[["f1","f2"]]` — multi-field projection (core.py:1331-1345). */
    def fields(names: String*): DataFrame = df.select(names.map(col): _*)
    /** `a["new"] = x` — `with_field` (core.py:949-967). */
    def withField(name: String, c: Column): DataFrame = df.withColumn(name, c)
    /** `ak.without_field`. */
    def withoutField(name: String): DataFrame = df.drop(name)
    /** `a.head(n)` (core.py:1771-1785). */
    def headRows(n: Int): DataFrame = df.limit(n)
    /** `dak.sample(factor=)` (lib/inspect.py:241-273). */
    def sampleRows(fraction: Double, seed: Long = 42L): DataFrame =
      df.sample(fraction, seed)
    /** `ak.concatenate(axis=0)` (lib/operations.py:50-139) — union with
      * schema alignment. */
    def concatRows(others: DataFrame*): DataFrame =
      graft.structure.concatFrames(df +: others: _*)
    /** `ak.enforce_type` (lib/structure.py:1442-1461). */
    def enforceType(schema: org.apache.spark.sql.types.StructType): DataFrame =
      graft.structure.enforceType(df, schema)
    /** `a.fields` / `a.form` (lib/describe.py:8-42). */
    def fieldNames: Seq[String] = df.schema.fieldNames.toSeq
    def form: String = df.schema.treeString
    /** `dak.necessary_columns` (lib/inspect.py:118-219). */
    def necessaryColumns: Map[String, Seq[String]] =
      graft.inspect.Inspect.necessaryColumns(df)
    /** known-divisions emulation (core.py:1157-1175 / 1347-1489): exact
      * global ordinals and slices via the parallel prefix scan. */
    def withRowIndex(orderCol: String, outCol: String = "row_idx"): DataFrame =
      Partitions.withRowIndex(df, orderCol, outCol)
    def sliceExact(orderCol: String, start: Long, stop: Long): DataFrame =
      Partitions.sliceRows(df, orderCol, start, stop)
    /** per-partition row counts — the skew diagnostic. */
    def partitionHistogram: Seq[Long] =
      graft.inspect.Inspect.partitionHistogram(df)
  }
}
