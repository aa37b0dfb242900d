package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity kernels Spark lacks natively. Spark ships
  * levenshtein (used by graft.dedup's edit-distance pairs); record
  * linkage on NAMES wants Jaro–Winkler — transposition-tolerant, prefix-
  * boosted, the matcher census/MDM pipelines standardized on. Implemented
  * as a codegen'd Catalyst expression (the custom-kernel story: scalar
  * loop in generated Java, no UDF serialization) with the STANDARD
  * semantics DuckDB's `jaro_winkler_similarity` implements — pinned
  * empirically: prefix boost (p=0.1, l≤4) applies only when jaro > 0.7,
  * either-empty → 0.0 — so the oracle can grade the kernel directly. */
object StringSimExprs {

  /** Jaro similarity over UTF-16 code units. Matching window
    * max(|a|,|b|)/2 - 1 (floor, ≥0), greedy left-to-right match marking,
    * transpositions counted over the aligned matched sequences, halved
    * in the final term: ((m/|a|) + (m/|b|) + ((m - t/2)/m)) / 3.
    * Public static so whole-stage codegen calls
    * `graft.functions.StringSimExprs.jaro(String, String)` directly. */
  def jaro(a: String, b: String): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bm(j) && a.charAt(i) == b.charAt(j)) {
          am(i) = true; bm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - t / 2.0) / md) / 3.0
  }

  /** Jaro–Winkler: boost by the common prefix (≤4 chars, p = 0.1) only
    * above the standard 0.7 threshold. */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val cap = math.min(4, math.min(a.length, b.length))
    var l = 0
    while (l < cap && a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1 - j)
  }

  /** Codegen'd expression: null-safe, Double out; the generated Java
    * calls the static kernel above — same scalar code interpreted and
    * compiled (CodegenPinSpec discipline). */
  case class JaroWinklerExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaro_winkler"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      jaroWinkler(a.asInstanceOf[UTF8String].toString,
        b.asInstanceOf[UTF8String].toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.StringSimExprs.jaroWinkler($a.toString(), $b.toString())")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def jaroWinklerSim(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinklerExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
