package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Tight-loop kernels for the per-list reducers whose HOF spellings are
  * interpreted and allocation-heavy.
  *
  * `ak.argmin/argmax(axis=1)` (reference `lib/reducers.py:105-170`) was a
  * `aggregate(c, struct(best, idx, i), ...)` fold: one struct allocation
  * plus three interpreted when-chains PER ELEMENT. This expression is the
  * same scan as one loop — null elements are skipped but still advance the
  * index (matching awkward's option handling), ties keep the FIRST
  * extremum, empty/all-null lists yield null (mask_identity) — and
  * implements doGenCode via the static-call pattern so the surrounding
  * projection stays inside whole-stage codegen.
  */
object ReducerExprs {

  @inline private def elem(arr: ArrayData, i: Int, et: DataType): Double =
    et match {
      case FloatType => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case IntegerType => arr.getInt(i).toDouble
      case LongType => arr.getLong(i).toDouble
      case ShortType => arr.getShort(i).toDouble
      case ByteType => arr.getByte(i).toDouble
      case _ => throw new IllegalArgumentException(s"non-numeric list: $et")
    }

  /** Shared kernel; boxed so empty/all-null can be null.
    *
    * NaN contract (explicit, numpy/awkward semantics): NaN PROPAGATES —
    * the first NaN's index is the result of both argmin and argmax, as in
    * `np.argmin`/`ak.argmin`. This intentionally diverges from Spark SQL
    * ordering (where NaN sorts greatest, so `array_position(x, array_max
    * (x))`-style spellings would treat NaN as a maximum only); the HOF
    * witness in reducers/package.scala implements the same contract and
    * the ReducersSpec pin covers NaN-first, NaN-mid and all-NaN rows. */
  def argExtremumEval(arr: ArrayData, smaller: Boolean, et: DataType): java.lang.Long = {
    val n = arr.numElements()
    var best = 0.0
    var idx = -1L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = elem(arr, i, et)
        if (x.isNaN) return java.lang.Long.valueOf(i)
        if (idx < 0 || (if (smaller) x < best else x > best)) {
          best = x
          idx = i
        }
      }
      i += 1
    }
    if (idx < 0) null else java.lang.Long.valueOf(idx)
  }

  case class ArgExtremum(child: Expression, smaller: Boolean)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    private lazy val et = child.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(input: Any): Any = {
      val r = argExtremumEval(input.asInstanceOf[ArrayData], smaller, et)
      if (r == null) null else r.longValue()
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val etRef = ctx.addReferenceObj("argExtEt", et,
          "org.apache.spark.sql.types.DataType")
        val r = ctx.freshName("argExt")
        s"""
          java.lang.Long $r =
            graft.functions.ReducerExprs.argExtremumEval($c, $smaller, $etRef);
          if ($r == null) { ${ev.isNull} = true; }
          else { ${ev.value} = $r.longValue(); }
        """
      })
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def argExtremum(c: Column, smaller: Boolean): Column =
    GraftBridge.column(ArgExtremum(GraftBridge.expression(c), smaller))
}
