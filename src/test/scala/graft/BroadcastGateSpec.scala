package graft

import org.apache.spark.sql.types.{LongType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Unit pin for the byte-based broadcast gate (r12 verdict #7): the
  * decision function's constants are derived from schema width and the
  * 64 MB budget, and stay where the rank/link-predict/quantile gates
  * expect them. */
class BroadcastGateSpec extends AnyFunSuite {
  import graft.core.Broadcasts

  private val twoLongs =
    new StructType().add("k", LongType).add("v", LongType)

  test("row width model: per-row + per-field overhead over defaultSize") {
    // (long, long): 16 row overhead + 2 * (8 data + 8 field overhead)
    assert(Broadcasts.estRowBytes(twoLongs) === 48L)
  }

  test("row gate: 64 MB budget over a (long, long) frame is ~1.4M rows") {
    val gate = Broadcasts.rowGate(twoLongs)
    assert(gate === (64L << 20) / 48L)
    assert(gate > 1000000L && gate < 2000000L)
    assert(Broadcasts.fits(1000000L, twoLongs))
    assert(!Broadcasts.fits(2000000L, twoLongs))
  }

  test("gate binds BELOW the legacy 5M row threshold for node frames") {
    // the point of verdict #7: 5M (long, long) rows would be ~240 MB
    // built — the byte budget must refuse that long before 5M
    assert(Broadcasts.rowGate(twoLongs) < 5000000L)
  }
}
