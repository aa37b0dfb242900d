package graft.core

import org.apache.spark.sql.types.StructType

/** Byte-based broadcast gating (r12 verdict #7).
  *
  * The rank/link-predict family gates per-round broadcasts on a COUNTED
  * row threshold (5M rows). A row count is the wrong unit for what the
  * gate protects — driver and executor memory holding the built hash
  * relation — because 5M rows of (long, long) is ~160 MB framed while
  * 5M rows of a wide struct is gigabytes. This derives the row gate
  * from a byte budget and the frame's schema, so the decision scales
  * with what is actually shipped.
  *
  * The width model is deliberately simple and CONSERVATIVE for the
  * fixed-width frames the gates guard (all-long node/degree/rank
  * frames): Catalyst's `DataType.defaultSize` per column plus
  * [[perFieldOverheadBytes]] per column for UnsafeRow null bits /
  * offsets / object headers in the built relation, plus
  * [[perRowOverheadBytes]] per row. Variable-width columns use
  * defaultSize (20 B for strings) — callers broadcasting genuinely
  * fat variable-width payloads should keep their own contracts.
  */
object Broadcasts {

  val perRowOverheadBytes: Long = 16L
  val perFieldOverheadBytes: Long = 8L

  /** Default budget for one broadcast relation: comfortably inside
    * executor/driver memory at default cluster sizings (the guide's
    * "a few hundred MB is usually fine; multiple GB is asking for
    * driver OOMs" — one-eighth of the 512 MB danger zone), far below
    * Spark's 8 GB hard cap. */
  val defaultBudgetBytes: Long = 64L << 20

  /** Estimated in-memory bytes per row of `schema` in a built hash
    * relation. */
  def estRowBytes(schema: StructType): Long =
    perRowOverheadBytes +
      schema.fields.map(f =>
        f.dataType.defaultSize.toLong + perFieldOverheadBytes).sum

  /** The row-count gate equivalent to `budgetBytes` for `schema`:
    * broadcast while rows * estRowBytes <= budget. */
  def rowGate(schema: StructType, budgetBytes: Long = defaultBudgetBytes): Long =
    budgetBytes / estRowBytes(schema)

  /** True when `rows` rows of `schema` fit the byte budget. */
  def fits(rows: Long, schema: StructType,
      budgetBytes: Long = defaultBudgetBytes): Boolean =
    rows <= rowGate(schema, budgetBytes)
}
