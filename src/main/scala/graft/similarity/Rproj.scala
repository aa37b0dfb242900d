package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection over an embedding column —
  * the cheap dimensionality-reduction step a 100 TB similarity pipeline
  * runs BEFORE clustering/LSH when d is large: k ≪ d sign projections
  * preserve pairwise distances within (1±ε) wp. 1−δ for
  * k = O(ε⁻² log(1/δ)) (Achlioptas 2001's ±1 database-friendly variant
  * — no Gaussians, just Rademacher signs, and the projection is exact
  * integer arithmetic end-to-end).
  *
  * Scale shape: the d×k sign matrix is generated DETERMINISTICALLY on
  * the driver from a splitmix64 stream (no RNG state, same seed → same
  * matrix on any driver) and ships as a few KB of array literals — the
  * broadcast-scalar pattern. Each row's k projections are zip_with/
  * aggregate HOFs inside whole-stage codegen: ZERO shuffle, no UDF, no
  * corpus-sized anything. Quantization q = floor(x·2^qBits) is one IEEE
  * multiply+floor (engine-exact), so projections are exact BIGINTs —
  * hash-replayable from the dumped sign matrix by any SQL engine.
  * Consumers divide by 2^qBits·√k if they need the distance-preserving
  * scale; the fixed-point report keeps the lanes exact instead.
  *
  * Overflow headroom: |proj| ≤ d · 2^(qBits+3) for |x| ≤ 8 — at d = 64,
  * qBits = 14 that is 2^23, nowhere near int64.
  */
object Rproj {

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Deterministic d×k Rademacher sign matrix: sign(i, j) = ±1 from the
    * parity of splitmix64(seed·2³² + i·k + j). */
  def signMatrix(d: Int, k: Int, seed: Long = 42L): Array[Array[Long]] = {
    require(d > 0 && k > 0, s"bad dims d=$d k=$k")
    Array.tabulate(d, k)((i, j) =>
      if ((splitmix64((seed << 32) + i.toLong * k + j) & 1L) == 0L) 1L else -1L)
  }

  /** Project each row's vector onto all k sign vectors: returns one row
    * per (input row, j) with the exact integer lane
    * proj_q = Σ_i floor(x_i·2^qBits) · sign(i, j). `keep` columns pass
    * through. Map-side only — the explode is k-wide, not corpus-wide. */
  def projectQ(df: DataFrame, vecCol: String, signs: Array[Array[Long]],
      qBits: Int, keep: Seq[String]): DataFrame = {
    require(qBits >= 1 && qBits <= 24, s"bad qBits=$qBits")
    require(signs.nonEmpty && signs.forall(_.length == signs(0).length),
      "projectQ: signs must be a non-empty rectangular d x k matrix")
    val d = signs.length
    val k = signs(0).length
    val scale = lit((1L << qBits).toDouble)
    // a row whose vector length differs from d would otherwise DEGRADE
    // silently: zip_with pads the short side with nulls and the sum
    // aggregate nulls the lane — a dimension mismatch must fail loudly,
    // not surface as missing lanes (the when/raise_error coerces: the
    // NullType else-branch widens to the array type). A NULL vector is
    // handled explicitly FIRST: it passes through as null lanes (the
    // missing-embedding convention every consumer already handles) —
    // routing it into the otherwise branch would fire raise_error with a
    // null-concat message, failing loudly but saying nothing.
    val qa = when(col(vecCol).isNull, lit(null))
      .when(size(col(vecCol)) === lit(d),
        transform(col(vecCol), x => floor(x.cast("double") * scale).cast("long")))
      .otherwise(raise_error(concat(
        lit(s"projectQ: vector dimension != $d (got "),
        size(col(vecCol)).cast("string"), lit(")"))))
    val lanes: Seq[Column] = (0 until k).map { j =>
      val sj = typedLit(signs.map(_(j)).toSeq)
      struct(lit(j).cast("int").as("j"),
        aggregate(zip_with(col("__qa"), sj, _ * _), lit(0L), _ + _).as("proj_q"))
    }
    df.withColumn("__qa", qa)
      .select(keep.map(col) :+ explode(array(lanes: _*)).as("t"): _*)
      .select(keep.map(col) :+ col("t.j").as("j") :+ col("t.proj_q").as("proj_q"): _*)
  }
}
