package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins that the custom expressions' doGenCode paths (a) actually compile —
  * Spark silently falls back to interpreted eval on Janino errors, so a
  * green functional test alone can hide a broken codegen path — and (b)
  * produce bit-identical results to the interpreted eval.
  *
  * Run A: whole-stage off + NO_CODEGEN factory = fully interpreted.
  * Run B: whole-stage on + CODEGEN_ONLY + fallback=false = codegen or die.
  */
class CodegenPinSpec extends SparkSuite {
  import spark.implicits._
  import graft.functions._

  private def withConfs(confs: (String, String)*)(body: => Array[org.apache.spark.sql.Row]) = {
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("custom expression codegen compiles and matches interpreted eval") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog the quick",
        Seq(0.1f, 0.2f, -0.3f, 0.4f), Seq(1.0f, 0.0f, 1.0f, 0.0f)),
      (2L, "a a a b", Seq(0.0f, 0.0f, 0.0f, 0.0f), Seq(0.5f, 0.5f, 0.5f, 0.5f)),
      (3L, "", Seq(2.0f, -1.0f, 0.0f, 3.0f), Seq(0.0f, 1.0f, 0.0f, -1.0f)))
      .toDF("id", "text", "vec", "vec2")
    val toks = split($"text", " ")
    val sig = HashExprs.minHashSignature(HashExprs.wordNgrams(toks, 2), 16)
    val pqFlat = Array(0.1, 0.2, 0.9, 0.8, -0.5, 0.5, 0.3, -0.3)
    // tiny asof table: key 1 has states at ts 5 and 10, key 2 none before 0
    val asofRight = Seq((1L, 5L, 1.5), (1L, 10L, 2.5), (2L, 100L, 9.9))
      .toDF("k", "t", "v")
    val cols: Seq[Column] = Seq(
      AsofLookup.asofLookup(asofRight, "k", "t", "v")($"id", lit(7L)),
      HashExprs.wordNgrams(toks, 2),
      HashExprs.wordNgramsSeq(toks, 2),
      HashExprs.simHash48(toks),
      HashExprs.minHashSignaturePoly(HashExprs.wordNgrams(toks, 2), 8),
      HashExprs.polyHashFast($"text"),
      HashExprs.winnowFingerprint(toks, 2, 3),
      HashExprs.lshBandKeys(sig, 4, 4),
      CombinatoricsExprs.combinationsN(toks, 3),
      VectorExprs.hyperplaneSig($"vec", 4, 8),
      VectorExprs.cosineSim($"vec", $"vec2"),
      PqExprs.pqEncode($"vec", pqFlat, m = 2, ksub = 2, dsub = 2),
      PqExprs.pqTables($"vec", pqFlat, m = 2, ksub = 2, dsub = 2),
      PqExprs.dotNormLeft($"vec", $"vec2"),
      PqExprs.pqAdcScore(
        PqExprs.pqTables($"vec", pqFlat, m = 2, ksub = 2, dsub = 2),
        PqExprs.pqEncode($"vec2", pqFlat, m = 2, ksub = 2, dsub = 2),
        m = 2, ksub = 2),
      ReducerExprs.argExtremum($"vec", smaller = true),
      ReducerExprs.argExtremum($"vec", smaller = false),
      BpeExprs.bpeCount(toks, Seq(("t", "h"), ("th", "e"), ("q", "u"))),
      StringSimExprs.jaroWinklerSim($"text", reverse($"text")),
      StringSimExprs.jaroWinklerSim($"text", lit("the quick brown dog")),
      QuantileExprs.doubleSortableBits($"vec".getItem(2).cast("double")),
      QuantileExprs.doubleSortableBits(lit(Double.NaN)),
      QuantileExprs.doubleSortableBits(lit(-0.0)),
      QuantileExprs.sortableBucket(
        QuantileExprs.doubleSortableBits($"vec".getItem(0).cast("double")),
        Long.MinValue + 3, 52) // wraparound distance, unsigned shift
    ).zipWithIndex.map { case (c, i) => c.as(s"c$i") }

    val interpreted = withConfs(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      df.orderBy($"id").select(cols: _*).collect()
    }
    val generated = withConfs(
      "spark.sql.codegen.wholeStage" -> "true",
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY",
      "spark.sql.codegen.fallback" -> "false") {
      df.orderBy($"id").select(cols: _*).collect()
    }
    assert(interpreted.length == generated.length)
    interpreted.zip(generated).zipWithIndex.foreach { case ((a, b), r) =>
      assert(a == b, s"row $r: interpreted $a != generated $b")
    }
  }
}
