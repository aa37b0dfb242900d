package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, embedding-cosine. Designed for the 100 TB
  * regime:
  *
  *  - candidate generation is always an **inverted-index equi-join**
  *    (explode shingles/bands/buckets, shuffle on the key, join) — never an
  *    O(n^2) cross join;
  *  - signatures (minhash, simhash) are computed map-side in one codegen'd
  *    HOF pass over the token array, so the shuffle carries only
  *    (key, doc_id) pairs;
  *  - all hashes are deterministic integer arithmetic (no JVM-specific
  *    hashing), so results are reproducible across engines and runs.
  *
  * At real scale add a document-frequency cap on shingles before the join
  * (drop shingles appearing in >k docs — they generate quadratic candidate
  * blowup and carry no signal).
  */
package object dedup {

  /** Whitespace tokens. */
  private def toks(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** Distinct word n-gram shingles of a text column (n>=1), as strings. */
  def wordShingles(c: Column, n: Int): Column = {
    val t = toks(c)
    if (n == 1) array_distinct(t)
    else array_distinct(
      filter(
        transform(t, (_, i) =>
          when(i <= size(t) - n,
            concat_ws(" ", (0 until n).map(k => get(t, i + k)): _*))),
        x => x.isNotNull))
  }

  /** Deterministic polynomial hash of a string (base 131, mod 1e9+7).
    * The modulus keeps every intermediate below 2^38, so the arithmetic is
    * overflow-free in any signed-64 engine (DuckDB raises on BIGINT
    * overflow; Java would silently wrap). */
  def polyHash(c: Column): Column =
    aggregate(split(c, ""), lit(0L),
      (acc, ch) => (acc * 131 + ascii(ch)) % 1000000007L)

  /** MinHash signature: k permutations h_i(x) = (a_i*x + b_i) mod p over the
    * shingle base-hashes, min per permutation. One map-side HOF pass; the
    * signature is an array<long> of length k. */
  def minHashSignature(shingles: Column, k: Int, seed: Long = 42L): Column = {
    val p = 2147483647L // 2^31-1 Mersenne prime; a*h stays under 2^62
    val rnd = new scala.util.Random(seed)
    val coefs = Seq.fill(k)((math.abs(rnd.nextLong()) % (p - 1) + 1,
      math.abs(rnd.nextLong()) % p))
    val hashes = transform(shingles, s => polyHash(s))
    array(coefs.map { case (a, b) =>
      array_min(transform(hashes, h =>
        pmod(h * lit(a) + lit(b), lit(p))))
    }: _*)
  }

  /** Band keys for LSH: split the signature into `bands` bands of `rows`
    * values, hash each band — equal band key => candidate pair. Returns
    * array<struct<band:int, key:long>> for exploding. */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        aggregate(slice(sig, b * rows + 1, rows), lit(0L),
          (acc, h) => (acc * 131 + h) % 1000000007L).as("key"))
    }: _*)

  /** SimHash (48-bit, safe in a signed 64-bit lane): per-token deterministic
    * hash expanded via a Knuth multiply, each bit votes +-1 weighted by
    * occurrence; the sign vector packs into a long. Entirely map-side. */
  def simHash48(c: Column): Column = {
    val t = toks(c)
    val th = transform(t, s =>
      pmod(polyHash(s) * 2654435761L, lit(281474976710656L))) // mod 2^48
    val votes = aggregate(
      th,
      array_repeat(lit(0), 48),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(47)),
        (v, j) => v + when(call_function("shiftright", h, j)
          .bitwiseAND(1) === 1, 1).otherwise(-1)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(47)),
        (v, j) => when(v > 0, call_function("shiftleft", lit(1L), j))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two packed signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact n-gram Jaccard near-duplicate pairs via inverted-index join.
    * Returns (id1, id2, inter, uni) with 2*inter >= uni (jaccard >= 0.5
    * as an exact integer predicate — no float rounding in the cut).
    *
    * df must have columns (idCol: long, textCol: string). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, minJaccardPct: Int = 50): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      wordShingles(col(textCol), n).as("sh"))
      .withColumn("nsh", size(col("sh")))
    val inv = sh.select(col("id"), col("nsh"), explode(col("sh")).as("g"))
    val pairs = inv.as("a").join(inv.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.nsh").as("n1"), col("b.nsh").as("n2"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .withColumn("uni", col("n1") + col("n2") - col("inter"))
      .filter(col("inter") * 100 >= col("uni") * minJaccardPct)
      .select(col("id1"), col("id2"), col("inter"), col("uni"))
  }

  /** Exact dedup: group identical normalized texts, keep the smallest id.
    * The groupBy key is a hash, so the shuffle carries (hash, id) only. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n"))

  /** MinHash-LSH candidate pairs, verified with exact Jaccard on the
    * signatures (estimate = matching minhash coordinates / k). */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, k: Int = 32, bands: Int = 8): DataFrame = {
    val rows = k / bands
    val sigs = df.select(col(idCol).as("id"),
        minHashSignature(wordShingles(col(textCol), n), k).as("sig"))
    val buckets = sigs.select(col("id"), col("sig"),
        explode(lshBandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y),
          e => e)).cast("double") / k).as("est_jaccard"))
      .distinct()
  }
}
