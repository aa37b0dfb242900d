package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.strings._

/** String-function wave (SURVEY §2.10, reference `lib/str.py` — the 43
  * Arrow-kernel wrappers). Driven over `part` (mixed-case via
  * name+brand+type concatenation). All functions are codegen'd Spark SQL
  * expressions — no UDFs anywhere.
  */
object StringQueries {
  type Q = (SparkSession, String) => DataFrame

  /** mixed-case probe string, e.g. "red widget Brand#17 ECONOMY" */
  private def st: Column =
    concat_ws(" ", col("p_name"), col("p_brand"), col("p_type"))

  private def base(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).withColumn("s", st)

  val queries: Map[String, Q] = Map(
    // capitalize/title/swapcase/lower/upper/reverse/repeat/length
    "str_case" -> { (s, dir) =>
      base(s, dir).select(col("p_partkey"),
        upperS(col("s")).as("up"),
        lowerS(col("s")).as("lo"),
        capitalize(col("s")).as("cap"),
        title(col("s")).as("ti"),
        swapcase(col("s")).as("sw"),
        reverseS(col("s")).as("rev"),
        repeatS(col("p_name"), 2).as("rep"),
        lengthS(col("s")).cast("long").as("len"))
    },

    // lpad/rpad/center/trim family (charset variants)
    "str_pad_trim" -> { (s, dir) =>
      base(s, dir).select(col("p_partkey"),
        lpadS(col("p_name"), 20, "*").as("lp"),
        rpadS(col("p_name"), 20, ".").as("rp"),
        center(col("p_name"), 21, "_").as("ce"),
        trimChars(lpadS(col("p_name"), 20, "*"), "*").as("tr"),
        ltrimWhitespace(concat(lit("  "), col("p_name"))).as("lt"),
        rtrimWhitespace(concat(col("p_name"), lit("  "))).as("rt"))
    },

    // starts/ends/contains/find/count/like/rlike/is_in/index_in
    "str_search" -> { (s, dir) =>
      base(s, dir).select(col("p_partkey"),
        startsWith(col("p_name"), "red").as("sw"),
        endsWith(col("p_name"), "bolt").as("ew"),
        matchSubstring(col("p_name"), "id").as("ct"),
        findSubstring(col("p_name"), "e").cast("long").as("fs"),
        countSubstring(col("s"), "e").cast("long").as("cs"),
        matchLike(col("p_name"), "%l_%").as("lk"),
        matchSubstringRegex(col("p_name"), "^[a-z]+ [a-z]+$").as("re"),
        isInSet(col("p_type"), Seq("ECONOMY", "PROMO")).as("isin"),
        indexIn(col("p_type"), Seq("STANDARD", "ECONOMY", "SMALL"))
          .cast("long").as("idx"))
    },

    // regexp extract / replace / count + split / join
    "str_regex" -> { (s, dir) =>
      base(s, dir).select(col("p_partkey"),
        extractRegex(col("p_brand"), "Brand#(\\d+)", 1).as("brandno"),
        replaceSubstringRegex(col("p_name"), "[aeiou]", "_").as("novowel"),
        countSubstringRegex(col("s"), "[aeiou]").cast("long").as("nvowel"),
        size(splitWhitespace(col("s"))).cast("long").as("ntok"),
        joinStrings(splitWhitespace(col("s")), "-").as("joined"),
        joinElementWise("|", col("p_name"), col("p_type")).as("zipped"))
    },

    // slice / replace_slice / replace_substring
    "str_slice" -> { (s, dir) =>
      base(s, dir).select(col("p_partkey"),
        sliceString(col("p_name"), 0, 3).as("pre"),
        sliceString(col("p_name"), 2, 6).as("mid"),
        replaceSlice(col("p_name"), 1, 4, "XX").as("ovl"),
        replaceSubstring(col("p_name"), " ", "_").as("und"))
    },

    // is_* classifiers over the first token + numeric probes
    "str_classify" -> { (s, dir) =>
      val tok = element_at(splitWhitespace(col("s")), 1)
      val keystr = col("p_partkey").cast("string")
      base(s, dir).select(col("p_partkey"),
        isAlpha(tok).as("alpha"),
        isAlnum(col("p_brand")).as("alnum_brand"),
        isAscii(col("s")).as("ascii"),
        isDigit(keystr).as("digit"),
        isNumeric(keystr).as("num"),
        isLower(tok).as("lo"),
        isUpper(col("p_type")).as("up"),
        isSpace(lit(" ")).as("sp"),
        isTitle(title(col("p_name"))).as("ti"))
    },

    // strings_astype (a TODO stub in the reference itself,
    // structure.py:857-865 — implemented here with its promised
    // semantics): parse ragged string arrays to numbers, malformed
    // elements nulling out (try_cast), whitespace trimmed. The battery
    // parses a constructed per-doc array covering the paths: a real
    // number rendered from data, junk, padded, empty, decimals
    "str_astype" -> { (s, dir) =>
      val vs = graft.strings.stringsAstype(array(
        col("n_chars").cast("string"), lit("x7"), lit(" 42 "),
        lit(""), lit("1.5"), lit("-0.25")), "double")
      Tables.documents(s, dir).select(col("doc_id"), vs.as("vs"))
        .select(col("doc_id"),
          col("vs").getItem(0).as("v0"),
          col("vs").getItem(2).as("v42"),
          size(filter(col("vs"), x => x.isNotNull)).cast("long").as("n_ok"))
    },

    // fuzzy record linkage (graft.dedup.blockedPairs +
    // graft.functions.StringSimExprs.jaroWinklerSim): brand-blocked
    // candidate pairs of part names, Jaro-Winkler >= 0.9 survivors. The
    // kernel is a codegen'd Catalyst expression with the STANDARD
    // semantics (0.7 boost threshold, p=0.1, l<=4) DuckDB implements
    // natively — the oracle grades the kernel itself, pair for pair, at
    // 6 decimals. Blocking keeps the join equi-keyed (never all-pairs
    // across blocks); the 50k block cap is the counted guard for the
    // fixed-domain-key quadratic (r11 verdict Next #1 — ~25 brands
    // means block size grows linearly with the corpus; the cap is in
    // the GRADED plan and in the oracle's HAVING gate, so the refusal
    // semantics are themselves oracle-checked; no tested sf reaches it:
    // sf5 = 40k rows/brand. StringsSpec pins the dropping path).
    "str_linkage" -> { (s, dir) =>
      import graft.functions.StringSimExprs.jaroWinklerSim
      val p = Tables.part(s, dir)
        .select(col("p_partkey").as("k"), col("p_name").as("nm"),
          col("p_brand").as("b"))
      graft.dedup.blockedPairs(p, col("b"), "k", blockCap = 50000)
        .select(col("a_k").as("k1"), col("b_k").as("k2"),
          jaroWinklerSim(col("a_nm"), col("b_nm")).as("jw"))
        .filter(col("jw") >= 0.9)
        .select(col("k1"), col("k2"), round(col("jw"), 6).as("jw"))
    },

    // the second blocking strategy: sorted-neighborhood linkage
    // (graft.dedup.sortedNeighborhoodPairs, Hernández–Stolfo) — rank by
    // name, candidates within rank distance 10, JW >= 0.9 verify.
    // Catches cross-BLOCK near-names brand-blocking can't see, with
    // candidate volume LINEAR in the corpus (<= w per row); the exact
    // global ranks come from the two-level range-partitioned scan, no
    // single-task sort. Output pins both pair set and ranks.
    "str_linkage_sn" -> { (s, dir) =>
      import graft.functions.StringSimExprs.jaroWinklerSim
      val p = Tables.part(s, dir)
        .select(col("p_partkey").as("k"), col("p_name").as("nm"))
      val cands = graft.dedup.sortedNeighborhoodPairs(p, col("nm"), "k", 10)
      cands
        .join(p.select(col("k").as("id1"), col("nm").as("n1")), "id1")
        .join(p.select(col("k").as("id2"), col("nm").as("n2")), "id2")
        .select(col("id1"), col("id2"), col("rn1"), col("rn2"),
          jaroWinklerSim(col("n1"), col("n2")).as("jw"))
        .filter(col("jw") >= 0.9)
        .select(col("id1"), col("id2"), col("rn1"), col("rn2"),
          round(col("jw"), 6).as("jw"))
    },

    // the COMPLETE entity-resolution pipeline as one graded query:
    // sorted-neighborhood blocking -> Jaro-Winkler matching (>= 0.92)
    // -> connected-components transitive closure. Matching is not
    // transitive ("ab"~"ac"~"ad" without ab~ad), so real entity
    // resolution always ends in the closure step; the oracle replays
    // all three stages, WITH RECURSIVE reach for the closure
    "str_entities" -> { (s, dir) =>
      import graft.functions.StringSimExprs.jaroWinklerSim
      val p = Tables.part(s, dir)
        .select(col("p_partkey").as("k"), col("p_name").as("nm"))
      val edges = graft.dedup
        .sortedNeighborhoodPairs(p, col("nm"), "k", 10)
        .join(p.select(col("k").as("id1"), col("nm").as("n1")), "id1")
        .join(p.select(col("k").as("id2"), col("nm").as("n2")), "id2")
        .filter(jaroWinklerSim(col("n1"), col("n2")) >= 0.92)
        .select(col("id1"), col("id2"))
      graft.dedup.connectedComponents(edges, "id1", "id2")
    },

    // to_categorical (reference str.py:867): dictionary-encode two string
    // columns; codes are dense ranks in sorted value order, so the oracle
    // reproduces them with window dense_rank over the raw table
    "str_categorical" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val (langCoded, _) = toCategorical(docs, "lang", "lang_code")
      val (bothCoded, _) = toCategorical(langCoded, "source", "source_code")
      bothCoded.select(col("doc_id"), col("lang"), col("lang_code"),
        col("source"), col("source_code"))
    },

    // unicode NFC normalization (graft.functions.UnicodeExprs — the Arrow
    // utf8_normalize analog, codegen'd UAX #15): x carries two DECOMPOSED
    // e+U+0301 pairs plus one composed U+00E9, so NFC must compose (char
    // count drops by 2) while y is composed-only and passes the
    // isNormalized fast path untouched. Both engines implement UAX #15,
    // so the normalized STRINGS hash-compare exactly
    "str_nfc" -> { (s, dir) =>
      val x = concat(col("text"), lit("e\u0301e\u0301"), lit("\u00e9"))
      val y = concat(col("text"), lit("\u00e9"))
      Tables.documents(s, dir).select(col("doc_id"),
        normalizeUnicode(x).as("nfc"),
        length(x).cast("long").as("n_raw"),
        length(normalizeUnicode(x)).cast("long").as("n_nfc"),
        (normalizeUnicode(x) === x).as("was_nfc"),
        (normalizeUnicode(y) === y).as("y_was_nfc"))
    })

  val oracle: Map[String, String] = Map(
    // DuckDB's native jaro_winkler_similarity IS the reference
    // implementation of the kernel under test; the HAVING gate replays
    // blockedPairs' 50k block cap so the refusal semantics are graded,
    // not just the happy path
    "str_linkage" ->
      """WITH kept AS (SELECT p_brand FROM part GROUP BY 1 HAVING count(*) <= 50000) SELECT a.p_partkey AS k1, c.p_partkey AS k2, round(jaro_winkler_similarity(a.p_name, c.p_name), 6) AS jw FROM part a JOIN part c ON a.p_brand = c.p_brand AND a.p_partkey < c.p_partkey JOIN kept kb ON kb.p_brand = a.p_brand WHERE jaro_winkler_similarity(a.p_name, c.p_name) >= 0.9""",
    // blocking + matching + WITH RECURSIVE min-label closure (the
    // d_clusters replay pattern) over the same rank-window candidates
    "str_entities" ->
      """WITH RECURSIVE r AS (SELECT p_partkey AS id, p_name AS nm, row_number() OVER (ORDER BY p_name, p_partkey) AS rn FROM part), e AS (SELECT a.id AS id1, c.id AS id2 FROM r a JOIN r c ON c.rn > a.rn AND c.rn - a.rn <= 10 WHERE jaro_winkler_similarity(a.nm, c.nm) >= 0.92), sym AS (SELECT id1 AS a, id2 AS b FROM e UNION SELECT id2, id1 FROM e), reach(a, b) AS (SELECT a, a FROM (SELECT DISTINCT a FROM sym) n UNION SELECT rr.a, s.b FROM reach rr JOIN sym s ON rr.b = s.a) SELECT a AS id, min(b) AS rep FROM reach GROUP BY a""",
    // same global (name, key) ranks via one window; rank distance <= 10
    "str_linkage_sn" ->
      """WITH r AS (SELECT p_partkey AS id, p_name AS nm, row_number() OVER (ORDER BY p_name, p_partkey) AS rn FROM part) SELECT a.id AS id1, c.id AS id2, a.rn AS rn1, c.rn AS rn2, round(jaro_winkler_similarity(a.nm, c.nm), 6) AS jw FROM r a JOIN r c ON c.rn > a.rn AND c.rn - a.rn <= 10 WHERE jaro_winkler_similarity(a.nm, c.nm) >= 0.9""",
    "str_astype" ->
      """WITH v AS (SELECT doc_id, list_transform([CAST(n_chars AS VARCHAR), 'x7', ' 42 ', '', '1.5', '-0.25'], x -> TRY_CAST(trim(x) AS DOUBLE)) AS vs FROM documents) SELECT doc_id, vs[1] AS v0, vs[3] AS v42, CAST(len(list_filter(vs, x -> x IS NOT NULL)) AS BIGINT) AS n_ok FROM v""",
    "str_categorical" ->
      """SELECT doc_id, lang, dense_rank() OVER (ORDER BY lang) - 1 AS lang_code, source, dense_rank() OVER (ORDER BY source) - 1 AS source_code FROM documents""",
    // chr(769) = U+0301 combining acute, chr(233) = composed U+00E9;
    // both engines implement UAX #15 so the normalized strings match
    "str_nfc" ->
      """SELECT doc_id, nfc_normalize(x) AS nfc, length(x) AS n_raw, length(nfc_normalize(x)) AS n_nfc, (nfc_normalize(x) = x) AS was_nfc, (nfc_normalize(y) = y) AS y_was_nfc FROM (SELECT doc_id, text || 'e' || chr(769) || 'e' || chr(769) || chr(233) AS x, text || chr(233) AS y FROM documents) t""",
    "str_case" ->
      """SELECT p_partkey, upper(s) AS up, lower(s) AS lo, upper(s[1])||lower(s[2:]) AS cap, array_to_string(list_transform(string_split(lower(s), ' '), w -> upper(w[1])||lower(w[2:])), ' ') AS ti, array_to_string(list_transform(string_split_regex(s, ''), c -> CASE WHEN c = upper(c) AND c <> lower(c) THEN lower(c) WHEN c = lower(c) AND c <> upper(c) THEN upper(c) ELSE c END), '') AS sw, reverse(s) AS rev, repeat(p_name, 2) AS rep, length(s) AS len FROM (SELECT p_partkey, p_name, p_name || ' ' || p_brand || ' ' || p_type AS s FROM part) t""",
    "str_pad_trim" ->
      """SELECT p_partkey, lpad(p_name, 20, '*') AS lp, rpad(p_name, 20, '.') AS rp, rpad(lpad(p_name, CAST(length(p_name) + greatest(21 - length(p_name), 0)//2 AS INT), '_'), 21, '_') AS ce, trim(lpad(p_name, 20, '*'), '*') AS tr, ltrim('  ' || p_name) AS lt, rtrim(p_name || '  ') AS rt FROM part""",
    "str_search" ->
      """SELECT p_partkey, starts_with(p_name, 'red') AS sw, suffix(p_name, 'bolt') AS ew, contains(p_name, 'id') AS ct, CAST(strpos(p_name, 'e') - 1 AS BIGINT) AS fs, CAST((length(s) - length(replace(s, 'e', ''))) AS BIGINT) AS cs, p_name LIKE '%l_%' AS lk, regexp_matches(p_name, '^[a-z]+ [a-z]+$') AS re, p_type IN ('ECONOMY','PROMO') AS isin, CAST(nullif(list_position(['STANDARD','ECONOMY','SMALL'], p_type), 0) - 1 AS BIGINT) AS idx FROM (SELECT p_partkey, p_name, p_type, p_name || ' ' || p_brand || ' ' || p_type AS s FROM part) t""",
    "str_regex" ->
      """SELECT p_partkey, regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brandno, regexp_replace(p_name, '[aeiou]', '_', 'g') AS novowel, CAST(len(regexp_extract_all(s, '[aeiou]')) AS BIGINT) AS nvowel, CAST(len(string_split_regex(trim(s), '\s+')) AS BIGINT) AS ntok, array_to_string(string_split_regex(trim(s), '\s+'), '-') AS joined, p_name || '|' || p_type AS zipped FROM (SELECT p_partkey, p_name, p_brand, p_type, p_name || ' ' || p_brand || ' ' || p_type AS s FROM part) t""",
    "str_slice" ->
      """SELECT p_partkey, p_name[1:3] AS pre, p_name[3:6] AS mid, p_name[1:1] || 'XX' || p_name[5:] AS ovl, replace(p_name, ' ', '_') AS und FROM part""",
    "str_classify" ->
      """SELECT p_partkey, regexp_matches(tok, '^\p{L}+$') AS alpha, regexp_matches(p_brand, '^[\p{L}\p{N}]+$') AS alnum_brand, regexp_matches(s, '^[\x00-\x7F]+$') AS ascii, regexp_matches(keystr, '^\p{Nd}+$') AS digit, regexp_matches(keystr, '^\p{N}+$') AS num, regexp_matches(tok, '\p{Ll}') AND NOT regexp_matches(tok, '\p{Lu}') AS lo, regexp_matches(p_type, '\p{Lu}') AND NOT regexp_matches(p_type, '\p{Ll}') AS up, TRUE AS sp, (ti = array_to_string(list_transform(string_split(lower(ti), ' '), w -> upper(w[1])||lower(w[2:])), ' ')) AND regexp_matches(ti, '\p{L}') AS ti FROM (SELECT p_partkey, p_brand, p_type, p_name || ' ' || p_brand || ' ' || p_type AS s, string_split_regex(trim(p_name || ' ' || p_brand || ' ' || p_type), '\s+')[1] AS tok, CAST(p_partkey AS VARCHAR) AS keystr, array_to_string(list_transform(string_split(lower(p_name), ' '), w -> upper(w[1])||lower(w[2:])), ' ') AS ti FROM part) t""")
}
