package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup._

/** Dedup wave: exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding
  * cosine. MinHash-LSH is approximate-by-construction, so it gets a
  * rows-only driver check (no oracle) plus a ScalaTest recall check against
  * the exact pairs; everything else is oracle-checked.
  */
object DedupQueries {
  type Q = (SparkSession, String) => DataFrame

  /** documents unioned with a re-keyed copy of itself: a corpus where every
    * text appears exactly twice — the exact-dedup fixture. */
  private def dupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.unionByName(d.withColumn("doc_id", col("doc_id") + 100000))
  }

  val queries: Map[String, Q] = Map(
    // exact dedup over an actually-duplicated corpus
    "d_exact" -> { (s, dir) =>
      exactDedup(dupCorpus(s, dir), "doc_id", "text")
    },

    // exact word-bigram Jaccard >= 0.5 near-dup pairs (inverted-index join;
    // integer intersection/union — no float in the cut)
    "d_ngram" -> { (s, dir) =>
      ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 2, minJaccardPct = 50)
    },
    // asymmetric containment pairs (dedup.ngramContainmentPairs):
    // |src ∩ dst| / |src| >= 80% — catches a short doc quoted inside a
    // long one, which the symmetric Jaccard threshold misses
    "d_containment" -> { (s, dir) =>
      ngramContainmentPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 2, minContainPct = 80)
    },

    // edit-distance near-dups (dedup.levenshteinPairs): 40-char prefixes,
    // distance <= 12. Blocking on (lang, first 2 chars) is the recall/cost
    // lever: lang alone means ~n²/langs DP pairs (15s at sf0.1); the
    // 2-char sub-block cuts that ~25x and keeps 96% of true pairs (docs
    // whose edits start at char 1 are the loss) — the caller picks the
    // granularity, the oracle mirrors it
    "d_lev" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .withColumn("lv_blk", concat(col("lang"), lit("|"), substring(col("text"), 1, 2)))
      levenshteinPairs(docs, "doc_id", "text",
        blockCol = "lv_blk", maxDist = 12, prefixLen = 40)
    },

    // train/eval contamination scan (dedup.crossContamination): even
    // doc_ids play the training corpus, odd the eval set; exact bigram
    // Jaccard >= 0.5 cross pairs only
    "d_contam" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      crossContamination(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", n = 2, minJaccardPct = 50)
    },

    // MinHash(32) + LSH(8 bands x 4 rows) candidates on the production
    // xxh64 base. The base hash itself is not SQL-recomputable, but
    // everything downstream of the signatures is deterministic — so the
    // oracle replays the WHOLE band/candidate/verify pipeline in DuckDB
    // over the Spark-dumped signatures (the `aux_minhash_sigs` artifact;
    // __OUTDIR__ resolved by Verify). The signature primitive is covered
    // separately: d_minhash/d_mlsh_poly hash-match the polyHash twin
    // lane-for-lane, and ScalaTest pins xxh64 codegen == interpreted plus
    // recall-1.0 vs the exact pairs.
    "d_minhash_lsh" -> { (s, dir) =>
      minhashLshPairs(Tables.documents(s, dir), "doc_id", "text")
        .filter(col("est_jaccard") >= 0.5)
        .select(col("id1"), col("id2"))
    },

    // graded quality measurement of the PRODUCTION xxh64 LSH pipeline:
    // precision/recall of the banded+verified pair set against the EXACT
    // bigram-Jaccard >= 0.5 ground truth (d_ngram's operator). Both legs
    // replay in DuckDB — the truth exactly, the LSH leg structurally over
    // the dumped signatures — so the quality NUMBERS are hash-graded,
    // complementing the ScalaTest recall bounds
    "d_lsh_quality" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      // BOTH legs are consumed twice (their count aggregate + the TP
      // join), and both end in aggregates whose upstream re-runs per
      // consumer — pin the pair-sized outputs once (the q_ppr finding;
      // r13): the n-gram truth pipeline and the LSH pipeline each run
      // ONCE instead of twice, for the price of two pair-list writes
      val truth = ngramJaccardPairs(docs, "doc_id", "text",
        n = 2, minJaccardPct = 50).select(col("id1"), col("id2"))
        .localCheckpoint()
      val pred = minhashLshPairs(docs, "doc_id", "text")
        .filter(col("est_jaccard") >= 0.5)
        .select(col("id1").as("p1"), col("id2").as("p2"))
        .localCheckpoint()
      val tp = pred.join(truth,
        col("p1") === col("id1") && col("p2") === col("id2"))
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(pred.agg(count(lit(1)).as("n_pred")))
        .crossJoin(tp.agg(count(lit(1)).as("n_tp")))
        .select(col("n_truth"), col("n_pred"), col("n_tp"),
          expr("CASE WHEN n_pred = 0 THEN 0 ELSE (n_tp * 10000) DIV n_pred END")
            .as("precision_bp"),
          expr("CASE WHEN n_truth = 0 THEN 0 ELSE (n_tp * 10000) DIV n_truth END")
            .as("recall_bp"))
    },

    // incremental ingest face (graft.dedup.minhashLshPairsIncremental):
    // odd-id docs arrive as the NEW batch, even-id docs are the existing
    // corpus with PERSISTED signatures — the delta probes the store's
    // buckets, seen-seen pairs never form. Oracle = the full-pipeline
    // replay minus both-even pairs.
    "d_incremental" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val seen = minhashSignatures(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      val fresh = minhashSignatures(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
      minhashLshPairsIncremental(fresh, seen)
        .filter(col("est_jaccard") >= 0.5)
        .select(col("id1"), col("id2"))
    },

    // MinHash signatures with the polyHash base (k=8): every lane exactly
    // reproduced by the oracle from the same embedded (a_i, b_i) constants —
    // the hash-matched face of the minhash primitive (the xxh64 production
    // form is rows-only-checked via d_minhash_lsh + recall tests)
    "d_minhash" -> { (s, dir) =>
      val sig = graft.functions.HashExprs.minHashSignaturePoly(
        wordShingles(col("text"), 2), k = 8)
      Tables.documents(s, dir)
        .select(col("doc_id") +: (0 until 8).map(j =>
          sig.getItem(j).as(s"m$j")): _*)
    },

    // the FULL MinHash-LSH pipeline on the polyHash base (k=8, 4 bands x
    // 2 rows): signatures, band keys, candidate self-join, lane-match
    // verification — every stage reproduced exactly by the SQL oracle
    // (the xxh64 production form stays rows-only as d_minhash_lsh)
    "d_mlsh_poly" -> { (s, dir) =>
      minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
          n = 2, k = 8, bands = 4, polyBase = true)
        .filter(col("est_jaccard") >= 0.5)
        .select(col("id1"), col("id2"), col("est_jaccard"))
    },

    // SemDeDup-style semantic dedup over the embeddings table: two
    // k-means rounds cluster the space, then within-cluster cosine >= 0.35
    // drops the higher id of each near-dup pair. Learned-cluster blocking
    // is d_embed's scale path (label blocks grow with the corpus; sqrt(N)
    // cells hold the pair term at ~N^1.5). Fully replayed in DuckDB:
    // training rounds, assignment, pairs and keep flags.
    "d_semdedup" -> { (s, dir) =>
      semanticDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
        minCosine = 0.35)
    },

    // SimHash-48 signatures (deterministic integer arithmetic => oracled)
    "d_simhash" -> { (s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        simHash48(col("text")).as("simhash"))
    },

    // SimHash near-dup pairs at hamming <= 6, label-blocked by lang —
    // through the ADAPTIVE plan chooser: one cheap max-block-size probe
    // picks the blocked all-pairs compare below the measured ~10^5
    // docs/block crossover (3x faster there — banding pays explode +
    // distinct + two sig joins) and the banded (Manku pigeonhole) index
    // at or above it, where |block|² is dead (one language at web scale
    // is a billions-row block). Identical output either way
    // (equivalence-tested in DedupSimilaritySpec); the probe-driven
    // choice is pinned on BOTH sides of the threshold in PlanQualitySpec.
    "d_simhash_pairs" -> { (s, dir) =>
      val sigs = Tables.documents(s, dir).select(col("doc_id"),
        col("lang"), simHash48(col("text")).as("sh"))
      simhashPairsAdaptive(sigs, "doc_id", "sh", maxHamming = 6,
        blockCol = Some("lang"))
    },

    // connected components over the exact n-gram near-dup edges: pairwise
    // matches -> dedup clusters (id, rep = min id of component)
    "d_clusters" -> { (s, dir) =>
      val edges = ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 2, minJaccardPct = 50)
      connectedComponents(edges, "id1", "id2")
    },

    // drop near-duplicates: corpus size after keeping one representative
    // per cluster
    "d_dropdups" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val edges = ngramJaccardPairs(docs, "doc_id", "text", 2, 50)
      dropNearDuplicates(docs, "doc_id", edges)
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("sum_ids"))
    },

    // quality-aware retention: same clusters as d_dropdups, but keep the
    // LONGEST member (n_chars desc, min id ties) instead of the min-id
    // representative — the kept character mass must dominate d_dropdups'
    "d_keepbest" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val edges = ngramJaccardPairs(docs, "doc_id", "text", 2, 50)
      keepBestPerCluster(docs, "doc_id", "n_chars", edges)
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("sum_ids"),
          sum(col("n_chars")).as("sum_chars"))
    },

    // the full training-data dedup pipeline composed end-to-end:
    // length filter -> exact dedup (keep min id per identical text) ->
    // near-dup clustering on the survivors -> keep representatives
    "d_pipeline" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(length(col("text")) >= 150)
      // internal dedup key only (never output): xxhash64 groups identically
      // to the oracle's md5 grouping as long as both are injective on the
      // corpus, and shuffles 8 bytes instead of a 32-char hex string
      val keepers = docs.groupBy(xxhash64(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
      // Stage materialization between pipeline phases — to PARQUET, not
      // localCheckpoint: the shingle fan-out inside ngramJaccardPairs
      // (index side + nsh broadcast side) and the left-anti in
      // dropNearDuplicates would otherwise each re-run this filter ->
      // hash-groupBy -> join upstream (measured 23x on a 10x corpus in
      // the sf1 soak: 57 s vs 31 s for the same pair+CC work over MORE
      // docs in d_dropdups). Checkpointing fixes the recompute but yields
      // an ExistingRDD with no stats, so the downstream index self-join
      // degrades from the stats-driven broadcast join to sort-merge
      // (measured 2-3x on the pair stream); a parquet round-trip restores
      // scan statistics AND is the honest production shape. stageParquet
      // stages at a per-invocation unique path (concurrent sessions / CI
      // forks never clobber each other).
      val surv = graft.io.GraftIO.stageParquet(
        docs.join(keepers, "doc_id"), "pipeline_surv")
      val edges = ngramJaccardPairs(surv, "doc_id", "text", 2, 50)
      dropNearDuplicates(surv, "doc_id", edges)
        .agg(count(lit(1)).as("n_final"), sum(col("doc_id")).as("id_sum"))
    },

    // embedding-cosine near-dup pairs, blocked by label
    "d_embed" -> { (s, dir) =>
      graft.similarity.cosineNearDupPairs(
        Tables.embeddings(s, dir), "vec_id", "embedding", "label", 0.35)
        .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos"))
    },

    // exact substring-span removal (dedup-by-span, graft.text.dedupSpans):
    // every 5-token window occurring >= 2 times corpus-wide is removed from
    // every document; per-doc survivor counts plus an md5 of the rebuilt
    // text prove the reconstruction byte-exact against the oracle
    "d_spanrm" -> { (s, dir) =>
      graft.text.dedupSpans(Tables.documents(s, dir), "doc_id", "text", w = 5)
        .select(col("doc_id"), col("n_toks"), col("n_kept"),
          md5(col("kept_text")).as("kept_md5"))
    },

    // sentence-level keep-first dedup (graft.text.dedupSentences): every
    // sentence occurring >= 2 times corpus-wide survives only at its first
    // (doc, position); md5 of the survivor list proves order + content
    "d_sentdup" -> { (s, dir) =>
      graft.text.dedupSentences(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_sent"), col("n_kept"),
          md5(array_join(col("kept_sents"), " | ")).as("kept_md5"))
    },

    // per-doc duplicated-shingle ratio (corpus boilerplate metric): docs in
    // the planted near-dup clusters score high, unique docs low — summarized
    // per decile so the output is small while every doc's ratio contributes
    "d_dupratio" -> { (s, dir) =>
      duplicatedShingleRatio(Tables.documents(s, dir), "doc_id", "text", 2)
        .groupBy(floor(col("dup_ratio") * 10).cast("int").as("decile"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_shared")).as("sum_shared"),
          sum(col("n_shingles")).as("sum_shingles"))
    })

  private val TOKS = """string_split_regex(trim(lower(text)), '\s+')"""
  private val POLY = """list_reduce(list_concat([CAST(0 AS BIGINT)], list_transform(string_split_regex(w, ''), c -> CAST(ascii(c) AS BIGINT))), (a, b) -> (a * 131 + b) % 1000000007)"""

  private val (mhA, mhB) = graft.functions.HashExprs.minHashCoefficients(8, 42L)

  /** Auxiliary Verify dumps (not graded): the xxh64 MinHash(32) signatures
    * the d_minhash_lsh oracle replays its pipeline over. Must be the exact
    * expression minhashLshPairs builds internally. Lanes dump as SCALAR
    * columns m0..m31 (not one array<bigint>): even aux artifacts flow
    * through the driver's pandas sort, which cannot order array cells —
    * atomic-only top-level schemas are pinned in ModulesSpec. */
  val aux: Map[String, Q] = Map(
    "aux_minhash_sigs" -> { (s, dir) =>
      val sig = graft.functions.HashExprs.minHashSignature(
        wordShingles(col("text"), 2), 32)
      Tables.documents(s, dir).select(col("doc_id").as("id") +:
        (0 until 32).map(i => sig.getItem(i).as(s"m$i")): _*)
    })

  /** The d_minhash_lsh structural replay over the Spark-dumped xxh64
    * signatures (scalar lanes m0..m31): band keys as one flattened
    * polynomial per 4-lane band, candidate equi-join on (band, key) with
    * id1 < id2, distinct, exact lane-match verification (est >= 0.5 as
    * the integer predicate 2*matches >= 32). `extraPred` appends to the
    * final WHERE (the incremental face filters seen-seen pairs). */
  private val LSH_CTES: String =
    s"""sigs AS (SELECT * FROM '__OUTDIR__/aux_minhash_sigs/*.parquet'), bk AS (SELECT id, CAST(j AS INT) AS band, CASE CAST(j AS INT) ${(0 until 8).map(b => s"WHEN $b THEN (((m${b * 4} * 131 + m${b * 4 + 1}) * 131 + m${b * 4 + 2}) * 131 + m${b * 4 + 3}) % 1000000007").mkString(" ")} END AS key FROM sigs, range(0, 8) r(j)), cand AS (SELECT DISTINCT a.id AS id1, b.id AS id2 FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key AND a.id < b.id), m AS (SELECT c.id1, c.id2, ${(0 until 32).map(i => s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END").mkString(" + ")} AS nm FROM cand c JOIN sigs sa ON c.id1 = sa.id JOIN sigs sb ON c.id2 = sb.id)"""

  private def minhashLshReplaySql(extraPred: String): String =
    s"""WITH $LSH_CTES SELECT id1, id2 FROM m WHERE nm * 2 >= 32$extraPred"""

  val oracle: Map[String, String] = Map(
    "d_minhash" ->
      s"""WITH sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gs FROM (SELECT doc_id, $TOKS AS t FROM documents) x), hs AS (SELECT doc_id, list_transform(gs, w -> $POLY) AS hl FROM sh) SELECT doc_id, ${(0 until 8).map(j => s"CAST(coalesce(list_min(list_transform(hl, h -> (h * ${mhA(j)} + ${mhB(j)}) % 2147483647)), 2147483647) AS BIGINT) AS m$j").mkString(", ")} FROM hs""",
    "d_mlsh_poly" ->
      s"""WITH sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gs FROM (SELECT doc_id, $TOKS AS t FROM documents) x), hs AS (SELECT doc_id, list_transform(gs, w -> $POLY) AS hl FROM sh), sig AS (SELECT doc_id, [${(0 until 8).map(j => s"coalesce(list_min(list_transform(hl, h -> (h * ${mhA(j)} + ${mhB(j)}) % 2147483647)), 2147483647)").mkString(", ")}] AS s FROM hs), bk AS (SELECT doc_id, CAST(b AS INT) AS b, (s[CAST(b * 2 + 1 AS INT)] * 131 + s[CAST(b * 2 + 2 AS INT)]) % 1000000007 AS key FROM sig, range(0, 4) r(b)), cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2 FROM bk a JOIN bk b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT c.id1, c.id2, len(list_filter(range(1, 9), i -> sa.s[CAST(i AS INT)] = sb.s[CAST(i AS INT)])) / 8.0 AS est_jaccard FROM cand c JOIN sig sa ON c.id1 = sa.doc_id JOIN sig sb ON c.id2 = sb.doc_id WHERE len(list_filter(range(1, 9), i -> sa.s[CAST(i AS INT)] = sb.s[CAST(i AS INT)])) / 8.0 >= 0.5""",
    // structural replay over the Spark-dumped xxh64 signatures (scalar
    // lane columns m0..m31): band keys ((fold lane: acc*131+lane) mod
    // 1e9+7 — mod distributes, so one flattened polynomial per 4-lane
    // band), candidate equi-join on (band, key) with id1 < id2, distinct,
    // then the exact lane-match verification (est >= 0.5 as the integer
    // predicate 2*matches >= 32)
    "d_minhash_lsh" -> minhashLshReplaySql(""),
    // truth = the d_ngram replay; pred = the LSH structural replay over
    // the dumped signatures; counts and integer basis points from both
    "d_lsh_quality" ->
      s"""WITH $LSH_CTES, v AS (SELECT id1, id2 FROM m WHERE nm * 2 >= 32), sh AS (SELECT doc_id AS id, list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gs FROM (SELECT doc_id, $TOKS AS t FROM documents) x), inv AS (SELECT id, len(gs) AS nsh, unnest(gs) AS g FROM sh), tr AS (SELECT a.id AS id1, b.id AS id2 FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id GROUP BY a.id, b.id, a.nsh, b.nsh HAVING count(*) * 100 >= (a.nsh + b.nsh - count(*)) * 50), c AS (SELECT (SELECT count(*) FROM tr) AS n_truth, (SELECT count(*) FROM v) AS n_pred, (SELECT count(*) FROM v JOIN tr USING (id1, id2)) AS n_tp) SELECT CAST(n_truth AS BIGINT) AS n_truth, CAST(n_pred AS BIGINT) AS n_pred, CAST(n_tp AS BIGINT) AS n_tp, CAST(CASE WHEN n_pred = 0 THEN 0 ELSE (n_tp * 10000) // n_pred END AS BIGINT) AS precision_bp, CAST(CASE WHEN n_truth = 0 THEN 0 ELSE (n_tp * 10000) // n_truth END AS BIGINT) AS recall_bp FROM c""",
    // the incremental face replays the SAME pipeline and drops the
    // seen-seen (both-even) pairs — exactly what the delta-probing
    // candidate join never generates
    "d_incremental" ->
      minhashLshReplaySql(" AND NOT (id1 % 2 = 0 AND id2 % 2 = 0)"),
    "d_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n FROM (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id + 100000, text FROM documents) t GROUP BY 1""",
    "d_ngram" ->
      s"""WITH sh AS (SELECT doc_id AS id, list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gs FROM (SELECT doc_id, $TOKS AS t FROM documents) x), inv AS (SELECT id, len(gs) AS nsh, unnest(gs) AS g FROM sh) SELECT a.id AS id1, b.id AS id2, count(*) AS inter, a.nsh + b.nsh - count(*) AS uni FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id GROUP BY a.id, b.id, a.nsh, b.nsh HAVING count(*) * 100 >= (a.nsh + b.nsh - count(*)) * 50""",
    // containment replay: the unordered pair aggregate plus both
    // oriented projections, each thresholded on its own |src|
    "d_containment" ->
      s"""WITH sh AS (SELECT doc_id AS id, list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gs FROM (SELECT doc_id, $TOKS AS t FROM documents) x), inv AS (SELECT id, len(gs) AS nsh, unnest(gs) AS g FROM sh), p AS (SELECT a.id AS id1, b.id AS id2, count(*) AS inter, a.nsh AS n1, b.nsh AS n2 FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id GROUP BY a.id, b.id, a.nsh, b.nsh), o AS (SELECT id1 AS src, id2 AS dst, inter, n1 AS nsrc FROM p UNION ALL SELECT id2, id1, inter, n2 FROM p) SELECT src, dst, inter, nsrc FROM o WHERE inter * 100 >= nsrc * 80""",
    "d_lev" ->
      """WITH d AS (SELECT doc_id, lang || '|' || substr(text, 1, 2) AS blk, substr(text, 1, 40) AS p FROM documents) SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(levenshtein(a.p, b.p) AS INT) AS dist FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id AND levenshtein(a.p, b.p) <= 12""",
    "d_contam" ->
      s"""WITH sh AS (SELECT doc_id AS id, list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gs FROM (SELECT doc_id, $TOKS AS t FROM documents) x), inv AS (SELECT id, len(gs) AS nsh, unnest(gs) AS g FROM sh) SELECT t.id AS train_id, e.id AS eval_id, count(*) AS inter, t.nsh + e.nsh - count(*) AS uni FROM inv t JOIN inv e ON t.g = e.g AND t.id % 2 = 0 AND e.id % 2 = 1 GROUP BY t.id, e.id, t.nsh, e.nsh HAVING count(*) * 100 >= (t.nsh + e.nsh - count(*)) * 50""",
    "d_clusters" ->
      s"""WITH RECURSIVE sh AS (SELECT doc_id AS id, list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gs FROM (SELECT doc_id, $TOKS AS t FROM documents) x), inv AS (SELECT id, len(gs) AS nsh, unnest(gs) AS g FROM sh), e AS (SELECT a.id AS id1, b.id AS id2 FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id GROUP BY a.id, b.id, a.nsh, b.nsh HAVING count(*) * 100 >= (a.nsh + b.nsh - count(*)) * 50), sym AS (SELECT id1 AS a, id2 AS b FROM e UNION SELECT id2, id1 FROM e), reach(a, b) AS (SELECT a, a FROM (SELECT DISTINCT a FROM sym) n UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a) SELECT a AS id, min(b) AS rep FROM reach GROUP BY a""",
    "d_dropdups" ->
      s"""WITH RECURSIVE sh AS (SELECT doc_id AS id, list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gs FROM (SELECT doc_id, $TOKS AS t FROM documents) x), inv AS (SELECT id, len(gs) AS nsh, unnest(gs) AS g FROM sh), e AS (SELECT a.id AS id1, b.id AS id2 FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id GROUP BY a.id, b.id, a.nsh, b.nsh HAVING count(*) * 100 >= (a.nsh + b.nsh - count(*)) * 50), sym AS (SELECT id1 AS a, id2 AS b FROM e UNION SELECT id2, id1 FROM e), reach(a, b) AS (SELECT a, a FROM (SELECT DISTINCT a FROM sym) n UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a), lbl AS (SELECT a AS id, min(b) AS rep FROM reach GROUP BY a) SELECT count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS sum_ids FROM documents WHERE doc_id NOT IN (SELECT id FROM lbl WHERE id <> rep)""",
    "d_keepbest" ->
      s"""WITH RECURSIVE sh AS (SELECT doc_id AS id, list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gs FROM (SELECT doc_id, $TOKS AS t FROM documents) x), inv AS (SELECT id, len(gs) AS nsh, unnest(gs) AS g FROM sh), e AS (SELECT a.id AS id1, b.id AS id2 FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id GROUP BY a.id, b.id, a.nsh, b.nsh HAVING count(*) * 100 >= (a.nsh + b.nsh - count(*)) * 50), sym AS (SELECT id1 AS a, id2 AS b FROM e UNION SELECT id2, id1 FROM e), reach(a, b) AS (SELECT a, a FROM (SELECT DISTINCT a FROM sym) n UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a), lbl AS (SELECT a AS id, min(b) AS rep FROM reach GROUP BY a), cl AS (SELECT d.doc_id, d.n_chars, coalesce(l.rep, d.doc_id) AS cluster FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id), k AS (SELECT doc_id, n_chars FROM (SELECT doc_id, n_chars, row_number() OVER (PARTITION BY cluster ORDER BY n_chars DESC, doc_id) AS rn FROM cl) z WHERE rn = 1) SELECT count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS sum_ids, CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM k""",
    "d_pipeline" ->
      s"""WITH RECURSIVE docs AS (SELECT doc_id, text FROM documents WHERE length(text) >= 150), keep AS (SELECT min(doc_id) AS doc_id FROM docs GROUP BY md5(text)), surv AS (SELECT d.doc_id, d.text FROM docs d JOIN keep k ON d.doc_id = k.doc_id), sh AS (SELECT doc_id AS id, list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gs FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM surv) x), inv AS (SELECT id, len(gs) AS nsh, unnest(gs) AS g FROM sh), e AS (SELECT a.id AS id1, b.id AS id2 FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id GROUP BY a.id, b.id, a.nsh, b.nsh HAVING count(*) * 100 >= (a.nsh + b.nsh - count(*)) * 50), sym AS (SELECT id1 AS a, id2 AS b FROM e UNION SELECT id2, id1 FROM e), reach(a, b) AS (SELECT a, a FROM (SELECT DISTINCT a FROM sym) n UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a), lbl AS (SELECT a AS id, min(b) AS rep FROM reach GROUP BY a) SELECT count(*) AS n_final, CAST(sum(doc_id) AS BIGINT) AS id_sum FROM surv WHERE doc_id NOT IN (SELECT id FROM lbl WHERE id <> rep)""",
    "d_simhash" ->
      s"""WITH tok AS (SELECT doc_id, unnest($TOKS) AS w FROM documents), th AS (SELECT doc_id, ($POLY * 2654435761) % 281474976710656 AS h FROM tok), votes AS (SELECT doc_id, j, sum(CASE WHEN (h >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v FROM th, range(0, 48) r(j) GROUP BY doc_id, j) SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash FROM votes GROUP BY doc_id""",
    "d_simhash_pairs" ->
      s"""WITH tok AS (SELECT doc_id, unnest($TOKS) AS w FROM documents), th AS (SELECT doc_id, ($POLY * 2654435761) % 281474976710656 AS h FROM tok), votes AS (SELECT doc_id, j, sum(CASE WHEN (h >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v FROM th, range(0, 48) r(j) GROUP BY doc_id, j), sig AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS sh FROM votes GROUP BY doc_id), sigl AS (SELECT s.doc_id, s.sh, d.lang FROM sig s JOIN documents d ON s.doc_id = d.doc_id) SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(bit_count(xor(CAST(a.sh AS BIGINT), CAST(b.sh AS BIGINT))) AS BIGINT) AS dist FROM sigl a JOIN sigl b ON a.lang = b.lang AND a.doc_id < b.doc_id WHERE bit_count(xor(CAST(a.sh AS BIGINT), CAST(b.sh AS BIGINT))) <= 6""",
    "d_embed" ->
      """WITH p AS (SELECT a.vec_id AS id1, b.vec_id AS id2, a.embedding AS ea, b.embedding AS eb FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id), d AS (SELECT id1, id2, sum(CAST(ea[CAST(i AS INT)] AS DOUBLE) * CAST(eb[CAST(i AS INT)] AS DOUBLE)) AS dot, sum(CAST(ea[CAST(i AS INT)] AS DOUBLE) * CAST(ea[CAST(i AS INT)] AS DOUBLE)) AS na2, sum(CAST(eb[CAST(i AS INT)] AS DOUBLE) * CAST(eb[CAST(i AS INT)] AS DOUBLE)) AS nb2 FROM p, range(1, 65) r(i) GROUP BY id1, id2) SELECT id1, id2, round(dot / (sqrt(na2) * sqrt(nb2)), 4) AS cos FROM d WHERE dot / (sqrt(na2) * sqrt(nb2)) >= 0.35""",
    // full SemDeDup replay: both k-means rounds (SimilarityQueries'
    // kmeansIterSql — the same CTEs sim_kmeans trains with), max-cosine
    // assignment with smallest-cid ties, within-cell pairs, keep rule
    "d_semdedup" ->
      s"""WITH nc AS (SELECT GREATEST(16, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS k FROM embeddings),
e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
${SimilarityQueries.TRAIN_SAMPLE},
cent0 AS (SELECT vec_id AS cid, v AS cvec FROM e ORDER BY vec_id LIMIT (SELECT k FROM nc)),
${SimilarityQueries.kmeansIterSql(1)},
${SimilarityQueries.kmeansIterSql(2)},
ap AS (SELECT e.vec_id AS vid, c.cid, e.v AS ea, c.cvec AS eb FROM e, cent2 c),
ac AS (SELECT vid, cid, ${SimilarityQueries.COS} AS sim FROM ap, range(1,65) r(i) GROUP BY vid, cid),
cells AS (SELECT vid AS id, cid FROM (SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY sim DESC, cid) AS rn FROM ac WHERE sim IS NOT NULL) WHERE rn = 1),
cv AS (SELECT c.id, c.cid, e.v FROM cells c JOIN e ON e.vec_id = c.id),
pr AS (SELECT a.id AS id1, b.id AS id2, a.v AS ea, b.v AS eb FROM cv a JOIN cv b ON a.cid = b.cid AND a.id < b.id),
pd AS (SELECT id1, id2, ${SimilarityQueries.COS} AS cos FROM pr, range(1,65) r(i) GROUP BY id1, id2),
drp AS (SELECT DISTINCT id2 AS id FROM pd WHERE cos >= 0.35)
SELECT emb.vec_id, cells.cid, (drp.id IS NULL) AS kept FROM embeddings emb LEFT JOIN cells ON cells.id = emb.vec_id LEFT JOIN drp ON drp.id = emb.vec_id""",
    "d_sentdup" ->
      """WITH s AS (SELECT doc_id, sp, sent FROM (SELECT doc_id, generate_subscripts(sents, 1) AS sp, unnest(sents) AS sent FROM (SELECT doc_id, list_filter(list_transform(string_split_regex(text, '[.!?]+'), x -> trim(x)), x -> length(x) > 0) AS sents FROM documents) a) b), occ AS (SELECT sent, count(*) AS occ, min(struct_pack(id := doc_id, sp := sp)) AS first FROM s GROUP BY sent), k AS (SELECT s.doc_id, s.sp, s.sent FROM s JOIN occ USING (sent) WHERE occ.occ < 2 OR (occ.first.id = s.doc_id AND occ.first.sp = s.sp)), agg AS (SELECT doc_id, count(*) AS n_kept, md5(string_agg(sent, ' | ' ORDER BY sp)) AS kept_md5 FROM k GROUP BY doc_id) SELECT d.doc_id, CAST(len(list_filter(list_transform(string_split_regex(d.text, '[.!?]+'), x -> trim(x)), x -> length(x) > 0)) AS BIGINT) AS n_sent, CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept, coalesce(agg.kept_md5, md5('')) AS kept_md5 FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""",
    "d_spanrm" ->
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tok, list_transform(string_split_regex(trim(text), '\\s+'), x -> lower(x)) AS tokl FROM documents), g AS (SELECT doc_id, CAST(s AS INT) AS s, array_to_string(tokl[CAST(s AS INT):CAST(s + 4 AS INT)], ' ') AS gs FROM (SELECT doc_id, tokl, unnest(range(1, greatest(len(tokl) - 3, 1))) AS s FROM t) u), dup AS (SELECT gs FROM g GROUP BY gs HAVING count(*) >= 2), cov AS (SELECT DISTINCT doc_id, CAST(unnest(range(s, s + 5)) AS INT) AS p FROM g WHERE gs IN (SELECT gs FROM dup)), pos AS (SELECT doc_id, CAST(p AS INT) AS p, tok[CAST(p AS INT)] AS tkn FROM (SELECT doc_id, tok, unnest(range(1, len(tok) + 1)) AS p FROM t) v), kept AS (SELECT pos.doc_id, count(*) AS n_kept, md5(string_agg(tkn, ' ' ORDER BY pos.p)) AS kept_md5 FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.p WHERE cov.p IS NULL GROUP BY pos.doc_id) SELECT t.doc_id, CAST(len(tok) AS BIGINT) AS n_toks, CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept, coalesce(kept_md5, md5('')) AS kept_md5 FROM t LEFT JOIN kept ON t.doc_id = kept.doc_id""",
    "d_dupratio" ->
      s"""WITH sh AS (SELECT doc_id AS id, list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gs FROM (SELECT doc_id, $TOKS AS t FROM documents) x), inv AS (SELECT id, unnest(gs) AS g FROM sh), dfreq AS (SELECT g, count(*) AS df FROM inv GROUP BY g), per AS (SELECT id, count(*) AS n_shingles, count(*) FILTER (WHERE df >= 2) AS n_shared FROM inv JOIN dfreq USING (g) GROUP BY id) SELECT CAST(floor(round(n_shared * 1.0 / n_shingles, 4) * 10) AS INT) AS decile, count(*) AS n_docs, CAST(sum(n_shared) AS BIGINT) AS sum_shared, CAST(sum(n_shingles) AS BIGINT) AS sum_shingles FROM per GROUP BY 1""")
}
