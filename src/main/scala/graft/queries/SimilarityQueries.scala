package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.similarity._

/** Similarity-search wave over `embeddings` (64-dim float vectors).
  * Brute-force cosine top-k carries a full oracle; the LSH variant is
  * approximate (deterministic, but the SQL mirror would be unreadable) and
  * gets a rows-only check + ScalaTest recall assertions.
  */
object SimilarityQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // exact cosine top-3 for the first 10 query vectors (broadcast join,
    // per-query top-k via window — corpus scanned once, map-side)
    "sim_topk" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      bruteForceTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 3)
        .select(col("qid"), col("rank"), col("nid"),
          round(col("cos"), 4).as("cos"))
    },

    // vector kernel battery (graft.similarity dot/l2Norm/l2Normalize/
    // euclidean — the codegen'd aggregate(zip_with) HOF forms): norms,
    // self-normalization to unit length, distance to the reversed vector
    "sim_vecops" -> { (s, dir) =>
      val e = col("embedding")
      Tables.embeddings(s, dir).select(col("vec_id"),
        round(l2Norm(e), 4).as("l2"),
        round(l2Norm(l2Normalize(e)), 4).as("unit_l2"),
        round(euclidean(e, reverse(e)), 4).as("eucl_rev"))
    },

    // hyperplane-LSH ANN: 12 planes -> ~2^12 buckets, exact re-rank inside.
    // Deterministic end to end (LCG hyperplanes, lexicographic tie-breaks)
    // => the whole search replays in DuckDB below, signature included
    "sim_lsh" -> { (s, dir) =>
      lshTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        dim = 64, nPlanes = 12, k = 3)
        .select(col("qid"), col("rank"), col("nid"),
          round(col("cos"), 4).as("cos"))
    },

    // IVF ANN: auto-sized cells (~sqrt(N), floor 16 — the fixed-16 version
    // measured 25x on a 10x corpus in the sf1 soak), probe the 4 nearest
    // per query. Deterministic seed centroids => oracled in DuckDB below.
    "sim_ivf" -> { (s, dir) =>
      ivfTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        nCells = 0, nprobe = 4, k = 3)
        .select(col("qid"), col("rank"), col("nid"),
          round(col("cos"), 4).as("cos"))
    },

    // scalar-quantization ANN (SQ8: per-dimension [min,max] ranges, 8-bit
    // codes = 4x corpus compression, zero training iterations) searched
    // asymmetrically: float64 queries against the dequantized corpus.
    // Deterministic (floor(x+0.5) half-up codes, range stats as a 1-row
    // broadcast) => train/encode/dequantize/search replays in DuckDB
    "sim_sq8" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      graft.similarity.Sq.sq8TopK(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", k = 3)
        .select(col("qid"), col("rank"), col("nid"),
          round(col("cos"), 4).as("cos"))
    },

    // product-quantization ANN (16 subspaces x 32 centroids = 16 B/vector,
    // a 16x corpus compression) with an ADC shortlist of 50 re-ranked by
    // exact cosine. Deterministic end to end (first-4096-by-id training
    // sample, strict-< tie-breaks, LCG-free seeding) => the full train/
    // encode/ADC/re-rank pipeline replays in DuckDB below
    "sim_pq" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val model = Pq.trainPq(emb, "vec_id", "embedding", 64, m = 16, ksub = 32)
      Pq.pqTopK(emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding",
          k = 3, model, rerank = 50)
        .select(col("qid"), col("rank"), col("nid"),
          round(col("cos"), 4).as("cos"))
    },

    // IVF with k-means-trained centroids (2 spherical rounds): same search
    // shape, better-balanced cells => higher recall at equal nprobe.
    // Deterministic (seed centroids, smallest-cid tie-breaks, elementwise
    // means) => both training rounds and the search replay in DuckDB below
    "sim_kmeans" -> { (s, dir) =>
      ivfTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        nCells = 0, nprobe = 4, k = 3, trainIters = 2)
        .select(col("qid"), col("rank"), col("nid"),
          round(col("cos"), 4).as("cos"))
    },

    // MMR diversification (Carbonell & Goldstein 1998): 8 exact-cosine
    // candidates per query re-ranked into 4 relevance-vs-redundancy picks
    // at lambda=0.7. Deterministic greedy (double blend mirrored op-for-op,
    // ties to smaller nid) => the selection replays in DuckDB as four
    // unrolled argmax steps
    "sim_mmr" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      mmrRerank(emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding",
        nCand = 8, kOut = 4, lambda = 0.7)
        .select(col("qid"), col("rank"), col("nid"),
          round(col("rel"), 4).as("rel"), round(col("mmr"), 4).as("mmr"))
    },

    // graded ANN quality measurement: recall@3 of the IVF search vs the
    // exact brute-force ground truth on the 10-query sample — both legs
    // are themselves graded queries (sim_ivf / sim_topk), so this pins
    // the recall NUMBER, not just a ScalaTest bound. n_hit counts the
    // true top-3 neighbors the IVF probe set recovered
    "sim_recall" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val brute = bruteForceTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 3)
        .select(col("qid"), col("nid"))
      val ivf = ivfTopK(emb, "vec_id", "embedding",
        nCells = 0, nprobe = 4, k = 3)
        .filter(col("qid") < 10)
        .select(col("qid").as("iqid"), col("nid").as("inid"))
      brute.join(ivf,
          col("qid") === col("iqid") && col("nid") === col("inid"), "left")
        .groupBy(col("qid"))
        .agg(count(col("inid")).as("n_hit"))
        .select(col("qid"), col("n_hit"),
          expr("(n_hit * 10000) DIV 3").as("recall_bp"))
    },

    // hybrid retrieval: dense cosine top-20 + lexical token-set Jaccard
    // top-20 for the same 10 query ids (documents/embeddings share the id
    // space), fused by reciprocal-rank fusion (graft.similarity.rrfFuse).
    // Both legs' ranks and the fused score are integer-exact, so the
    // whole two-system pipeline replays in DuckDB
    "sim_rrf" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val dense = bruteForceTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 20)
        .select(col("qid"), col("nid"), col("rank"))
      val lex = lexicalJaccardTopK(Tables.documents(s, dir), "doc_id",
        "text", id => id < 10, k = 20)
        .select(col("qid"), col("nid"), col("rank"))
      rrfFuse(Seq(dense, lex), k = 10)
        .select(col("qid"), col("rank"), col("nid"),
          col("rrf").cast("bigint").as("rrf"))
    },

    // exact quantized covariance sufficient statistics in ONE corpus
    // pass (graft.similarity.Pca.momentStats): d first moments +
    // d(d+1)/2 upper-triangle second moments as exact BIGINTs — the
    // map-side-agg shape whose shuffle is O(d²) rows per partition at
    // any corpus size
    "sim_cov" -> { (s, dir) =>
      Pca.momentStats(Tables.embeddings(s, dir), "embedding", qBits = 14)
    },
    // distributed PCA projection: the moments feed a bounded driver
    // eigensolve (d×d, the k-centroids contract) and the top component
    // broadcasts back as a fixed-point literal; proj_q = Σ q_i·vq_i is
    // exact int64. The oracle replays the projection from the
    // aux_pca_vec dump — the aux_minhash_sigs pattern
    "sim_pca" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val vq = Pca.quantizeComponent(
        Pca.topComponent(Pca.momentStats(emb, "embedding", qBits = 14), d = 64))
      Pca.projectQ(emb, "embedding", vq, qBits = 14, outCol = "proj_q")
        .select(col("vec_id"), col("label"), col("proj_q"))
    },
    // Johnson–Lindenstrauss random projection (graft.similarity.Rproj):
    // 8 deterministic splitmix64 Rademacher sign lanes, exact int64
    // projections, zero shuffle — the oracle replays the dot products
    // from the aux_rproj_signs dump (the aux_pca_vec pattern)
    "sim_rproj" -> { (s, dir) =>
      Rproj.projectQ(Tables.embeddings(s, dir), "embedding",
        Rproj.signMatrix(d = 64, k = 8), qBits = 14,
        keep = Seq("vec_id"))
    })

  /** Spark-computed intermediates for structural oracle replays (the
    * aux_minhash_sigs pattern): the quantized top principal component,
    * deterministic on the driver from the exact integer moments. */
  val aux: Map[String, Q] = Map(
    "aux_pca_vec" -> { (s, dir) =>
      import s.implicits._
      val vq = Pca.quantizeComponent(
        Pca.topComponent(
          Pca.momentStats(Tables.embeddings(s, dir), "embedding", qBits = 14),
          d = 64))
      vq.zipWithIndex.map { case (v, i) => (i, v) }.toSeq.toDF("i", "vq")
    },
    "aux_rproj_signs" -> { (s, dir) =>
      import s.implicits._
      val m = Rproj.signMatrix(d = 64, k = 8)
      (for (i <- m.indices; j <- m(i).indices)
        yield (i, j, m(i)(j))).toDF("i", "j", "sign")
    })

  private[queries] val COS =
    """sum(CAST(ea[CAST(i AS INT)] AS DOUBLE) * CAST(eb[CAST(i AS INT)] AS DOUBLE)) / (sqrt(sum(CAST(ea[CAST(i AS INT)] AS DOUBLE) * CAST(ea[CAST(i AS INT)] AS DOUBLE))) * sqrt(sum(CAST(eb[CAST(i AS INT)] AS DOUBLE) * CAST(eb[CAST(i AS INT)] AS DOUBLE))))"""

  /** The sim_ivf search replay (seed centroids, cell assignment, 4-probe
    * candidate set, exact re-rank) — shared verbatim by sim_ivf and
    * sim_recall so the two oracles can never drift apart. */
  private[queries] val IVF_CTES =
    s"""nc AS (SELECT GREATEST(16, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS k FROM embeddings), cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT (SELECT k FROM nc)), ap AS (SELECT e.vec_id AS vid, c.cid, e.embedding AS ea, c.cvec AS eb FROM embeddings e, cent c), ac AS (SELECT vid, cid, $COS AS sim FROM ap, range(1, 65) r(i) GROUP BY vid, cid), ranked AS (SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY sim DESC, cid) AS rn FROM ac WHERE sim IS NOT NULL), cells AS (SELECT vid AS id, cid FROM ranked WHERE rn = 1), probes AS (SELECT vid AS qid, cid FROM ranked WHERE rn <= 4), cand AS (SELECT p.qid, ce.id AS nid, eq.embedding AS ea, en.embedding AS eb FROM probes p JOIN cells ce ON p.cid = ce.cid AND p.qid <> ce.id JOIN embeddings eq ON eq.vec_id = p.qid JOIN embeddings en ON en.vec_id = ce.id), d AS (SELECT qid, nid, $COS AS cos FROM cand, range(1, 65) r(i) GROUP BY qid, nid), rk AS (SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank FROM d WHERE cos IS NOT NULL)"""

  /** The SQL mirror of kmeansCentroids' training-sample gate
    * (`trainSampleMax = 65536`): rounds train on the first 65536 vectors
    * by id. Below the bound this CTE IS the full corpus (same rows), so
    * the replay stays exact at every verify scale — and keeps matching
    * if a future sf puts the corpus above the bound (advisor finding:
    * the previous full-corpus replay would silently diverge there and
    * look like an engine bug). */
  private[queries] val TRAIN_SAMPLE =
    "tr AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 65536)"

  /** One spherical-k-means round in SQL: assign every TRAINING vector
    * (the `tr` sample — [[TRAIN_SAMPLE]]) to its max-cosine centroid
    * (ties to smallest cid, mirroring the Spark max_by(struct(sim,
    * -cid))), elementwise-mean the members per cell, cells that lost all
    * members keep their previous centroid. Requires `e` and `tr` CTEs. */
  private[queries] def kmeansIterSql(n: Int): String = {
    val prev = s"cent${n - 1}"
    s"""a${n}p AS (SELECT tr.vec_id AS vid, c.cid, tr.v AS ea, c.cvec AS eb FROM tr, $prev c),
a${n}c AS (SELECT vid, cid, $COS AS sim FROM a${n}p, range(1,65) r(i) GROUP BY vid, cid),
a$n AS (SELECT vid, cid FROM (SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY sim DESC, cid) AS rn FROM a${n}c WHERE sim IS NOT NULL) WHERE rn = 1),
m$n AS (SELECT cid, list(m ORDER BY i) AS mvec FROM (SELECT a$n.cid, r.i, avg(tr.v[CAST(r.i AS INT)]) AS m FROM a$n JOIN tr ON tr.vec_id = a$n.vid, range(1,65) r(i) GROUP BY a$n.cid, r.i) GROUP BY cid),
cent$n AS (SELECT c.cid, COALESCE(m.mvec, c.cvec) AS cvec FROM $prev c LEFT JOIN m$n m ON c.cid = m.cid)"""
  }

  /** One per-subspace Lloyd's round in SQL (mirrors `Pq.trainFlat`):
    * assign every sample subvector to its min-L2 centroid (strict `<`
    * scan = ties to the lowest j → ORDER BY d2, j), elementwise-mean the
    * members per (subspace, centroid), empty cells keep their previous
    * centroid. Subspaces ride as a key column, so one CTE chain trains
    * all 16 at once. */
  private def pqIterSql(n: Int): String = {
    val prev = s"pc${n - 1}"
    s"""pa$n AS MATERIALIZED (SELECT p.ord, p.s, p.sv, c.j, list_sum(list_transform(range(1,5), i -> (p.sv[CAST(i AS INT)] - c.cv[CAST(i AS INT)]) * (p.sv[CAST(i AS INT)] - c.cv[CAST(i AS INT)]))) AS d2 FROM subpts p JOIN $prev c ON c.s = p.s),
pb$n AS MATERIALIZED (SELECT ord, s, sv, j FROM (SELECT ord, s, sv, j, row_number() OVER (PARTITION BY ord, s ORDER BY d2, j) AS rn FROM pa$n) WHERE rn = 1),
pm$n AS MATERIALIZED (SELECT s, j, list(mv ORDER BY i) AS cv FROM (SELECT s, j, i, avg(sv[CAST(i AS INT)]) AS mv FROM pb$n, range(1,5) r(i) GROUP BY s, j, i) GROUP BY s, j),
pc$n AS MATERIALIZED (SELECT c.s, c.j, COALESCE(m.cv, c.cv) AS cv FROM $prev c LEFT JOIN pm$n m ON m.s = c.s AND m.j = c.j)"""
  }

  /** One unrolled MMR greedy step: from the not-yet-picked candidates,
    * score `L*rel - (1-L)*max(cos to picked)` and take the per-qid argmax
    * (ties to smaller nid). `L` is CAST(0.7 AS DOUBLE) and the complement
    * is the double subtraction `1 - L` — NOT a pre-folded 0.3 literal:
    * DuckDB parses bare decimals as DECIMAL, so `1 - 0.7` would be exact
    * 0.3 while the Scala blend uses `1.0 - 0.7 = 0.30000000000000004`;
    * the two differ by an ulp, which is enough to flip near-tied picks.
    * Requires `cands(qid, nid, rel)`, `pcs(qid, x, y, cos)` and the
    * running picked set `ps${n-1}`. */
  private def mmrStepSql(n: Int): String = {
    val prev = s"ps${n - 1}"
    val L = "CAST(0.7 AS DOUBLE)"
    s"""st$n AS (SELECT c.qid, c.nid, c.rel, $L * c.rel - (1 - $L) * max(p.cos) AS score FROM cands c JOIN $prev k ON k.qid = c.qid JOIN pcs p ON p.qid = c.qid AND p.x = c.nid AND p.y = k.nid WHERE c.nid NOT IN (SELECT nid FROM $prev w WHERE w.qid = c.qid) GROUP BY c.qid, c.nid, c.rel),
pk$n AS (SELECT qid, nid, rel, score AS mmr FROM (SELECT qid, nid, rel, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rn FROM st$n) WHERE rn = 1),
ps$n AS (SELECT qid, nid FROM $prev UNION ALL SELECT qid, nid FROM pk$n)"""
  }

  val oracle: Map[String, String] = Map(
    // sim_mmr replays the greedy selection as unrolled SQL: exact top-8
    // candidates (sim_topk's kernel), all pairwise candidate cosines, pick
    // 1 = argmax rel, picks 2-4 via mmrStepSql. Every double op mirrors
    // mmrRerank bit-for-bit (ascending-index cosine accumulation, the
    // `1 - L` complement as an op, argmax ties to smaller nid).
    "sim_mmr" ->
      s"""WITH p AS (SELECT q.vec_id AS qid, c.vec_id AS nid, q.embedding AS ea, c.embedding AS eb FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
d AS (SELECT qid, nid, $COS AS cos FROM p, range(1, 65) r(i) GROUP BY qid, nid),
cands AS (SELECT qid, nid, cos AS rel FROM (SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM d WHERE cos IS NOT NULL) WHERE rn <= 8),
cv AS (SELECT c.qid, c.nid, e.embedding AS v FROM cands c JOIN embeddings e ON e.vec_id = c.nid),
pcp AS (SELECT a.qid, a.nid AS x, b.nid AS y, a.v AS ea, b.v AS eb FROM cv a JOIN cv b ON a.qid = b.qid AND a.nid <> b.nid),
pcs AS (SELECT qid, x, y, $COS AS cos FROM pcp, range(1, 65) r(i) GROUP BY qid, x, y),
pk1 AS (SELECT qid, nid, rel, rel AS mmr FROM (SELECT qid, nid, rel, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid) AS rn FROM cands) WHERE rn = 1),
ps1 AS (SELECT qid, nid FROM pk1),
${(2 to 4).map(mmrStepSql).mkString(",\n")},
sel AS (SELECT qid, 1 AS rank, nid, rel, mmr FROM pk1 UNION ALL SELECT qid, 2, nid, rel, mmr FROM pk2 UNION ALL SELECT qid, 3, nid, rel, mmr FROM pk3 UNION ALL SELECT qid, 4, nid, rel, mmr FROM pk4)
SELECT qid, CAST(rank AS INT) AS rank, nid, round(rel, 4) AS rel, round(mmr, 4) AS mmr FROM sel""",
    // sim_pq replays the ENTIRE product-quantization pipeline in SQL:
    // driver-side codebook training (12 Lloyd's rounds x 16 subspaces on
    // the first-4096-by-id sample), corpus encoding, ADC scoring, the
    // 50-deep shortlist, and the exact-cosine re-rank. Two normalization
    // spellings are deliberately different because the Scala paths are:
    // the TRAINING sample divides by the norm (Pq.trainPq `_ / n`) while
    // the encode/tables kernels multiply by the inverse
    // (PqExprs.normalized `* (1/sqrt)`) — one ulp apart, and the replay
    // must match each bit-for-bit. Verified hash-exact vs the Spark dump.
    "sim_pq" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
tsamp AS MATERIALIZED (SELECT vec_id, v, row_number() OVER (ORDER BY vec_id) AS ord FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4096)),
tnorm AS MATERIALIZED (SELECT ord, list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y * y)))) AS vn FROM tsamp WHERE list_sum(list_transform(v, y -> y * y)) > 0),
subpts AS MATERIALIZED (SELECT ord, CAST(s.s AS INT) AS s, list_slice(vn, CAST(s.s*4+1 AS INT), CAST(s.s*4+4 AS INT)) AS sv FROM tnorm, range(0,16) s(s)),
pc0 AS MATERIALIZED (SELECT s, CAST(rn - 1 AS BIGINT) AS j, sv AS cv FROM (SELECT s, sv, row_number() OVER (PARTITION BY s ORDER BY first_ord) AS rn FROM (SELECT s, sv, min(ord) AS first_ord FROM subpts GROUP BY s, sv)) WHERE rn <= 32),
${(1 to 12).map(pqIterSql).mkString(",\n")},
cn AS MATERIALIZED (SELECT vec_id, list_transform(v, x -> x * (1.0 / sqrt(list_sum(list_transform(v, y -> y * y))))) AS vn FROM e WHERE list_sum(list_transform(v, y -> y * y)) > 0),
csub AS MATERIALIZED (SELECT vec_id, CAST(s.s AS INT) AS s, list_slice(vn, CAST(s.s*4+1 AS INT), CAST(s.s*4+4 AS INT)) AS sv FROM cn, range(0,16) s(s)),
cd AS MATERIALIZED (SELECT p.vec_id, p.s, c.j, list_sum(list_transform(range(1,5), i -> (p.sv[CAST(i AS INT)] - c.cv[CAST(i AS INT)]) * (p.sv[CAST(i AS INT)] - c.cv[CAST(i AS INT)]))) AS d2 FROM csub p JOIN pc12 c ON c.s = p.s),
codes AS MATERIALIZED (SELECT vec_id, s, j FROM (SELECT vec_id, s, j, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rn FROM cd) WHERE rn = 1),
tbl AS MATERIALIZED (SELECT q.vec_id AS qid, c.s, c.j, list_sum(list_transform(range(1,5), i -> q.sv[CAST(i AS INT)] * c.cv[CAST(i AS INT)])) AS dt FROM csub q JOIN pc12 c ON c.s = q.s WHERE q.vec_id < 10),
adc AS MATERIALIZED (SELECT t.qid, k.vec_id AS nid, sum(t.dt) AS score FROM codes k JOIN tbl t ON t.s = k.s AND t.j = k.j WHERE k.vec_id <> t.qid GROUP BY t.qid, k.vec_id),
short AS MATERIALIZED (SELECT qid, nid FROM (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rn FROM adc) WHERE rn <= 50),
xp AS MATERIALIZED (SELECT sh.qid, sh.nid, eq.embedding AS ea, en.embedding AS eb FROM short sh JOIN embeddings eq ON eq.vec_id = sh.qid JOIN embeddings en ON en.vec_id = sh.nid),
xd AS MATERIALIZED (SELECT qid, nid, $COS AS cos FROM xp, range(1, 65) r(i) GROUP BY qid, nid),
rk AS (SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank FROM xd WHERE cos IS NOT NULL)
SELECT qid, CAST(rank AS INT) AS rank, nid, round(cos, 4) AS cos FROM rk WHERE rank <= 3""",
    "sim_vecops" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings) SELECT vec_id, round(sqrt(list_sum(list_transform(e, x -> x * x))), 4) AS l2, round(CASE WHEN sqrt(list_sum(list_transform(e, x -> x * x))) > 0 THEN sqrt(list_sum(list_transform(list_transform(e, x -> x / sqrt(list_sum(list_transform(e, y -> y * y)))), x -> x * x))) END, 4) AS unit_l2, round(sqrt(list_sum(list_transform(range(1, len(e) + 1), i -> (e[CAST(i AS INT)] - e[CAST(len(e) - i + 1 AS INT)]) * (e[CAST(i AS INT)] - e[CAST(len(e) - i + 1 AS INT)])))), 4) AS eucl_rev FROM v""",
    "sim_topk" ->
      s"""WITH p AS (SELECT q.vec_id AS qid, c.vec_id AS nid, q.embedding AS ea, c.embedding AS eb FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id), d AS (SELECT qid, nid, $COS AS cos FROM p, range(1, 65) r(i) GROUP BY qid, nid), rk AS (SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank FROM d) SELECT qid, CAST(rank AS INT) AS rank, nid, round(cos, 4) AS cos FROM rk WHERE rank <= 3""",
    // hybrid RRF replay: the dense leg is the sim_topk replay at k=20;
    // the lexical leg is distinct-token Jaccard (integer-quantized) at
    // k=20; fusion sums 1000000 // (60 + rank) — all-integer, so the
    // fused ordering is engine-exact
    "sim_rrf" ->
      s"""WITH p AS (SELECT q.vec_id AS qid, c.vec_id AS nid, q.embedding AS ea, c.embedding AS eb FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id), d AS (SELECT qid, nid, $COS AS cos FROM p, range(1, 65) r(i) GROUP BY qid, nid), dr AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank FROM d WHERE cos IS NOT NULL), tk AS (SELECT id, tok FROM (SELECT doc_id AS id, unnest(list_distinct(string_split_regex(trim(lower(text)), '${"""\s+"""}'))) AS tok FROM documents) t WHERE length(tok) >= 4), sz AS (SELECT id, count(*) AS nt FROM tk GROUP BY 1), it AS (SELECT a.id AS qid, b.id AS nid, count(*) AS inter FROM tk a JOIN tk b USING (tok) WHERE a.id < 10 AND a.id <> b.id GROUP BY 1, 2), lj AS (SELECT it.qid, it.nid, (inter * 1000000) // (sa.nt + sb.nt - inter) AS jq FROM it JOIN sz sa ON sa.id = it.qid JOIN sz sb ON sb.id = it.nid), lr AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY jq DESC, nid) AS rank FROM lj), u AS (SELECT qid, nid, 1000000 // (60 + rank) AS s FROM dr WHERE rank <= 20 UNION ALL SELECT qid, nid, 1000000 // (60 + rank) FROM lr WHERE rank <= 20), f AS (SELECT qid, nid, CAST(sum(s) AS BIGINT) AS rrf FROM u GROUP BY 1, 2), rk AS (SELECT qid, nid, rrf, row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, nid) AS rank FROM f) SELECT qid, CAST(rank AS INT) AS rank, nid, rrf FROM rk WHERE rank <= 10""",
    // SQ8 full replay: per-dimension ranges, half-up 8-bit codes,
    // dequantize, asymmetric cosine, rank — same arithmetic order as the
    // Spark plan (mn + code * (mx - mn) / 255; floor(x + 0.5))
    "sim_sq8" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), d0 AS (SELECT CAST(i AS INT) AS dim, min(v[CAST(i AS INT)]) AS mn, max(v[CAST(i AS INT)]) AS mx FROM e, range(1, 65) r(i) GROUP BY 1), st AS (SELECT list(mn ORDER BY dim) AS mns, list(mx ORDER BY dim) AS mxs FROM d0), w AS (SELECT vec_id, list_transform(range(1, 65), i -> CASE WHEN mxs[CAST(i AS INT)] > mns[CAST(i AS INT)] THEN mns[CAST(i AS INT)] + greatest(0.0, least(255.0, floor((v[CAST(i AS INT)] - mns[CAST(i AS INT)]) / (mxs[CAST(i AS INT)] - mns[CAST(i AS INT)]) * 255 + 0.5))) * (mxs[CAST(i AS INT)] - mns[CAST(i AS INT)]) / 255 ELSE mns[CAST(i AS INT)] END) AS w FROM e, st), p AS (SELECT q.vec_id AS qid, c.vec_id AS nid, q.v AS ea, c.w AS eb FROM e q JOIN w c ON q.vec_id < 10 AND q.vec_id <> c.vec_id), d AS (SELECT qid, nid, $COS AS cos FROM p, range(1, 65) r(i) GROUP BY qid, nid), rk AS (SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank FROM d WHERE cos IS NOT NULL) SELECT qid, CAST(rank AS INT) AS rank, nid, round(cos, 4) AS cos FROM rk WHERE rank <= 3""",
    // sim_ivf is fully deterministic (seed centroids = first ~sqrt(N)
    // vectors by id, fixed probe count, lexicographic tie-breaks), so the
    // whole IVF search replays in SQL: same auto cell count, same
    // assignment ranking, same probe set, same final top-k.
    "sim_ivf" ->
      s"""WITH $IVF_CTES SELECT qid, CAST(rank AS INT) AS rank, nid, round(cos, 4) AS cos FROM rk WHERE rank <= 3""",
    // recall@3 of the IVF search against exact brute-force ground truth
    // for the 10-query sample: both legs replay exactly (the IVF CTEs
    // are sim_ivf's own; the brute leg is sim_topk's), so the recall
    // NUMBERS — not just bounds — are graded. recall_bp is integer
    // basis points (n_hit * 10000 // 3)
    "sim_recall" ->
      s"""WITH $IVF_CTES, bp AS (SELECT q.vec_id AS bqid, c.vec_id AS bnid, q.embedding AS ea, c.embedding AS eb FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id), bd AS (SELECT bqid, bnid, $COS AS cos FROM bp, range(1, 65) r(i) GROUP BY bqid, bnid), br AS (SELECT bqid, bnid, row_number() OVER (PARTITION BY bqid ORDER BY cos DESC, bnid) AS brank FROM bd WHERE cos IS NOT NULL), bt AS (SELECT bqid, bnid FROM br WHERE brank <= 3), iv AS (SELECT qid, nid FROM rk WHERE rank <= 3 AND qid < 10), h AS (SELECT bt.bqid AS qid, count(iv.nid) AS n_hit FROM bt LEFT JOIN iv ON iv.qid = bt.bqid AND iv.nid = bt.bnid GROUP BY 1) SELECT qid, CAST(n_hit AS BIGINT) AS n_hit, CAST((n_hit * 10000) // 3 AS BIGINT) AS recall_bp FROM h""",
    // sim_lsh replays the hyperplane signatures in SQL: the LCG plane
    // components are pure integer arithmetic ((1103515245*(j*4099+i)+12345)
    // mod 2^31, mapped to [-0.5, 0.5)), the dot accumulates ascending in i
    // exactly like the HyperplaneSig kernel, and the bucket join + exact
    // re-rank mirror lshTopK. Verified hash-exact against the Spark dump.
    "sim_lsh" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), sigs AS (SELECT vec_id, v, CAST(list_sum(list_transform(range(0, 12), j -> CASE WHEN list_sum(list_transform(range(0, 64), i -> v[CAST(i + 1 AS INT)] * (CAST((1103515245 * (j * 4099 + i) + 12345) % 2147483648 AS DOUBLE) / 2147483648.0 - 0.5))) >= 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig FROM e), p AS (SELECT a.vec_id AS qid, b.vec_id AS nid, a.v AS ea, b.v AS eb FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id <> b.vec_id), d AS (SELECT qid, nid, $COS AS cos FROM p, range(1, 65) r(i) GROUP BY qid, nid), rk AS (SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank FROM d WHERE cos IS NOT NULL) SELECT qid, CAST(rank AS INT) AS rank, nid, round(cos, 4) AS cos FROM rk WHERE rank <= 3""",
    // sim_kmeans replays BOTH training rounds (kmeansIterSql) and then the
    // identical IVF search over the trained centroids. Verified hash-exact
    // against the Spark dump — the cross-engine float risk (summation
    // order inside the elementwise means) does not bite at 4-decimal
    // rounding with these corpora.
    "sim_kmeans" ->
      s"""WITH nc AS (SELECT GREATEST(16, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS k FROM embeddings),
e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
$TRAIN_SAMPLE,
cent0 AS (SELECT vec_id AS cid, v AS cvec FROM e ORDER BY vec_id LIMIT (SELECT k FROM nc)),
${kmeansIterSql(1)},
${kmeansIterSql(2)},
ap AS (SELECT e.vec_id AS vid, c.cid, e.v AS ea, c.cvec AS eb FROM e, cent2 c),
ac AS (SELECT vid, cid, $COS AS sim FROM ap, range(1,65) r(i) GROUP BY vid, cid),
ranked AS (SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY sim DESC, cid) AS rn FROM ac WHERE sim IS NOT NULL),
cells AS (SELECT vid AS id, cid FROM ranked WHERE rn = 1),
probes AS (SELECT vid AS qid, cid FROM ranked WHERE rn <= 4),
cand AS (SELECT p.qid, ce.id AS nid, eq.v AS ea, en.v AS eb FROM probes p JOIN cells ce ON p.cid = ce.cid AND p.qid <> ce.id JOIN e eq ON eq.vec_id = p.qid JOIN e en ON en.vec_id = ce.id),
d AS (SELECT qid, nid, $COS AS cos FROM cand, range(1,65) r(i) GROUP BY qid, nid),
rk AS (SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank FROM d WHERE cos IS NOT NULL)
SELECT qid, CAST(rank AS INT) AS rank, nid, round(cos, 4) AS cos FROM rk WHERE rank <= 3""",

    // exact moment replay: floor(x·2^14) is one IEEE double multiply +
    // floor in both engines; every downstream value is integer
    "sim_cov" ->
      """WITH q AS (SELECT list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 16384) AS BIGINT)) AS qa FROM embeddings WHERE embedding IS NOT NULL),
f AS (SELECT CAST(i - 1 AS INT) AS i, CAST(-1 AS INT) AS j, qa[CAST(i AS INT)] AS v FROM q, range(1, 65) r(i)),
p AS (SELECT CAST(i - 1 AS INT) AS i, CAST(j - 1 AS INT) AS j, qa[CAST(i AS INT)] * qa[CAST(j AS INT)] AS v FROM q, range(1, 65) r(i), range(1, 65) r2(j) WHERE j >= i),
u AS (SELECT * FROM f UNION ALL SELECT * FROM p)
SELECT i, j, CAST(sum(v) AS BIGINT) AS s, count(*) AS n FROM u GROUP BY 1, 2""",
    // projection replay over the Spark-dumped quantized component: a
    // 64-row cross join + integer dot product, order-independent
    "sim_pca" ->
      """WITH vq AS (SELECT i, vq FROM '__OUTDIR__/aux_pca_vec/*.parquet'),
e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 16384) AS BIGINT)) AS qa FROM embeddings)
SELECT vec_id, label, CAST(sum(qa[CAST(i + 1 AS INT)] * vq) AS BIGINT) AS proj_q FROM e, vq GROUP BY vec_id, label""",
    // JL projection replay over the Spark-dumped sign matrix: per-lane
    // integer dot product, order-independent
    "sim_rproj" ->
      """WITH sg AS (SELECT i, j, sign FROM '__OUTDIR__/aux_rproj_signs/*.parquet'),
e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 16384) AS BIGINT)) AS qa FROM embeddings)
SELECT vec_id, j, CAST(sum(qa[CAST(i + 1 AS INT)] * sign) AS BIGINT) AS proj_q FROM e, sg GROUP BY vec_id, j""")
}
