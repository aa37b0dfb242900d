package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RFM segmentation — the classic customer-analytics triple: per entity,
  * Recency (time since last qualifying event, against the corpus max
  * timestamp so the result is deterministic), Frequency (event count),
  * Monetary (value sum in exact integer cents), each mapped to its
  * quintile over all entities and packed into the familiar three-digit
  * code ("543" = recent, frequent, big spender).
  *
  * Scale shape: ONE corpus scan into a map-side-combined per-entity
  * aggregate; the three quintile ranks run over the ENTITY frame (not
  * the corpus) through [[graft.core.Partitions.globalRankBy]]'s
  * two-level range-partitioned scan — no single-task ntile window, the
  * trap the textbook `ntile(5) OVER (ORDER BY …)` spelling falls into
  * at the first hundred million customers. The corpus max timestamp is
  * a 1-row broadcast.
  *
  * Determinism: ranks break ties by entity id (total order), quintile =
  * (rank−1)·5 DIV n + 1 — exact integers; monetary sums in micros
  * (LONG), so no float summation order anywhere. */
object Rfm {

  def rfmSegments(df: DataFrame, idCol: String, tsCol: String,
      valueCol: Column, buckets: Int = 5): DataFrame = {
    require(buckets > 1, s"buckets must be > 1, got $buckets")
    // materialize the entity frame ONCE: four consumers (the base row
    // plus three rank passes) would otherwise each re-run the corpus
    // aggregate — the divergent-subtree trap, cut here the same way
    // connectedComponents checkpoints its edges. Monetary truncates
    // per event toward zero (cast long), the convention the oracle
    // mirrors with trunc() — DuckDB's bare CAST would round.
    val perEnt = df.filter(col(idCol).isNotNull)
      .groupBy(col(idCol).as("ent"))
      .agg(max(unix_micros(col(tsCol))).as("last_us"),
        count(lit(1)).as("freq"),
        sum((valueCol * 1000000).cast("long")).as("mon_micro"))
      .localCheckpoint()
    val nowRef = perEnt.agg(max(col("last_us")).as("now_us"),
      count(lit(1)).as("n_ents"))
    val base = perEnt.crossJoin(broadcast(nowRef))
      .select(col("ent"), (col("now_us") - col("last_us")).as("rec_us"),
        col("freq"), col("mon_micro"), col("n_ents"))
    // three entity-frame ranks; quintiles ascend with the DESIRABLE
    // direction (low recency = high score), matching RFM convention
    def q(keyCol: String, asc: Boolean, outCol: String): DataFrame = {
      val key = if (asc) col(keyCol) else -col(keyCol)
      graft.core.Partitions.globalRankBy(
          base.select(col("ent").as("id"), key.as("v")), col("v"), "id")
        .crossJoin(broadcast(nowRef))
        .select(col("id").as("ent"),
          (expr(s"((rn - 1) * $buckets) DIV n_ents") + 1)
            .cast("int").as(outCol))
    }
    base
      .join(q("rec_us", asc = false, "r_q"), "ent") // oldest = rank 1
      .join(q("freq", asc = true, "f_q"), "ent")
      .join(q("mon_micro", asc = true, "m_q"), "ent")
      .select(col("ent").as(idCol), col("rec_us"), col("freq"),
        col("mon_micro"),
        col("r_q"), col("f_q"), col("m_q"),
        concat(col("r_q"), col("f_q"), col("m_q")).as("rfm"))
  }
}
