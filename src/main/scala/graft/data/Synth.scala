package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic graph generator for the scaling benchmark.
  *
  * The driver's sf0.1 lineitem graph (21k vertices, 1.2M arcs) is too small
  * to evidence the north rule's N→4N scaling efficiency: each BFS/PageRank
  * superstep moves a few hundred MB at most, so fixed per-superstep cost
  * (job scheduling, checkpoint materialization, task launch) dominates and
  * NO engine scales. Scaling needs supersteps whose compute dominates —
  * i.e. a graph sized so Σ deg(frontier) per superstep is tens of millions
  * of message rows.
  *
  * Everything here is seeded xxhash64 arithmetic over `spark.range` — fully
  * deterministic at any parallelism (no rand(), no external data), generated
  * distributed (never driver-side), O(n/parts) per task. Mirrors the
  * reference's use of a fixed fixture graph (wordassociation-2011,
  * properties:25,29) as the bench input.
  */
object Synth {

  /** Random digraph: `n` vertices, ~`n·(avgDeg+1)/2…n·avgDeg` arcs.
    * Out-degree of v ∈ [1, 2·avgDeg−1] keyed by hash(v); neighbor i of v is
    * hash(v,i) mod n. A slice of edges (hash mod 50 == 0, ≈2%) is redirected
    * to `hubs` hub vertices so the adjacency build exercises explicit skew
    * salting at bench scale (north rule).
    */
  def edges(
      spark: SparkSession,
      n: Long,
      avgDeg: Int = 8,
      hubs: Int = 16,
      seed: Int = 7,
      parts: Int = 64): DataFrame = {
    val raw = pmod(xxhash64(lit(seed + 1), col("src"), col("i")), lit(n))
    spark.range(0L, n, 1L, parts)
      .select(
        col("id").as("src"),
        explode(sequence(
          lit(0),
          pmod(xxhash64(lit(seed), col("id")), lit(2 * avgDeg - 1)).cast("int"))).as("i"))
      .select(
        col("src"),
        when(pmod(raw, lit(50)) === 0, pmod(raw, lit(hubs.toLong))).otherwise(raw).as("dst"))
      .where(col("src") =!= col("dst"))
  }
}
