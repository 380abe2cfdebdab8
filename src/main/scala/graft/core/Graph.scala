package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed rows of the graph core (SURVEY.md §1.2).
  *
  * Vertex IDs are dense-minted `Long`s (reference keeps dense `int` IDs,
  * GraphBuilder.java:17-33); neighbor lists are the CSR-like adjacency the
  * north rule asks for, one row per (vertex, salt-slice).
  */
case class Edge(src: Long, dst: Long)
case class Adj(src: Long, salt: Int, neighbors: Array[Long], degree: Long)

/** Graph-building primitives, all pure DataFrame transforms so Catalyst
  * plans them (pushdown, AQE, broadcast selection come for free).
  */
object Graph {

  /** Undirected closure: arcs ∪ reversed arcs, dedup — the reference applies
    * `Transform.symmetrize` before every algorithm (Main.java:58,
    * GraphReader.java:40, ExactCloseness.java:25). Load-bearing semantics.
    */
  def symmetrize(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** P6 — transpose: negative/in- centralities on a digraph are positive/
    * out- centralities on the transpose (Main.java:28 help text,
    * GeometricCentralities.java:116). One projection; symmetrized graphs
    * are transpose-invariant.
    */
  def transpose(edges: DataFrame): DataFrame =
    edges.select(col("dst").cast("long").as("src"), col("src").cast("long").as("dst"))

  /** Canonical directed edge form u < v (used by triangle counting). */
  def canonicalize(edges: DataFrame): DataFrame =
    edges
      .select(
        least(col("src"), col("dst")).cast("long").as("src"),
        greatest(col("src"), col("dst")).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()

  /** Out-degree per vertex of an already-symmetrized edge set
    * (reference `graph.outdegree`, Sorter.java:21).
    */
  def degrees(symEdges: DataFrame): DataFrame =
    symEdges.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))

  /** Distinct vertex set of an edge table (symmetrized ⇒ src column covers all). */
  def vertices(symEdges: DataFrame): DataFrame =
    symEdges.select(col("src").as("id")).distinct()

  /** CSR-like adjacency: one row per (vertex, salt), neighbor array sorted for
    * determinism. `maxSlice` bounds the neighbor-array length so a 10^8-degree
    * hub never materializes as a single row (north rule: "explicit skew
    * salting for high-degree hubs"): a degree-d vertex becomes ⌈d/maxSlice⌉
    * salted rows whose per-slice work AQE can then spread across tasks.
    *
    * The result is hash-partitioned on `src` by the groupBy shuffle; persist
    * it once and every superstep's frontier⋈adjacency join reuses that
    * partitioning (adjacency side never re-shuffles).
    */
  def adjacency(symEdges: DataFrame, maxSlice: Int = 1 << 16): DataFrame = {
    val packed = symEdges
      .groupBy("src")
      .agg(sort_array(collect_list(col("dst"))).as("all_nbrs"))
      .withColumn("degree", size(col("all_nbrs")).cast("long"))
    packed
      .withColumn(
        "salt",
        explode(sequence(lit(0), ((col("degree") - 1) / maxSlice).cast("int"))))
      .select(
        col("src"),
        col("salt"),
        slice(col("all_nbrs"), col("salt") * maxSlice + 1, lit(maxSlice)).as("neighbors"),
        col("degree"))
  }

  /** Dense vertex-ID minting: external string IDs → 0..n-1 (reference
    * GraphBuilder.java:17-33 uses first-seen order; distributed first-seen is
    * nondeterministic, so we order by the external ID itself — deterministic
    * and relabel-invariant for every centrality per SURVEY.md §5.2).
    * Distributed two-pass range minting via [[Rank.globalRank]] — no
    * single-partition sort at any vertex count (10^12 paths shuffle by
    * range, never through one task).
    */
  def mintVertexIds(extIds: DataFrame): DataFrame =
    Rank.globalRank(
      extIds.select(col("extId").cast("string")).distinct(),
      "id", col("extId"))
}
