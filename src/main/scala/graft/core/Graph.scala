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
    *
    * Shape (round 6, guide §2.3 "shuffle fewer bytes"): dedup the CANONICAL
    * orientation (least, greatest) — m rows through the distinct exchange —
    * then explode each surviving row into both orientations (loops once).
    * The Generate sits ABOVE the aggregate, so the whole transform is one
    * scan + ONE exchange of m canonical rows; the pre-round-6 form deduped
    * arcs ∪ reversed arcs (2m rows through the exchange), and the first
    * round-6 form (canon ∪ mirror-of-nonloop) planned the mirror branch as
    * a SECOND scan + aggregate + exchange because Catalyst pushes the
    * src≠dst filter below the distinct and the subtrees stop matching —
    * same bytes exchanged as pre-round-6, plus a double scan. Identical
    * result set for any edge table with non-null endpoints (vertex ids are
    * non-null everywhere in this engine; least/greatest would otherwise
    * skip a null endpoint where the union form kept the row).
    */
  def symmetrize(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    e.select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()
      .select(explode(
        when(col("src") === col("dst"),
          array(struct(col("src"), col("dst"))))
          .otherwise(array(
            struct(col("src"), col("dst")),
            struct(col("dst").as("src"), col("src").as("dst"))))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
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
    * salting for high-degree hubs").
    *
    * The salt is derived on the EDGE rows — `hash(dst) mod nSlices` with a
    * degree pre-join — so the aggregation itself groups by (src, salt) and no
    * task ever builds more than one slice of a hub's neighbor list (the
    * round-3 shape collect_list'ed the FULL adjacency of a vertex in one
    * aggregation row before slicing: an 800 MB array for a 10^8-degree hub —
    * the reference analogue is BVGraph successor streams never being held
    * whole, GraphReader.java:39). `nSlices = ⌈2·degree/maxSlice⌉` targets
    * mean occupancy maxSlice/2, so hash spread keeps every slice ≤ maxSlice
    * with overwhelming probability at production slice sizes (Chernoff:
    * P[> maxSlice] ≤ exp(−maxSlice/6) per slice) — and deterministically so
    * for a fixed input, since xxhash64 is seed-free here.
    *
    * The final repartition restores hash(src) partitioning; persist the
    * result once and every superstep's frontier⋈adjacency join reuses that
    * partitioning (adjacency side never re-shuffles).
    */
  def adjacency(symEdges: DataFrame, maxSlice: Int = 1 << 16): DataFrame = {
    // ONE exchange (round 6, guide §2.4 "remove shuffles outright"): hash the
    // edge rows by src first; the degree aggregate, the degree join and the
    // (src, salt) slice aggregate are all then satisfied by that single
    // partitioning — hash(src) clusters every (src, salt) group, and the
    // degree branch reuses the same shuffle output (ReusedExchange). The
    // aggregate's output partitioning IS hash(src), which the old shape
    // re-established with a trailing repartition — a full exchange of the
    // built neighbor arrays (the heaviest rows in the engine). Pre-round-6:
    // degree-agg exchange + slice-agg exchange + array repartition; now: one
    // edge-row exchange. The shuffle_hash hint keeps SMJ from sorting the
    // edge rows under stats-free inputs (broadcast-ineligible at scale:
    // degree rows ∝ vertex count).
    val e = symEdges.repartition(col("src"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("degree"))
    val nSlices =
      when(col("degree") <= maxSlice, lit(1L))
        .otherwise(ceil(col("degree") * lit(2.0) / maxSlice).cast("long"))
    e.join(deg.hint("shuffle_hash"), "src")
      .withColumn("salt", pmod(xxhash64(col("dst")), nSlices).cast("int"))
      .groupBy("src", "salt")
      .agg(
        sort_array(collect_list(col("dst"))).as("neighbors"),
        first("degree").as("degree"))
      .select("src", "salt", "neighbors", "degree")
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
