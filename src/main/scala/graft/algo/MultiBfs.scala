package graft.algo

import graft.core.{Materializer, LocalMaterializer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Level-synchronous multi-source BFS.
  *
  * The reference's one physical operator is the sequential BFS visit, one
  * thread per source (GeometricCentralities.java:151-207,
  * ChechikTopCloseness.java:143-190). We invert the loop nesting
  * (SURVEY.md §3.4): ALL pivots advance one hop per superstep, so each
  * superstep is a single Catalyst-planned frontier⋈adjacency join + dedup +
  * anti-join, and the driver only ever sees scalar frontier counts.
  *
  * State relation: Dist(pivot, id, dist) with dist ≥ 0; the dist=0 row is the
  * source itself (the reference excludes the source from distance sums but
  * counts it as reachable — GeometricCentralities.java:170-188 — the dist=0
  * row satisfies both: contributes 0 to sums, 1 to counts).
  *
  * Scale notes: only each superstep's newly-discovered increment is
  * materialized (the visited set is their union — a flat unionAll of
  * checkpointed scans, never rewritten); the adjacency side of the join keeps
  * its cached hash(src) partitioning so only the frontier shuffles.
  */
object MultiBfs {

  /** @param adjacency  output of `Graph.adjacency` over SYMMETRIZED edges,
    *                   persisted by the caller (reused every superstep).
    * @param sources    one column `pivot: Long`.
    * @return Dist(pivot, id, dist) for every vertex reachable from each pivot.
    */
  def run(
      spark: SparkSession,
      adjacency: DataFrame,
      sources: DataFrame,
      maxIter: Int = 256,
      mat: Materializer = new LocalMaterializer(window = 0),
      onSuperstep: (Int, Long) => Unit = (_, _) => ()): DataFrame = {

    // Increments carry NO dist column — the superstep d lives in the vector
    // (and in the checkpoint dir name for resume). A `lit(d)` inside the
    // loop plan would change the generated code every superstep (codegen
    // inlines literals) and force a janino recompile per superstep — serial
    // driver seconds that cap N→4N scaling. The loop plan is superstep-
    // invariant; dist is attached once when assembling the output relation.
    var increments = mat.resumeIncrements().toVector
      .map { case (i, f) => (i, f.select("pivot", "id")) }
    if (increments.isEmpty) {
      val init = sources
        .select(col("pivot").cast("long").as("pivot"))
        .distinct()
        .select(col("pivot"), col("pivot").as("id"))
      increments = Vector((0, mat.iterate(init, 0, -1.0)))
    }

    var d = increments.last._1
    var frontier = increments.last._2.select("pivot", "id")
    var frontierSize = frontier.count()
    // visited is consolidated into ONE checkpointed frame per superstep —
    // a growing unionAll of increments would make superstep d's plan carry
    // d branches (quadratic planning over a deep BFS). Consolidation is a
    // localCheckpoint (ephemeral): on resume it is rebuilt from the
    // mat-owned increments, which remain the durable unit.
    var visited = increments.map(_._2).reduce(_ unionAll _)
    if (increments.size > 1) visited = visited.localCheckpoint(true)
    var ownedVisited: Option[DataFrame] = if (increments.size > 1) Some(visited) else None

    while (frontierSize > 0 && d < maxIter) {
      d += 1
      // superstep: frontier ⋈ adjacency, explode the neighbor slices, dedup
      // (a vertex is reached from many frontier vertices AND many salt
      // slices), then anti-join the visited set — the distributed form of
      // the `distance[s] == -1` test (GeometricCentralities.java:165,176-178).
      val candidates = frontier
        .join(adjacency, frontier("id") === adjacency("src"))
        .select(col("pivot"), explode(col("neighbors")).as("id"))
        .distinct()
      val newly = candidates
        .join(visited.select("pivot", "id"), Seq("pivot", "id"), "left_anti")
        .select(col("pivot"), col("id"))
      // materialize + count fused (one Spark job per superstep, not two —
      // the count was half the per-superstep fixed cost)
      val (inc, cnt) = mat.iterateCounted(newly, d, frontierSize.toDouble)
      frontier = inc
      frontierSize = cnt
      if (frontierSize > 0) {
        increments :+= ((d, inc))
        val nv = visited.unionAll(inc).localCheckpoint(true)
        ownedVisited.foreach(_.unpersist(false))
        ownedVisited = Some(nv)
        visited = nv
      }
      onSuperstep(d, frontierSize)
    }
    // the consolidated anti-join frame is loop-internal state now — release
    // it; the output below reads only the mat-owned increments
    ownedVisited.foreach(_.unpersist(false))
    // output relation: dist attached per increment, ONE plan built here
    increments
      .map { case (i, f) => f.select(col("pivot"), col("id"), lit(i).as("dist")) }
      .reduce(_ unionAll _)
  }

  /** Single-source convenience. */
  def fromSource(spark: SparkSession, adjacency: DataFrame, source: Long, maxIter: Int = 256): DataFrame = {
    import spark.implicits._
    run(spark, adjacency, Seq(source).toDF("pivot"), maxIter)
  }
}
