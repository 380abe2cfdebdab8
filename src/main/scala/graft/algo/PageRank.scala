package graft.algo

import graft.core.{Materializer, LocalMaterializer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank as iterative Dataset joins (north rule; no reference counterpart
  * — SURVEY.md §2.12 G3).
  *
  * Superstep: contributions = ranks ⋈ adjacency (explode neighbor slices,
  * rank/degree each) → groupBy(dst).sum → new rank = (1−d)/n + d·(msg +
  * danglingMass/n). The salted adjacency is safe here: each neighbor lives in
  * exactly one slice and `degree` carries the FULL degree, so per-slice
  * contributions never double-count.
  *
  * Convergence: L∞(new − old) < tol, checked as a scalar between supersteps
  * (the reference's `volatile stop` analogue, SURVEY.md §3.4); or fixed
  * `maxIter` when `tol <= 0` (used by the DuckDB-oracle query, which unrolls
  * the same recurrence in SQL).
  */
object PageRank {

  case class Result(ranks: DataFrame, iterations: Int, finalDelta: Double)

  def run(
      spark: SparkSession,
      adjacency: DataFrame,
      damping: Double = 0.85,
      maxIter: Int = 100,
      tol: Double = 1e-6,
      mat: Materializer = new LocalMaterializer(window = Materializer.DefaultChain),
      vertices: Option[DataFrame] = None,
      onSuperstep: (Int, Double) => Unit = (_, _) => (),
      chain: Int = Materializer.DefaultChain): Result = {

    val adjSrcs = adjacency.select(col("src").as("id")).distinct()
    val verts = vertices.getOrElse(adjSrcs).localCheckpoint(true)
    val n = verts.count()
    val nInv = 1.0 / n

    // dangling vertices (no out-edges) never occur after symmetrize, and the
    // set is fixed across supersteps either way: resolve it ONCE so the
    // common symmetric case pays zero per-iteration jobs for it, while
    // directed inputs (verts ⊋ adj sources) still redistribute the mass.
    val danglingIds = verts.join(adjSrcs, Seq("id"), "left_anti").localCheckpoint(true)
    val hasDangling = danglingIds.count() > 0

    val resumed = mat.resumeIncrements()
    var (iter, ranks) = resumed.lastOption.getOrElse {
      (0, mat.iterate(verts.select(col("id"), lit(nInv).as("pr")), 0, Double.MaxValue))
    }

    // STATS DISCIPLINE: localCheckpoint carries originStats into the new
    // LogicalRDD and join sizeInBytes MULTIPLY — a superstep referencing
    // the previous state twice squares the stats each iteration (BigInt
    // blowup: Catalyst ends up multiplying million-digit numbers). Keep
    // exactly ONE reference to `prev` in the checkpointed plan; the L∞
    // delta joins two already-checkpointed frames and yields a scalar, so
    // its (large) join stats die with the job.
    def step(prev: DataFrame, danglingMass: Double): DataFrame = {
      val msgs = prev.join(adjacency, prev("id") === adjacency("src"))
        .select(explode(col("neighbors")).as("id"), (col("pr") / col("degree")).as("w"))
        .groupBy("id")
        .agg(sum("w").as("msg"))
      verts
        .join(msgs, Seq("id"), "left")
        .select(
          col("id"),
          (lit((1 - damping) * nInv) +
            lit(damping) * (coalesce(col("msg"), lit(0.0)) + lit(danglingMass * nInv))).as("pr"))
    }

    // Chained loop (see Materializer.chainCapacity): u supersteps built as
    // lazy checkpoints over each other, then ONE union job computes every
    // substep's L∞ delta — u message exchanges per job submission + driver
    // roundtrip instead of one each. Requires tol > 0 (the fixed-iteration
    // oracle mode never runs a per-step job at all) and no dangling mass
    // (its redistribution is a per-step SCALAR the chain can't know lazily;
    // never present after symmetrize). Convergence stops at the FIRST
    // substep with delta ≤ tol and keeps THAT state — results and reported
    // (iter, delta) telemetry identical to the eager loop; overshoot
    // substeps are computed but discarded.
    val chainLen =
      if (tol <= 0 || hasDangling) 1
      else math.max(1, math.min(chain, mat.chainCapacity))

    var delta = Double.MaxValue
    while (iter < maxIter && (tol <= 0 || delta > tol)) {
      val u = math.min(chainLen, maxIter - iter)
      if (u <= 1) {
        iter += 1
        val dangling =
          if (!hasDangling) 0.0
          else ranks.join(danglingIds, Seq("id"), "left_semi")
            .agg(coalesce(sum("pr"), lit(0.0)))
            .head().getDouble(0)
        // deferred checkpoint: the delta aggregate below is the materializing
        // action — one job per superstep instead of checkpoint + delta
        val state = mat.iterateDeferred(step(ranks, dangling), iter, -1.0)
        delta =
          if (tol <= 0) Double.MaxValue
          else state.join(ranks.select(col("id"), col("pr").as("prevPr")), "id")
            .agg(max(abs(col("pr") - col("prevPr"))))
            .head().getDouble(0)
        ranks = state
        onSuperstep(iter, delta)
      } else {
        var built = Vector.empty[DataFrame]
        var prev = ranks
        for (k <- 1 to u) {
          prev = mat.iterateDeferred(step(prev, 0.0), iter + k, -1.0)
          built :+= prev
        }
        val deltas = built.zipWithIndex.map { case (st, i) =>
          val before = if (i == 0) ranks else built(i - 1)
          st.join(before.select(col("id"), col("pr").as("prevPr")), "id")
            .agg(max(abs(col("pr") - col("prevPr"))).as("d"))
            .select(lit(i + 1).as("k"), col("d"))
        }.reduce(_ unionAll _)
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        var k = 1
        var stop = false
        while (k <= u && !stop) {
          iter += 1
          delta = deltas(k)
          ranks = built(k - 1)
          onSuperstep(iter, delta)
          if (delta <= tol) stop = true
          k += 1
        }
      }
    }
    Result(ranks, iter, delta)
  }

  /** DuckDB oracle: the identical recurrence unrolled as plain SQL CTEs
    * (recursive CTEs cannot aggregate in the recursive term). `edgeSql` must
    * produce the DIRECTED edge set; it is symmetrized here exactly like
    * [[graft.core.Graph.symmetrize]].
    */
  def oracleSql(edgeSql: String, iters: Int, damping: Double = 0.85): String = {
    val b = new StringBuilder
    b ++= s"WITH e0 AS ($edgeSql),\n"
    b ++= "e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),\n"
    b ++= "n AS (SELECT DISTINCT src AS id FROM e),\n"
    b ++= "deg AS (SELECT src AS id, count(*) AS d FROM e GROUP BY src),\n"
    b ++= "c AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM n),\n"
    b ++= "r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / (SELECT nn FROM c) AS pr FROM n)"
    for (i <- 1 to iters) {
      b ++= s""",
r$i AS (
  SELECT n.id,
         (1.0 - $damping) / (SELECT nn FROM c)
         + $damping * COALESCE(m.s, CAST(0.0 AS DOUBLE)) AS pr
  FROM n LEFT JOIN (
    SELECT e.dst AS id, sum(r.pr / deg.d) AS s
    FROM e JOIN r${i - 1} r ON e.src = r.id JOIN deg ON deg.id = e.src
    GROUP BY e.dst) m ON n.id = m.id)"""
    }
    b ++= s"\nSELECT id, round(pr, 6) AS pr FROM r$iters ORDER BY id"
    b.toString
  }
}
