package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Graph
import graft.algo.{MultiBfs, BitsetBfs, Geometric, PageRank, Components, Triangles, Chechik}
import graft.data.Tpch
import graft.text.Dedup
import graft.ann.Ann

/** Round benchmark (driver contract: ONE JSON line on stdout).
  *
  * Headline metric (BASELINE.md / BASELINE.json `metric`): supersteps/sec and
  * edges-processed/sec for harmonic centrality + PageRank to 1e-6 convergence
  * on the symmetrized part–supplier graph of `SPARK_GRAFT_SF_DIR`.
  *
  * Scaling-efficiency evidence (north rule, ≥0.8 from N to 4N executors; no
  * real cluster in this sandbox): the SAME message-heavy harmonic job
  * (SPARK_GRAFT_SCALE_PIVOTS multi-source BFS pivots, default 256) runs at
  * local[8] and local[32] on identical input; efficiency =
  * throughput(32) / (4 × throughput(8)). Many pivots make each superstep
  * compute-dominated — at trivial per-superstep work the fixed job-scheduling
  * latency is the bottleneck at ANY core count and no engine scales.
  *
  * "Edges processed" is exact message counts, not estimates:
  *  - BFS: every visited (pivot, v) pair enters the frontier exactly once and
  *    expands deg(v) neighbor messages ⇒ Σ_(pivot,v)∈dist deg(v).
  *  - PageRank: every directed arc carries one contribution per superstep
  *    ⇒ iterations × |arcs|.
  */
object Bench {

  private case class Job(sec: Double, supersteps: Long, edges: Long) {
    def edgesPerSec: Double = edges / sec
    def superstepsPerSec: Double = supersteps / sec
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def withSession[A](cores: Int)(f: SparkSession => A): A = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try f(spark) finally spark.stop()
  }

  /** Build + persist the bench graph; returns (adjacency, degrees, arcs). */
  private def buildGraph(spark: SparkSession, sfDir: String): (DataFrame, DataFrame, Long) = {
    val sym = Graph.symmetrize(Tpch.bipartiteEdges(spark, sfDir))
    val adj = Graph.adjacency(sym).persist()
    val deg = adj.select(col("src").as("id"), col("degree")).distinct().localCheckpoint(true)
    val arcs = deg.agg(sum("degree")).head().getLong(0)
    (adj, deg, arcs)
  }

  /** JIT/codegen warmup outside any timed region (same ops, tiny input). */
  private def warmup(spark: SparkSession, sfDir: String): Unit = {
    val warm = Graph.symmetrize(Tpch.sparseEdges(spark, sfDir, maxQty = 1.0))
    val warmAdj = Graph.adjacency(warm).persist()
    val warmSrc = Graph.vertices(warm).orderBy("id").limit(2).select(col("id").as("pivot"))
    Geometric.scores(MultiBfs.run(spark, warmAdj, warmSrc)).count()
    PageRank.run(spark, warmAdj, maxIter = 3, tol = 0.0).ranks.count()
    warmAdj.unpersist(true)
  }

  /** Exact harmonic centrality from `nPivots` multi-source BFS pivots.
    * `bitset = true` uses the packed-mask BFS (the scale path: message
    * volume per superstep is Σ deg(frontier) ROWS independent of pivot
    * count); `false` uses the row-per-(pivot,vertex) variant. "Edges
    * processed" is LOGICAL arc visits Σ_(pivot,v) deg(v) in both — the
    * reference's visitedArcs accounting — so the two are comparable.
    */
  private def harmonicJob(spark: SparkSession, adj: DataFrame, deg: DataFrame,
      nPivots: Int, bitset: Boolean): Job = {
    var steps = 0L
    val (edges, sec) = time {
      val sources = deg.orderBy("id").limit(nPivots).select(col("id").as("pivot"))
      val dist =
        if (bitset) BitsetBfs.run(spark, adj, sources, maskCols = 16,
          onSuperstep = (_, _) => steps += 1)
        else MultiBfs.run(spark, adj, sources, onSuperstep = (_, _) => steps += 1)
      Geometric.scores(dist).count()
      dist.join(deg, "id").agg(sum("degree")).head().getLong(0)
    }
    Job(sec, steps, edges)
  }

  /** PageRank to L∞ < 1e-6. */
  private def pagerankJob(spark: SparkSession, adj: DataFrame, arcs: Long): Job = {
    var steps = 0L
    val (_, sec) = time {
      PageRank.run(spark, adj, damping = 0.85, maxIter = 200, tol = 1e-6,
        onSuperstep = (_, _) => steps += 1).ranks.count()
    }
    Job(sec, steps, steps * arcs)
  }

  /** Breadth queries timed at local[32] only (coverage, not the headline). */
  private def breadth(spark: SparkSession, sfDir: String, adj: DataFrame): Seq[(String, Double)] = {
    def t(name: String)(f: => Any): (String, Double) =
      (name, try time(f)._2 catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 })
    Seq(
      t("q_cc") { Components.run(spark, adj).labels.count() },
      t("q_triangles") {
        Triangles.globalCount(spark, Tpch.copurchaseEdges(spark, sfDir)).count()
      },
      t("q_chechik_top10") {
        // the sparse graph: separated closeness values, so (1+ε)
        // certification stops early — on the near-regular bipartite graph
        // top-k closeness is ill-posed and the loop degenerates to ~n BFS
        val sym = Graph.symmetrize(Tpch.sparseEdges(spark, sfDir))
        val sadj = Graph.adjacency(sym).persist()
        try Chechik.topkCloseness(spark, sadj, k = 10)._1.count()
        finally sadj.unpersist(true)
      },
      t("q_minhash_lsh") {
        Dedup.minhashLsh(Tpch.table(spark, sfDir, "documents"), "doc_id", "text",
          n = 3, bands = 4, rows = 2, minJaccard = 0.8).count()
      },
      t("q_knn_brute") {
        Ann.knnBrute(Tpch.table(spark, sfDir, "embeddings"), queryId = 0L, k = 10).count()
      })
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rowPivots = sys.env.getOrElse("SPARK_GRAFT_PIVOTS", "32").toInt
    val scalePivots = sys.env.getOrElse("SPARK_GRAFT_SCALE_PIVOTS", "2048").toInt
    val loCores = 8
    val hiCores = 32

    // scaling leg at N=8 cores: the same bitset-harmonic job, identical input
    val lo = withSession(loCores) { s =>
      warmup(s, sfDir)
      val (adj, deg, _) = buildGraph(s, sfDir)
      try harmonicJob(s, adj, deg, scalePivots, bitset = true)
      finally adj.unpersist(true)
    }

    // main leg at 4N=32 cores: scaling job + headline + breadth
    val (hiScale, rowHarm, pr, buildSec, extras, arcs, nVerts) = withSession(hiCores) { s =>
      warmup(s, sfDir)
      val ((adj, deg, arcs), buildSec) = time(buildGraph(s, sfDir))
      val hiScale = harmonicJob(s, adj, deg, scalePivots, bitset = true)
      val rowHarm = harmonicJob(s, adj, deg, rowPivots, bitset = false)
      val pr = pagerankJob(s, adj, arcs)
      val extras = breadth(s, sfDir, adj)
      val n = deg.count()
      adj.unpersist(true)
      (hiScale, rowHarm, pr, buildSec, extras, arcs, n)
    }

    val factor = hiCores.toDouble / loCores
    val efficiency = hiScale.edgesPerSec / (factor * lo.edgesPerSec)
    val headSec = hiScale.sec + pr.sec
    val headEdges = hiScale.edges + pr.edges
    val headSteps = hiScale.supersteps + pr.supersteps

    val queries = Seq(
      "q_build_graph" -> buildSec,
      s"q_harmonic_bitset_${scalePivots}pivots" -> hiScale.sec,
      s"q_harmonic_rowbfs_${rowPivots}pivots" -> rowHarm.sec,
      "q_pagerank_1e-6" -> pr.sec) ++ extras
    val qJson = queries.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString("{", ",", "}")
    val total = queries.map(_._2).filter(_ > 0).sum

    println(
      s"""{"metric":"harmonic+pagerank(1e-6) headline + breadth, sec at local[$hiCores]","value":${f"$total%.3f"},"unit":"sec","queries":$qJson,"sf":"$sfDir"""" +
      s""","graph":{"vertices":$nVerts,"arcs":$arcs}""" +
      s""","headline":{"supersteps":$headSteps,"edges_processed":$headEdges,"edges_per_sec":${f"${headEdges / headSec}%.0f"},"supersteps_per_sec":${f"${headSteps / headSec}%.3f"}}""" +
      s""","scaling":{"job":"harmonic_bitset_${scalePivots}pivots","cores_lo":$loCores,"cores_hi":$hiCores,"edges_per_sec_lo":${f"${lo.edgesPerSec}%.0f"},"edges_per_sec_hi":${f"${hiScale.edgesPerSec}%.0f"},"sec_lo":${f"${lo.sec}%.3f"},"sec_hi":${f"${hiScale.sec}%.3f"},"factor":$factor,"efficiency":${f"$efficiency%.3f"}}}""")
  }
}
