package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Graph
import graft.algo.{MultiBfs, Geometric, PageRank, Components, Triangles, Chechik}
import graft.data.Tpch
import graft.text.Dedup
import graft.ann.Ann

/** Round-6 isolation bench (guide §1.4): per-query reps in the EXACT bench
  * regime (local[32], shuffle partitions = cores, AQE off, shuffled-hash
  * preferred), each query labelled via setJobDescription and consumed with
  * the noop sink where the result is a relation (count() where the bench
  * itself counts, for action parity with `graft.Bench`). NOT part of the
  * driver contract — `Bench.scala` stays the only harness the driver reads;
  * numbers from here are cited in OPTIMIZATION_r06.md only.
  *
  * Args: [sfDir] [reps] [filter-substring]
  */
object BenchExtra {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val only = args.lift(2).getOrElse("")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warmup (same as Bench.warmup: JIT/codegen outside timed region)
    val warm = Graph.symmetrize(Tpch.sparseEdges(spark, dir, maxQty = 1.0))
    val warmAdj = Graph.adjacency(warm).persist()
    val warmSrc = Graph.vertices(warm).orderBy("id").limit(2).select(col("id").as("pivot"))
    Geometric.scores(MultiBfs.run(spark, warmAdj, warmSrc)).count()
    PageRank.run(spark, warmAdj, maxIter = 3, tol = 0.0).ranks.count()
    warmAdj.unpersist(true)

    // the bench graph, built once (its build is itself a measured query)
    var adj: DataFrame = null
    var deg: DataFrame = null
    var arcs = 0L
    def buildGraph(): Unit = {
      if (adj != null) adj.unpersist(true)
      adj = Graph.adjacency(Graph.symmetrize(Tpch.bipartiteEdges(spark, dir))).persist()
      deg = adj.select(col("src").as("id"), col("degree")).distinct().localCheckpoint(true)
      arcs = deg.agg(sum("degree")).head().getLong(0)
    }

    val tasks: Seq[(String, () => Unit)] = Seq(
      "q_build_graph" -> (() => buildGraph()),
      "q_harmonic_rowbfs_32pivots" -> (() => {
        val sources = deg.orderBy("id").limit(32).select(col("id").as("pivot"))
        Geometric.scores(MultiBfs.run(spark, adj, sources)).count()
      }),
      "q_pagerank_1e-6" -> (() => {
        PageRank.run(spark, adj, damping = 0.85, maxIter = 200, tol = 1e-6).ranks.count()
      }),
      "q_cc" -> (() => { Components.run(spark, adj).labels.count(); () }),
      "q_triangles" -> (() => {
        Triangles.globalCount(spark, Tpch.copurchaseEdges(spark, dir)).count(); ()
      }),
      "q_chechik_top10" -> (() => {
        val sym = Graph.symmetrize(Tpch.sparseEdges(spark, dir))
        val sadj = Graph.adjacency(sym).persist()
        try { Chechik.topkCloseness(spark, sadj, k = 10)._1.count(); () }
        finally { sadj.unpersist(true); () }
      }),
      "q_minhash_lsh" -> (() => {
        Dedup.minhashLsh(Tpch.table(spark, dir, "documents"), "doc_id", "text",
          n = 3, bands = 4, rows = 2, minJaccard = 0.8).count(); ()
      }),
      "q_knn_brute" -> (() => {
        Ann.knnBrute(Tpch.table(spark, dir, "embeddings"), queryId = 0L, k = 10).count(); ()
      }))

    // build the graph once untimed for queries that need it even when
    // q_build_graph is filtered out
    if (!"q_build_graph".contains(only)) buildGraph()

    val out = new StringBuilder("{")
    var first = true
    tasks.filter(_._1.contains(only)).foreach { case (name, f) =>
      val secs = (1 to reps).map { i =>
        spark.sparkContext.setJobDescription(s"$name rep$i")
        val s = time(f())
        println(f"[extra] $name rep$i: $s%.3f s")
        s
      }
      if (!first) out ++= ","
      first = false
      out ++= s""""$name":{"min":${f"${secs.min}%.3f"},"reps":[${secs.map(s => f"$s%.3f").mkString(",")}]}"""
    }
    out ++= "}"
    println(s"[extra-json] ${out.toString}")
    spark.stop()
  }
}
