package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Graph
import graft.algo.{BitsetBfs, Geometric}
import graft.data.Synth

/** Ad-hoc probe for the Bench scaling leg (not part of the driver contract):
  * run the bitset-harmonic job on the synthetic graph at one core count.
  * Usage: runMain graft.tools.ScaleProbe <cores> <nVertices> <pivots> [maskCols]
  * (maskCols < (pivots+63)/64 splits the visit into more, narrower waves —
  * the round-5 per-task RMW working-set lever).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).map(_.toInt).getOrElse(8)
    val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val pivots = args.lift(2).map(_.toInt).getOrElse(512)
    val maskColsArg = args.lift(3).map(_.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",
        (sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "2").toInt * cores).toString)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[scaleprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      a
    }

    // SPARK_GRAFT_ADJ_DIR: reuse a prebuilt adjacency parquet (written once
    // at full cores, e.g. by a previous probe run with SPARK_GRAFT_ADJ_SAVE)
    // so a pinned 2-core probe doesn't pay minutes of graph build first —
    // same shape as Bench.prepScaleDir.
    val adjDir = sys.env.get("SPARK_GRAFT_ADJ_DIR")
    val (adj, deg, arcs) = t("build") {
      val adj = adjDir match {
        case Some(d) if java.nio.file.Files.exists(java.nio.file.Paths.get(d)) =>
          spark.read.parquet(d).repartition(col("src")).persist()
        case _ =>
          val a = Graph.adjacency(Graph.symmetrize(Synth.edges(spark, n))).persist()
          adjDir.foreach { d => a.write.mode("overwrite").parquet(d) }
          a
      }
      val deg = adj.select(col("src").as("id"), col("degree")).distinct().localCheckpoint(true)
      val arcs = deg.agg(sum("degree")).head().getLong(0)
      (adj, deg, arcs)
    }
    // untimed, same as Bench.loadScaleGraph: the chunk-keyed visit inputs
    // are leg prep, not algorithm work
    val bprep = t("prep")(BitsetBfs.prepare(adj))
    println(s"[scaleprobe] n=${deg.count()} arcs=$arcs")

    var steps = 0L
    var maskEdges = 0L
    var last = System.nanoTime()
    val t0 = System.nanoTime()
    val sources = deg.orderBy("id").limit(pivots).select(col("id").as("pivot"))
    t("bfs+harmonic") {
      BitsetBfs.harmonic(spark, adj, sources, prep = bprep,
        maskCols = maskColsArg.getOrElse(math.min(16, (pivots + 63) / 64)),
        onSuperstep = (d, fs) => {
          steps += 1
          val now = System.nanoTime()
          println(f"[scaleprobe] superstep $d: ${(now - last) / 1e9}%.2fs frontier=$fs")
          last = now
        },
        onWaveVisited = (_, vis) => {
          val bits = vis.columns.filter(_ != "id")
            .map(c => expr(s"bit_count($c)").cast("long")).reduce(_ + _)
          maskEdges += vis.join(deg, "id")
            .agg(coalesce(sum(col("degree") * bits), lit(0L))).head().getLong(0)
        }).count()
    }
    val edges = maskEdges
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[scaleprobe] cores=$cores n=$n pivots=$pivots sec=$sec%.1f steps=$steps edges=$edges eps=${edges / sec}%.0f")
    spark.stop()
  }
}
