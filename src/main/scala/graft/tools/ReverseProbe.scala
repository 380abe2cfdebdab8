package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Graph
import graft.algo.BitsetBfs
import graft.data.Synth

/** Ad-hoc probe (not part of the driver contract): time the ESTIMATOR
  * reverse pass — [[BitsetBfs.reverseSum]]/[[BitsetBfs.reverseMax]] —
  * against the bitset visit that feeds it, at the scaling-leg size.
  * Round-4 verdict #5 asked whether the old interpreted
  * (`CodegenFallback`) higher-order `aggregate` fold was material: it was
  * (96.8 s vs the 28.7 s visit, n=2M, 512 pivots, 8 cores), so the fold is
  * now a codegen'd byte-LUT — this probe measured both sides of that A/B
  * (BASELINE.md round 5).
  * Usage: runMain graft.tools.ReverseProbe <cores> <nVertices> <pivots>
  */
object ReverseProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).map(_.toInt).getOrElse(8)
    val n = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val pivots = args.lift(2).map(_.toInt).getOrElse(512)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",
        (sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "1").toInt * cores).toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[reverseprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      a
    }

    val adjDir = sys.env.get("SPARK_GRAFT_ADJ_DIR")
    val adj = t("build") {
      adjDir match {
        case Some(d) if java.nio.file.Files.exists(java.nio.file.Paths.get(d)) =>
          spark.read.parquet(d).repartition(col("src")).persist()
        case _ => Graph.adjacency(Graph.symmetrize(Synth.edges(spark, n))).persist()
      }
    }
    val deg = adj.select(col("src").as("id"), col("degree")).distinct().localCheckpoint(true)
    val prep = t("prep")(BitsetBfs.prepare(adj))
    val sources = deg.orderBy("id").limit(pivots).select(col("id").as("pivot"))
    val mc = math.min(16, (pivots + 63) / 64)
    // the visit that feeds the estimators — same shape as the scaling leg
    val visit = t("visit (waves)") {
      BitsetBfs.visit(spark, adj, sources, maskCols = mc, prep = prep)
    }
    // Horvitz–Thompson shape: every pivot with a nonzero divisor (the real
    // estimator divides by keep-probabilities / farness — any nonzero
    // double exercises the identical plan)
    val divisors = sources.withColumn("div", col("pivot").cast("double") + lit(1.0))
    val rsum = t("reverseSum") {
      BitsetBfs.reverseSum(visit, divisors).agg(sum("value")).head().getDouble(0)
    }
    val rmax = t("reverseMax") {
      BitsetBfs.reverseMax(visit, divisors).agg(sum("value")).head().getDouble(0)
    }
    println(f"[reverseprobe] cores=$cores n=$n pivots=$pivots checksum sum=$rsum%.3f max=$rmax%.3f")
    visit.release()
    prep.release()
    spark.stop()
  }
}
