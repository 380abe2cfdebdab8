package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Graph
import graft.algo.{MultiBfs, BitsetBfs, PageRank, Geometric}

/** Ad-hoc perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    val rnd = new scala.util.Random(4)
    val edges = (for { i <- 0 until 60; j <- (i + 1) until 60 if rnd.nextDouble() < 0.08 }
      yield (i.toLong, j.toLong)).toSeq
    val sym = Graph.symmetrize(edges.toDF("src", "dst"))
    val adj = Graph.adjacency(sym).cache()
    adj.count()

    args.headOption.getOrElse("all") match {
      case "pr" => t("pagerank_200") {
        PageRank.run(spark, adj, maxIter = 200, tol = 1e-9).ranks.count()
      }
      case "pr50" => t("pagerank_50") {
        PageRank.run(spark, adj, maxIter = 50, tol = 1e-9).ranks.count()
      }
      case "priter" => {
        var last = System.nanoTime()
        PageRank.run(spark, adj, maxIter = 30, tol = 1e-9,
          onSuperstep = (i, d) => {
            val now = System.nanoTime()
            println(f"iter $i: ${(now - last) / 1e9}%.2fs delta=$d%.2e")
            last = now
          }).ranks.count()
      }
      case "bitset" => t("bitset_40") {
        BitsetBfs.run(spark, adj, (0L until 40L).toDF("pivot"), maskCols = 1).count()
      }
      case "rowbfs" => t("rowbfs_40") {
        MultiBfs.run(spark, adj, (0L until 40L).toDF("pivot")).count()
      }
      case "bitsetpath" => t("bitset_path300") {
        // 300-superstep BFS: detects any per-superstep stats/plan compounding
        val pe = (0L until 299L).map(i => (i, i + 1))
        val padj = Graph.adjacency(Graph.symmetrize(pe.toDF("src", "dst"))).cache()
        padj.count()
        var last = System.nanoTime()
        BitsetBfs.run(spark, padj, Seq(0L).toDF("pivot"), maskCols = 1,
          maxIter = 400,
          onSuperstep = (d, _) => if (d % 50 == 0) {
            val now = System.nanoTime()
            println(f"  superstep $d: +${(now - last) / 1e9}%.1fs")
            last = now
          }).count()
      }
      case "rowpath" => t("row_path300") {
        val pe = (0L until 299L).map(i => (i, i + 1))
        val padj = Graph.adjacency(Graph.symmetrize(pe.toDF("src", "dst"))).cache()
        padj.count()
        var last = System.nanoTime()
        MultiBfs.run(spark, padj, Seq(0L).toDF("pivot"), maxIter = 400,
          onSuperstep = (d, _) => if (d % 50 == 0) {
            val now = System.nanoTime()
            println(f"  superstep $d: +${(now - last) / 1e9}%.1fs")
            last = now
          }).count()
      }
      case "cc" => t("cc_path300") {
        val pe = (0L until 299L).map(i => (i, i + 1))
        val padj = Graph.adjacency(Graph.symmetrize(pe.toDF("src", "dst"))).cache()
        padj.count()
        graft.algo.Components.run(spark, padj, maxIter = 400).labels.count()
      }
      case _ => ()
    }
    spark.stop()
  }
}
