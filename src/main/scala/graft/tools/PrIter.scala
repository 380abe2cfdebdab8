package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Graph
import graft.data.Tpch
import graft.algo.PageRank

/** Dev probe: per-iteration timing of the bench PageRank (tol 1e-6) on the
  * sf bipartite graph — how many supersteps, where the time goes, and the
  * chain-length A/B. Args: [sfDir] [chain] [reps]
  */
object PrIter {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val chain = args.lift(1).map(_.toInt).getOrElse(graft.core.Materializer.DefaultChain)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val adj = Graph.adjacency(Graph.symmetrize(Tpch.bipartiteEdges(spark, dir))).persist()
    adj.count()
    (1 to reps).foreach { r =>
      var iters = 0
      var last = System.nanoTime()
      var segs = Vector.empty[Double]
      val t0 = System.nanoTime()
      val res = PageRank.run(spark, adj, damping = 0.85, maxIter = 200, tol = 1e-6,
        mat = new graft.core.LocalMaterializer(window = math.max(chain, 2)),
        onSuperstep = (i, d) => {
          iters = i
          val now = System.nanoTime()
          segs :+= (now - last) / 1e9
          last = now
        }, chain = chain)
      res.ranks.count()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"[priter] rep $r chain=$chain: $total%.2f s, iters=$iters, per-iter=[${segs.map(s => f"$s%.2f").mkString(",")}]")
    }
    spark.stop()
  }
}
