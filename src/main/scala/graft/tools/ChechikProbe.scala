package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.Graph
import graft.data.Tpch
import graft.algo.Chechik

/** Dev probe: repped wall-clock of the flagship Chechik top-k on the sf
  * sparse graph (the bench's most steal-sensitive breadth query). Args:
  * [sfDir] [reps].
  */
object ChechikProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sadj = Graph.adjacency(Graph.symmetrize(Tpch.sparseEdges(spark, dir))).persist()
    sadj.count()
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val (topk, tel) = Chechik.topkCloseness(spark, sadj, k = 10)
      topk.count()
      println(f"[probe] rep $i: ${(System.nanoTime() - t0) / 1e9}%.1f s  sample=${tel.sampleSize} exactBfs=${tel.exactBfs} supersteps=${tel.supersteps}")
    }
    spark.stop()
  }
}
