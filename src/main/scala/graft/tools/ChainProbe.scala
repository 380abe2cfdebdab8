package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.algo.BitsetBfs

/** Diagnostic A/B harness for LAZY superstep chaining (not part of the driver
  * contract): run the real scaling-leg workload (`BitsetBfs.harmonic`, join
  * form) alternating chain values IN THE SAME SESSION, so host drift hits
  * both arms alike. Unlike [[UnrollProbe]] (eager plan composition, measured
  * slower because the intermediate superstep recomputed under two consumers),
  * this exercises the committed chained path: each intermediate is a lazy
  * localCheckpoint that persists the first time the chunk's one
  * union-multicount job computes it — U supersteps per job submission.
  * Usage: runMain graft.tools.ChainProbe <cores> <pivots> <reps> [chains...]
  * (adjacency parquet from SPARK_GRAFT_ADJ_DIR; chains default 1 4).
  */
object ChainProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).map(_.toInt).getOrElse(8)
    val pivots = args.lift(1).map(_.toInt).getOrElse(512)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val chains = if (args.length > 3) args.drop(3).map(_.toInt).toSeq else Seq(1, 4)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val pid = ProcessHandle.current().pid()
    new ProcessBuilder("taskset", "-apc", s"0-${cores - 1}", pid.toString)
      .redirectOutput(ProcessBuilder.Redirect.DISCARD)
      .redirectError(ProcessBuilder.Redirect.DISCARD)
      .start().waitFor()
    println(s"[chainprobe] selfpin to 0-${cores - 1}")

    val adjDir = sys.env("SPARK_GRAFT_ADJ_DIR")
    val adj = spark.read.parquet(adjDir).repartition(col("src")).persist()
    adj.count()
    val deg = adj.select(col("src").as("id"), col("degree")).distinct().localCheckpoint(true)
    val bprep = BitsetBfs.prepare(adj)
    val sources = deg.orderBy("id").limit(pivots).select(col("id").as("pivot")).localCheckpoint(true)
    val maskCols = math.min(16, (pivots + 63) / 64)

    def runLeg(chain: Int): Double = {
      var steps = 0
      val t0 = System.nanoTime()
      val h = BitsetBfs.harmonic(spark, adj, sources, maskCols = maskCols,
        onSuperstep = (_, _) => steps += 1, prep = bprep, chain = chain)
      val chk = h.agg(sum("harmonic")).head().getDouble(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[chainprobe] chain=$chain: $sec%.2fs (steps=$steps checksum=$chk%.4f)")
      sec
    }

    var times = chains.map(_ -> Vector.empty[Double]).toMap
    chains.foreach(runLeg) // untimed codegen warmup
    for (_ <- 1 to reps; c <- chains)
      times += c -> (times(c) :+ runLeg(c))
    val summary = chains.map { c =>
      f"c${c}_min=${times(c).min}%.2f c$c=${times(c).map(s => f"$s%.1f").mkString(",")}"
    }.mkString(" ")
    println(s"[chainprobe] SUMMARY cores=$cores pivots=$pivots $summary")
    spark.stop()
  }
}
