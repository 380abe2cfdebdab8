package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.BitsetBfs

/** Diagnostic (not part of the driver contract): run ONE bitset-harmonic leg
  * job with a SparkListener recording per-job cluster time, and print the
  * driver-side GAPS between consecutive jobs — plan analysis, codegen
  * compile, broadcast builds, checkpoint bookkeeping. The gaps are the
  * per-superstep fixed cost that caps N→4N scaling efficiency; the job
  * bodies are the part that actually parallelizes.
  * Usage: runMain graft.tools.JobProbe <cores> <pivots> [selfpin]
  * (adjacency parquet from SPARK_GRAFT_ADJ_DIR).
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).map(_.toInt).getOrElse(8)
    val pivots = args.lift(1).map(_.toInt).getOrElse(512)
    val selfPin = args.lift(2).contains("selfpin")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (selfPin) {
      val pid = ProcessHandle.current().pid()
      new ProcessBuilder("taskset", "-apc", s"0-${cores - 1}", pid.toString)
        .redirectOutput(ProcessBuilder.Redirect.DISCARD)
        .redirectError(ProcessBuilder.Redirect.DISCARD)
        .start().waitFor()
    }

    // (jobId, startNs-ish wall ms, endNs wall ms)
    var jobs = Vector.empty[(Int, Long, Long)]
    var starts = Map.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { starts += j.jobId -> j.time }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        synchronized { jobs :+= ((j.jobId, starts.getOrElse(j.jobId, j.time), j.time)) }
    })

    val adjDir = sys.env("SPARK_GRAFT_ADJ_DIR")
    val adj = spark.read.parquet(adjDir).repartition(col("src")).persist()
    adj.count()
    val deg = adj.select(col("src").as("id"), col("degree")).distinct().localCheckpoint(true)
    val bprep = BitsetBfs.prepare(adj)

    // settle the listener, then mark the leg-job region
    Thread.sleep(500)
    val mark = synchronized { jobs.size }
    val t0 = System.currentTimeMillis()
    var stepAt = Vector.empty[(Int, Long)] // (superstep d, wall ms at tick)
    val sources = deg.orderBy("id").limit(pivots).select(col("id").as("pivot"))
    BitsetBfs.harmonic(spark, adj, sources,
      maskCols = math.min(16, (pivots + 63) / 64),
      onSuperstep = (d, _) => stepAt :+= ((d, System.currentTimeMillis())),
      prep = bprep).count()
    val t1 = System.currentTimeMillis()
    Thread.sleep(500) // let the listener bus drain

    val legJobs = jobs.drop(mark).sortBy(_._2)
    println(f"[jobprobe] cores=$cores pivots=$pivots wall=${(t1 - t0) / 1e3}%.2fs jobs=${legJobs.size}")
    var prevEnd = t0
    var gapSum = 0L
    var runSum = 0L
    legJobs.foreach { case (id, s, e) =>
      val gap = math.max(0L, s - prevEnd)
      gapSum += gap
      runSum += (e - s)
      val step = stepAt.collectFirst { case (d, ts) if ts >= s && ts <= e + 50 => d }
      println(f"[jobprobe] job=$id%3d gap_before=${gap / 1e3}%6.2fs run=${(e - s) / 1e3}%6.2fs" +
        step.map(d => s" <= superstep $d").getOrElse(""))
      prevEnd = math.max(prevEnd, e)
    }
    println(f"[jobprobe] TOTAL gaps=${gapSum / 1e3}%.2fs runs=${runSum / 1e3}%.2fs wall=${(t1 - t0) / 1e3}%.2fs")
    spark.stop()
  }
}
