package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.BitsetBfs
import scala.collection.mutable

/** Diagnostic (not part of the driver contract): decompose WHERE the scaling
  * legs lose their 4x. Runs the leg workload (join-form bitset harmonic) at
  * each requested core count, alternating, with a task/stage listener, and
  * prints per-leg:
  *
  *   - utilization  = sum(task runtime) / (wall * cores) — low at hi cores
  *     means scheduling holes / stragglers, not slow tasks;
  *   - cpu/run      = executorCpuTime / executorRunTime — a DROP at hi cores
  *     is memory-stall inflation (DRAM contention), invisible to wall-clock;
  *   - gc share, shuffle bytes+records written/read — record-count asymmetry
  *     across core counts is the map-side-combine effect (partitions are
  *     proportional to cores, so the hi leg's partial aggregation sees fewer
  *     rows per map task and dedups less);
  *   - the top stages by wall with per-stage straggler ratio max/mean.
  *
  * Usage: runMain graft.tools.StageProbe <pivots> <reps> <cores...>
  * (adjacency parquet from SPARK_GRAFT_ADJ_DIR; defaults 512 2 2 8).
  */
object StageProbe {

  private final class Rec {
    var tasks = 0L
    var run = 0L; var cpu = 0L; var gc = 0L
    var maxRun = 0L
    var swBytes = 0L; var swRecs = 0L
    var srBytes = 0L; var srRecs = 0L
    var wall = 0L
  }

  def main(args: Array[String]): Unit = {
    val pivots = args.lift(0).map(_.toInt).getOrElse(512)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val coresList = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(2, 8)
    val adjDir = sys.env("SPARK_GRAFT_ADJ_DIR")
    val maskCols = math.min(16, (pivots + 63) / 64)

    def pin(n: Int): Unit = {
      new ProcessBuilder("taskset", "-apc", s"0-${n - 1}",
        ProcessHandle.current().pid().toString)
        .redirectOutput(ProcessBuilder.Redirect.DISCARD)
        .redirectError(ProcessBuilder.Redirect.DISCARD)
        .start().waitFor()
      ()
    }

    def leg(cores: Int): Unit = {
      pin(cores)
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      try {
        val byStage = mutable.Map.empty[Int, Rec]
        var collecting = false
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
            if (collecting && t.taskMetrics != null) {
              val r = byStage.getOrElseUpdate(t.stageId, new Rec)
              val m = t.taskMetrics
              r.tasks += 1
              r.run += m.executorRunTime; r.cpu += m.executorCpuTime / 1000000
              r.gc += m.jvmGCTime
              r.maxRun = math.max(r.maxRun, m.executorRunTime)
              r.swBytes += m.shuffleWriteMetrics.bytesWritten
              r.swRecs += m.shuffleWriteMetrics.recordsWritten
              r.srBytes += m.shuffleReadMetrics.totalBytesRead
              r.srRecs += m.shuffleReadMetrics.recordsRead
            }
          }
          override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
            if (collecting) {
              val r = byStage.getOrElseUpdate(s.stageInfo.stageId, new Rec)
              r.wall = (for {
                a <- s.stageInfo.completionTime; b <- s.stageInfo.submissionTime
              } yield a - b).getOrElse(0L)
            }
          }
        })

        // untimed prep: load + partition + persist the graph, warm codegen
        val adj = spark.read.parquet(adjDir).repartition(col("src")).persist()
        adj.count()
        val deg = adj.select(col("src").as("id"), col("degree")).distinct().localCheckpoint(true)
        val bprep = BitsetBfs.prepare(adj)
        val sources = deg.orderBy("id").limit(pivots).select(col("id").as("pivot"))
          .localCheckpoint(true)

        Thread.sleep(300)
        collecting = true
        val t0 = System.nanoTime()
        BitsetBfs.harmonic(spark, adj, sources, maskCols = maskCols, prep = bprep)
          .agg(sum("harmonic")).head().getDouble(0)
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        collecting = false

        val all = byStage.values.toSeq
        val run = all.map(_.run).sum / 1e3
        val cpu = all.map(_.cpu).sum / 1e3
        val gc = all.map(_.gc).sum / 1e3
        val swB = all.map(_.swBytes).sum / 1e6; val swR = all.map(_.swRecs).sum
        val srB = all.map(_.srBytes).sum / 1e6; val srR = all.map(_.srRecs).sum
        println(f"[stageprobe] cores=$cores wall=$wall%.2fs util=${run / (wall * cores)}%.3f " +
          f"cpu/run=${cpu / run}%.3f gc=${gc / run}%.3f " +
          f"shufW=${swB}%.0fMB/${swR} shufR=${srB}%.0fMB/${srR} taskSec=$run%.1f")
        byStage.toSeq.sortBy(-_._2.wall).take(6).foreach { case (id, r) =>
          val mean = if (r.tasks > 0) r.run.toDouble / r.tasks else 0.0
          println(f"[stageprobe]   stage=$id%4d wall=${r.wall / 1e3}%6.2fs tasks=${r.tasks}%3d " +
            f"straggler=${if (mean > 0) r.maxRun / mean else 0.0}%.2f " +
            f"cpu/run=${if (r.run > 0) r.cpu.toDouble / r.run else 0.0}%.3f " +
            f"gc=${if (r.run > 0) r.gc.toDouble / r.run else 0.0}%.3f " +
            f"cpuSec=${r.cpu / 1e3}%.1f swRecs=${r.swRecs} srRecs=${r.srRecs}")
        }
      } finally {
        spark.stop()
        pin(Runtime.getRuntime.availableProcessors())
      }
    }

    coresList.foreach(leg) // warmup pass (JIT, page cache) — discard
    println("[stageprobe] --- measured passes ---")
    for (_ <- 1 to reps) coresList.foreach(leg)
  }
}
