package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.algo.BitsetBfs
import graft.core.{LocalMaterializer, Materializer}

/** Diagnostic A/B harness for superstep unrolling (not part of the driver
  * contract): replay the join-form BFS loop alternating U=1 (one materialized
  * checkpoint + count + driver roundtrip per superstep) and U=2 (two chained
  * supersteps per materialization) IN THE SAME SESSION. The U=2 composition
  * here drops the intermediate newly-bits from the output (the real
  * implementation must carry them for the harmonic histogram, +maskCols
  * columns), so this measures the best case of the unroll's fixed-cost and
  * state-checkpoint-traffic savings.
  * Usage: runMain graft.tools.UnrollProbe <cores> <pivots> <reps> [selfpin]
  * (adjacency parquet from SPARK_GRAFT_ADJ_DIR).
  */
object UnrollProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).map(_.toInt).getOrElse(8)
    val pivots = args.lift(1).map(_.toInt).getOrElse(512)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val selfPin = args.lift(3).contains("selfpin")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def strip(df: DataFrame): DataFrame =
      org.apache.spark.sql.graft.CheckpointStats.strip(df)

    if (selfPin) {
      val pid = ProcessHandle.current().pid()
      new ProcessBuilder("taskset", "-apc", s"0-${cores - 1}", pid.toString)
        .redirectOutput(ProcessBuilder.Redirect.DISCARD)
        .redirectError(ProcessBuilder.Redirect.DISCARD)
        .start().waitFor()
      println(s"[unrollprobe] selfpin to 0-${cores - 1}")
    }

    val adjDir = sys.env("SPARK_GRAFT_ADJ_DIR")
    val adj = spark.read.parquet(adjDir).repartition(col("src")).persist()
    adj.count()
    val verts = adj.select(col("src").as("id")).distinct().localCheckpoint(true)

    val maskCols = math.min(16, (pivots + 63) / 64)
    val ms = (0 until maskCols)
    val nsC = ms.map(j => s"n$j")
    val vsC = ms.map(j => s"v$j")
    def nonZero(cols: Seq[String]) = cols.map(c => col(c) =!= 0L).reduce(_ || _)

    val pivots0 = verts.orderBy("id").limit(pivots)
      .select(col("id"),
        (monotonically_increasing_id() % 64).as("mbit"),
        (monotonically_increasing_id() / 64).cast("int").as("mcol"))
      .localCheckpoint(true)
    val masks0 = ms.map { j =>
      when(col("mcol") === j, expr("shiftleft(CAST(1 AS BIGINT), CAST(mbit AS INT))")).otherwise(0L)
    }
    val pv = pivots0.select(
      col("id") +: (nsC.zip(masks0).map { case (n, m) => m.as(n) } ++
        vsC.zip(masks0).map { case (v, m) => m.as(v) }): _*)
    val init0 = verts.join(broadcast(pv), Seq("id"), "left")
      .select(col("id") +: (nsC ++ vsC).map(c => coalesce(col(c), lit(0L)).as(c)): _*)

    def runLoop(unroll: Int): Double = {
      val mat = new LocalMaterializer(window = 2)
      val t0 = System.nanoTime()
      var (state, frontierRows) = {
        val (s0, r0) = mat.iterateCountedWhere(init0, 0, -1.0, nonZero(nsC))
        (strip(s0), r0)
      }
      var d = 0
      var checkSum = 0L
      var mats = 0
      while (frontierRows > 0 && d < 16) {
        var next = state
        for (_ <- 1 to unroll) next = BitsetBfs.superstep(next, adj, maskCols)
        d += unroll
        val (st, cnt) = mat.iterateCountedWhere(next, d, frontierRows.toDouble, nonZero(nsC))
        state = strip(st)
        frontierRows = cnt
        checkSum += cnt
        mats += 1
      }
      Materializer.unpersistCheckpoint(state)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[unrollprobe] U=$unroll loop: $sec%.2fs (mats=$mats last-frontier-sum=$checkSum)")
      sec
    }

    var times = Map(1 -> Vector.empty[Double], 2 -> Vector.empty[Double])
    runLoop(1); runLoop(2) // untimed codegen warmup
    for (_ <- 1 to reps; u <- Seq(1, 2))
      times += u -> (times(u) :+ runLoop(u))
    println(f"[unrollprobe] SUMMARY cores=$cores pivots=$pivots " +
      f"u1_min=${times(1).min}%.2f u2_min=${times(2).min}%.2f " +
      f"u1=${times(1).map(s => f"$s%.1f").mkString(",")} u2=${times(2).map(s => f"$s%.1f").mkString(",")}")
    spark.stop()
  }
}
