package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.algo.BitsetBfs
import graft.core.{LocalMaterializer, Materializer}

/** Diagnostic A/B harness for the shuffle-partition multiplier (not part of
  * the driver contract): replay the join-form BFS superstep loop alternating
  * `spark.sql.shuffle.partitions` = 1×cores and 2×cores IN THE SAME SESSION,
  * so host drift hits both settings alike (round-3 advice: 4× was measured
  * worse, 1× never probed). Each multiplier gets its own adjacency persist +
  * dense verts checkpoint at that partition count — co-partitioning of the
  * state⟕msgs merge only holds when state, messages and adjacency agree on
  * the count. Usage: runMain graft.tools.MultProbe <cores> <pivots> <reps>
  * [selfpin] (adjacency parquet from SPARK_GRAFT_ADJ_DIR).
  */
object MultProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).map(_.toInt).getOrElse(8)
    val pivots = args.lift(1).map(_.toInt).getOrElse(512)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val selfPin = args.lift(3).contains("selfpin")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def strip(df: DataFrame): DataFrame =
      org.apache.spark.sql.graft.CheckpointStats.strip(df)

    if (selfPin) {
      val pid = ProcessHandle.current().pid()
      val rc = new ProcessBuilder("taskset", "-apc", s"0-${cores - 1}", pid.toString)
        .redirectOutput(ProcessBuilder.Redirect.DISCARD)
        .redirectError(ProcessBuilder.Redirect.DISCARD)
        .start().waitFor()
      println(s"[multprobe] selfpin to 0-${cores - 1}: rc=$rc")
    }

    val adjDir = sys.env("SPARK_GRAFT_ADJ_DIR")
    val maskCols = math.min(16, (pivots + 63) / 64)
    val ms = (0 until maskCols)
    val nsC = ms.map(j => s"n$j")
    val vsC = ms.map(j => s"v$j")
    def nonZero(cols: Seq[String]) = cols.map(c => col(c) =!= 0L).reduce(_ || _)

    // per-mult graph state, each at its own partition count
    case class Prep(mult: Int, adj: DataFrame, init0: DataFrame)
    val preps = Seq(2, 1).map { mult =>
      val parts = mult * cores
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val adj = spark.read.parquet(adjDir).repartition(parts, col("src")).persist()
      adj.count()
      val verts = adj.select(col("src").as("id")).distinct().localCheckpoint(true)
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
      Prep(mult, adj, init0)
    }

    def runLoop(p: Prep): Double = {
      spark.conf.set("spark.sql.shuffle.partitions", (p.mult * cores).toString)
      val mat = new LocalMaterializer(window = 2)
      val t0 = System.nanoTime()
      var (state, frontierRows) = {
        val (s0, r0) = mat.iterateCountedWhere(p.init0, 0, -1.0, nonZero(nsC))
        (strip(s0), r0)
      }
      var d = 0
      var checkSum = 0L
      while (frontierRows > 0 && d < 16) {
        d += 1
        val next = BitsetBfs.superstep(state, p.adj, maskCols)
        val (st, cnt) = mat.iterateCountedWhere(next, d, frontierRows.toDouble, nonZero(nsC))
        state = strip(st)
        frontierRows = cnt
        checkSum += cnt
      }
      Materializer.unpersistCheckpoint(state)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[multprobe] mult=${p.mult} loop: $sec%.2fs (frontier-sum=$checkSum)")
      sec
    }

    var times = Map(1 -> Vector.empty[Double], 2 -> Vector.empty[Double])
    preps.foreach(runLoop) // untimed codegen warmup of both plans
    for (_ <- 1 to reps; p <- preps)
      times += p.mult -> (times(p.mult) :+ runLoop(p))
    println(f"[multprobe] SUMMARY cores=$cores pivots=$pivots " +
      f"mult2_min=${times(2).min}%.2f mult1_min=${times(1).min}%.2f " +
      f"mult2=${times(2).map(s => f"$s%.1f").mkString(",")} mult1=${times(1).map(s => f"$s%.1f").mkString(",")}")
    spark.stop()
  }
}
