package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.algo.BitsetBfs
import graft.core.{LocalMaterializer, Materializer}

/** Diagnostic A/B harness for the bitset superstep form (not part of the
  * driver contract): replay the BFS superstep loop on a prebuilt adjacency,
  * alternating the dense join-form ([[BitsetBfs.superstep]]) and the sparse
  * union+groupBy form (round-3/4 committed shape) IN THE SAME SESSION, so
  * host-window drift — which this box exhibits at 2x over tens of minutes —
  * hits both forms alike. Prints per-loop totals; pass `reps` alternations.
  * Usage: runMain graft.tools.StepProbe <cores> <pivots> <reps> [selfpin]
  * (adjacency from SPARK_GRAFT_ADJ_DIR).
  */
object StepProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).map(_.toInt).getOrElse(8)
    val pivots = args.lift(1).map(_.toInt).getOrElse(512)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    // selfpin: start the JVM unpinned (32-wide), then taskset -apc onto the
    // first `cores` CPUs — the Bench leg regime
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
      println(s"[stepprobe] selfpin to 0-${cores - 1}: rc=$rc")
    }

    val adjDir = sys.env("SPARK_GRAFT_ADJ_DIR")
    val adj = spark.read.parquet(adjDir).repartition(col("src")).persist()
    adj.count()
    val verts = adj.select(col("src").as("id")).distinct().localCheckpoint(true)

    val maskCols = math.min(16, (pivots + 63) / 64)
    val ms = (0 until maskCols)
    val nsC = ms.map(j => s"n$j")
    val vsC = ms.map(j => s"v$j")
    val msNames = ms.map(j => s"m$j")
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

    // dense init (used by BOTH forms here: the union form's extra all-zero
    // rows cost it the supersteps-1-2 state scan the sparse original skips;
    // from the frontier peak — where all the time goes — the forms carry the
    // same rows)
    val init0 = verts.join(broadcast(pv), Seq("id"), "left")
      .select(col("id") +: (nsC ++ vsC).map(c => coalesce(col(c), lit(0L)).as(c)): _*)

    // the round-3/4 committed sparse union+groupBy superstep; the frontier
    // side carries the same shuffle_hash hint the join form uses, because the
    // stripped state's unknown stats would otherwise fall back to SMJ here
    // (the committed BitsetBfs runs unstripped and picks SHJ from real stats)
    def unionStep(state: DataFrame): DataFrame = {
      val frontier = state.where(nonZero(nsC)).hint("shuffle_hash")
      val msgs = frontier
        .join(adj, frontier("id") === adj("src"))
        .select(explode(col("neighbors")).as("id") +: lit(0).as("tag") +:
          nsC.zip(msNames).map { case (n, m) => col(n).as(m) }: _*)
      val old = state.select(
        col("id") +: lit(1).as("tag") +:
          vsC.zip(msNames).map { case (v, m) => col(v).as(m) }: _*)
      val aggs =
        msNames.map(m => bit_or(when(col("tag") === 0, col(m)).otherwise(0L)).as(s"a_$m")) ++
        msNames.map(m => bit_or(when(col("tag") === 1, col(m)).otherwise(0L)).as(s"b_$m"))
      val comb = msgs.unionAll(old)
        .groupBy("id")
        .agg(aggs.head, aggs.tail: _*)
      comb.select(
        col("id") +:
          (msNames.zip(nsC).map { case (m, n) =>
            col(s"a_$m").bitwiseAND(col(s"b_$m").bitwiseXOR(lit(-1L))).as(n)
          } ++
          msNames.zip(vsC).map { case (m, v) =>
            col(s"a_$m").bitwiseOR(col(s"b_$m")).as(v)
          }): _*)
    }

    def runLoop(form: String): Double = {
      val mat = new LocalMaterializer(window = 2)
      val t0 = System.nanoTime()
      var (state, frontierRows) = {
        val (s0, r0) = mat.iterateCountedWhere(init0, 0, -1.0, nonZero(nsC))
        (strip(s0), r0)
      }
      var d = 0
      var checkSum = 0L
      while (frontierRows > 0 && d < 16) {
        d += 1
        val next = if (form == "union") unionStep(state) else BitsetBfs.superstep(state, adj, maskCols)
        val (st, cnt) = mat.iterateCountedWhere(next, d, frontierRows.toDouble, nonZero(nsC))
        state = strip(st)
        frontierRows = cnt
        checkSum += cnt
      }
      Materializer.unpersistCheckpoint(state)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[stepprobe] $form%-5s loop: $sec%.2fs (frontier-sum=$checkSum)")
      sec
    }

    var joins = Vector.empty[Double]
    var unions = Vector.empty[Double]
    // untimed warmup of both plans' codegen
    runLoop("join"); runLoop("union")
    for (_ <- 1 to reps) {
      joins :+= runLoop("join")
      unions :+= runLoop("union")
    }
    println(f"[stepprobe] SUMMARY cores=$cores pivots=$pivots join_min=${joins.min}%.2f union_min=${unions.min}%.2f join=${joins.map(s => f"$s%.1f").mkString(",")} union=${unions.map(s => f"$s%.1f").mkString(",")}")
    spark.stop()
  }
}
