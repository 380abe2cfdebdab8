package graft.algo

import graft.core.{Materializer, LocalMaterializer}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Bitset multi-source BFS — the scale path for many-pivot visits.
  *
  * [[MultiBfs.run]] carries one row per (pivot, vertex): P pivots over an
  * m-arc graph shuffle O(P·m) message rows per full visit. This variant
  * packs pivots into Long bitmasks — `maskCols` columns of 64 bits each, so
  * up to 64·maskCols pivots advance in ONE wave whose per-superstep message
  * volume is Σ deg(frontier) ROWS (mask payload, not row fan-out): the
  * shuffle is smaller by up to the pivot count. More pivots than a wave
  * holds → sequential waves.
  *
  * Semantically identical to the reference's per-source BFS
  * (GeometricCentralities.java:151-207): bit b of mask column j set on
  * vertex v at superstep d  ⇔  d(pivot_{j·64+b}, v) = d. The final
  * [[dist]] relation explodes masks back to (pivot, id, dist) rows —
  * once, after the iteration, not per superstep.
  *
  * All kernels are built-in codegen'd expressions: bit_or aggregate,
  * bitwise AND/XOR, `filter(sequence(0,63), ...)` for bit explode.
  */
object BitsetBfs {

  /** @param adjacency output of Graph.adjacency over SYMMETRIZED edges,
    *                  persisted by the caller.
    * @param pivots    one column `pivot: Long`.
    * @param maskCols  Long mask columns per wave (64 pivots each).
    * @return Dist(pivot, id, dist) — same relation as [[MultiBfs.run]].
    */
  def run(
      spark: SparkSession,
      adjacency: DataFrame,
      pivots: DataFrame,
      maskCols: Int = 16,
      maxIter: Int = 256,
      mat: Materializer = new LocalMaterializer(window = 0),
      onSuperstep: (Int, Long) => Unit = (_, _) => ()): DataFrame = {

    val waveBits = 64L * maskCols
    val ms = (0 until maskCols).map(j => s"m$j")

    // deterministic pivot numbering: idx → (wave, column, bit)
    val idx = pivots
      .select(col("pivot").cast("long").as("pivot")).distinct()
      .withColumn("idx", row_number().over(Window.orderBy("pivot")).cast("long") - 1)
      .withColumn("wave", (col("idx") / waveBits).cast("int"))
      .withColumn("mcol", ((col("idx") % waveBits) / 64).cast("int"))
      .withColumn("mbit", (col("idx") % 64).cast("int"))
      .localCheckpoint(true)
    val nWaves = idx.agg(coalesce(max("wave"), lit(-1))).head().getInt(0) + 1

    def nonZero(cols: Seq[String]): Column =
      cols.map(c => col(c) =!= 0L).reduce(_ || _)

    var waves = Vector.empty[DataFrame] // per-wave dist extraction results
    for (w <- 0 until nWaves) {
      // init: vertex = pivot, its own bit set, dist 0
      val init0 = idx.where(col("wave") === w).select(
        col("pivot").as("id") +:
          ms.zipWithIndex.map { case (m, j) =>
            when(col("mcol") === j, expr("shiftleft(CAST(1 AS BIGINT), mbit)"))
              .otherwise(0L).as(m)
          }: _*)
      // a vertex can be several pivots only across waves, never within (idx distinct)
      var frontier = mat.iterate(init0.withColumn("dist", lit(0)), 0, -1.0)
      var visited = frontier.select((col("id") +: ms.map(col)): _*)
      var increments = Vector(frontier)
      var d = 0
      var frontierRows = frontier.count()

      while (frontierRows > 0 && d < maxIter) {
        d += 1
        val cand = frontier
          .join(adjacency, frontier("id") === adjacency("src"))
          .select(explode(col("neighbors")).as("id") +: ms.map(col): _*)
          .groupBy("id")
          .agg(bit_or(col(ms.head)).as(ms.head),
            ms.tail.map(m => bit_or(col(m)).as(m)): _*)
        val vis = visited.select(
          col("id") +: ms.map(m => col(m).as(s"v_$m")): _*)
        val newly = cand
          .join(vis, Seq("id"), "left")
          .select(col("id") +: ms.map { m =>
            col(m).bitwiseAND(coalesce(col(s"v_$m"), lit(0L)).bitwiseXOR(lit(-1L))).as(m)
          }: _*)
          .where(nonZero(ms))
        val inc = mat.iterate(newly.withColumn("dist", lit(d)), d, frontierRows.toDouble)
        frontier = inc
        frontierRows = frontier.count()
        if (frontierRows > 0) {
          increments :+= inc
          // visited ∪ newly: unionAll + bit_or groupBy, NOT an outer join —
          // union stats ADD while join stats MULTIPLY, and localCheckpoint
          // inherits originStats, so a visited⋈newly(⊃visited) merge would
          // square sizeInBytes every superstep (STATS DISCIPLINE — see
          // PageRank). n rows either way: cheap next to the message stage.
          visited = mat.iterate(
            visited.select((col("id") +: ms.map(col)): _*)
              .unionAll(inc.select((col("id") +: ms.map(col)): _*))
              .groupBy("id")
              .agg(bit_or(col(ms.head)).as(ms.head),
                ms.tail.map(m => bit_or(col(m)).as(m)): _*),
            d, frontierRows.toDouble)
        }
        onSuperstep(d, frontierRows)
      }

      // explode masks → (pivot, id, dist), joined back through the idx map
      val bitsOf = (m: String) =>
        expr(s"filter(sequence(0, 63), b -> (shiftright($m, b) & 1) = 1)")
      val exploded = increments.map { inc =>
        ms.zipWithIndex.map { case (m, j) =>
          inc.where(col(m) =!= 0L)
            .select(col("id"), col("dist"),
              explode(bitsOf(m)).as("mbit"))
            .withColumn("mcol", lit(j))
        }.reduce(_ unionAll _)
      }.reduce(_ unionAll _)
      waves :+= exploded
        .join(idx.where(col("wave") === w), Seq("mcol", "mbit"))
        .select(col("pivot"), col("id"), col("dist"))
    }

    if (waves.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("pivot LONG, id LONG, dist INT"))
    else waves.reduce(_ unionAll _)
  }
}
