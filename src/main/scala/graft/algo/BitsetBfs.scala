package graft.algo

import graft.core.{Materializer, LocalMaterializer}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

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
  * vertex v at superstep d  ⇔  d(pivot_{j·64+b}, v) = d.
  *
  * Superstep = ONE fused job, ONE shuffle of ONLY the message rows. State is
  * DENSE — one row per vertex, (id, n0.., v0..) where n_j are the bits newly
  * set this superstep and v_j the cumulative visited masks — and stays
  * hash(id)-partitioned across supersteps: the checkpoint captures the
  * partitioning into its `LogicalRDD` and
  * [[org.apache.spark.sql.graft.CheckpointStats.strip]] keeps it while
  * dropping the inherited stats whose join-squaring blocked this plan shape
  * in round 3. The superstep is then
  *
  *   msgs = frontier ⋈ adjacency → explode → groupBy(id).agg(a_j = bit_or(m_j))
  *   state' = state ⟕ msgs:  n_j = a_j & ~v_j,  v_j = v_j | a_j
  *
  * where the frontier⋈adjacency join is map-side (both sides already
  * hash-partitioned on the key, shuffled-hash build on the frontier), the
  * groupBy's exchange is the superstep's only shuffle — Σ deg(frontier)
  * rows, map-side bit_or combine — and the state⟕msgs merge is a
  * co-partitioned shuffled-hash join that never moves the n state rows.
  * (The round-3 union+groupBy form reshuffled n + Σ deg(frontier) rows per
  * superstep at twice the aggregate width; the n-row term was pure fixed
  * cost on every superstep past the frontier peak.) All kernels are
  * built-in codegen'd expressions: bit_or aggregate, bitwise AND/XOR/shift,
  * `filter(sequence(0,63), ...)` for bit explode.
  *
  * Two consumers:
  *  - [[run]] explodes masks back to the (pivot, id, dist) relation — once,
  *    after the iteration, not per superstep. O(P·n) output rows.
  *  - [[harmonic]] never explodes: per-bit histogram aggregation
  *    (Σ_rows ((m_j >> b) & 1)/dist, 64 sums per mask column) reduces each
  *    increment to P scalars — ONE distributed aggregate over all waves,
  *    unpivoted with `stack` and joined back to the pivot index, so neither
  *    the masks nor the per-pivot sums ever pass through the driver and the
  *    per-pivot harmonic costs O(n·maskCols) regardless of P — the 100 TB
  *    shape of "all per-source running sums become aggregates"
  *    (SURVEY.md §2.4 A3).
  */
object BitsetBfs {

  /** Handle to a completed bitset visit: pivot→(wave,mcol,mbit) index map,
    * per-superstep newly-bit mask frames (wave, dist, frame(id, m0..)) —
    * filtered projections of the cached per-superstep state — and per-wave
    * final visited mask frames. Consumed by the histogram/reverse aggregates
    * below without ever exploding to (pivot, id, dist) rows; obtain one via
    * [[visit]] and reuse it across several aggregates (one BFS, many
    * consumers — e.g. Chechik needs farness AND the λ ratio from the same
    * pivot visit).
    */
  case class Visit(
      idx: DataFrame,
      maskNames: Seq[String],
      increments: Vector[(Int, Int, DataFrame)],
      visited: Vector[(Int, DataFrame)],
      states: Vector[DataFrame]) {
    /** Free every cached superstep state frame (and the pivot index). The
      * visit's increment/visited frames are lazy projections of these states
      * and become UNUSABLE — call only after all aggregates over the visit
      * have been materialized. Without this, a long certification loop
      * (Chechik runs estimator + sample + one visit per exact batch) keeps
      * every superstep of every visit live in RAM-backed storage for the
      * whole run (round-3 advice).
      */
    def release(): Unit = {
      states.foreach(Materializer.unpersistCheckpoint(_))
      Materializer.unpersistCheckpoint(idx)
    }
  }

  private def nonZeroCols(cols: Seq[String]): Column =
    cols.map(c => col(c) =!= 0L).reduce(_ || _)

  /** ONE join-form superstep over a dense hash(id)-partitioned state
    * (id, n0.., v0..): message reduce (the superstep's only shuffle) plus the
    * co-partitioned state⟕messages merge. Exposed package-private so
    * PlanSpec can assert the physical shape — exactly one Exchange, no Sort,
    * shuffled-hash joins — on the real loop plan rather than prose.
    */
  private[graft] def superstep(state: DataFrame, adjacency: DataFrame, maskCols: Int): DataFrame = {
    val ms = (0 until maskCols).map(j => s"m$j")
    val nsC = (0 until maskCols).map(j => s"n$j")
    val vsC = (0 until maskCols).map(j => s"v$j")
    val frontier = state.where(nonZeroCols(nsC))
    // message reduce: the superstep's ONLY shuffle (Σ deg(frontier) rows,
    // map-side bit_or combine). The frontier⋈adjacency join is
    // co-partitioned (state hash(id) ≍ adjacency hash(src)) — shuffled-hash,
    // built on the frontier side: stripped state stats are
    // defaultSizeInBytes, so the hint is load-bearing (see CheckpointStats
    // scaladoc), and SMJ would re-sort the cached adjacency every superstep.
    val fr = frontier.hint("shuffle_hash")
    val msgs = fr
      .join(adjacency, fr("id") === adjacency("src"))
      .select(explode(col("neighbors")).as("id") +:
        nsC.zip(ms).map { case (n, m) => col(n).as(m) }: _*)
      .groupBy("id")
      .agg(bit_or(col(ms.head)).as(s"a_${ms.head}"),
        ms.tail.map(m => bit_or(col(m)).as(s"a_$m")): _*)
    // visited test + visited update, fused into the co-partitioned merge
    // join: both sides are hash(id)-partitioned (state via its stripped
    // checkpoint, msgs via the groupBy exchange above), so the n state rows
    // never re-shuffle; left outer keeps the state side's partitioning for
    // the NEXT superstep's checkpoint to capture.
    state.join(msgs.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id") +:
        (ms.zip(nsC.zip(vsC)).map { case (m, (n, v)) =>
          coalesce(col(s"a_$m"), lit(0L))
            .bitwiseAND(col(v).bitwiseXOR(lit(-1L))).as(n)
        } ++
        ms.zip(vsC).map { case (m, v) =>
          col(v).bitwiseOR(coalesce(col(s"a_$m"), lit(0L))).as(v)
        }): _*)
  }

  /** Supersteps materialized per job on chain-capable strategies (see
    * [[Materializer.chainCapacity]]). BFS visit state is accumulating
    * (window = 0 keeps everything until the visit's aggregates run), so
    * chaining holds no more intermediate state than the eager loop already
    * keeps. Override per call for probes/specs.
    */
  val DefaultChain: Int = Materializer.DefaultChain

  private def waves(
      spark: SparkSession,
      adjacency: DataFrame,
      pivots: DataFrame,
      maskCols: Int,
      maxIter: Int,
      mat: Materializer,
      onSuperstep: (Int, Long) => Unit,
      onWaveVisited: (Int, DataFrame) => Unit,
      vertsIn: DataFrame,
      chain: Int): Visit = {

    val waveBits = 64L * maskCols
    val ms = (0 until maskCols).map(j => s"m$j")
    val nsC = (0 until maskCols).map(j => s"n$j") // state: newly-set bits
    val vsC = (0 until maskCols).map(j => s"v$j") // state: visited bits

    // deterministic pivot numbering: idx → (wave, column, bit), ascending
    // pivot id. Two shapes with identical output:
    //  - small-P fast path (P ≤ 64k): ONE job — collect the distinct pivot
    //    ids (bounded: ≤ 0.5 MB of longs), number on the driver, hand the
    //    loop a local relation. A visit previously paid ~4 driver-gapped
    //    init jobs (rank's partition-count collect, the idx checkpoint, the
    //    nWaves aggregate) before its first superstep — per-visit fixed cost
    //    that a Chechik certification run re-pays every batch and that the
    //    scaling legs can't parallelize away (JobProbe: ~5 s of init
    //    jobs+gaps per leg at 8 cores, core-count-independent).
    //  - large-P path: distributed range minting — the Chechik sample at
    //    web scale is K·E[λ] ≈ ln(n)/ε² · E[λ] · n rows, too big to collect.
    val smallPivotCap = 65536
    val distinctPivots = pivots.select(col("pivot").cast("long").as("pivot")).distinct()
    val collected = distinctPivots.limit(smallPivotCap + 1).collect()
    val (idx, nWaves) =
      if (collected.length <= smallPivotCap) {
        val ids = collected.map(_.getLong(0)).sorted
        val sess = spark
        import sess.implicits._
        val local = ids.toSeq.zipWithIndex.map { case (p, i) =>
          (p, i.toLong, (i / waveBits).toInt, ((i % waveBits) / 64).toInt, (i % 64).toInt)
        }.toDF("pivot", "idx", "wave", "mcol", "mbit")
        (local, if (ids.isEmpty) 0 else ((ids.length - 1) / waveBits).toInt + 1)
      } else {
        val ranked = graft.core.Rank.globalRank(distinctPivots, "idx", col("pivot"))
          .withColumn("wave", (col("idx") / waveBits).cast("int"))
          .withColumn("mcol", ((col("idx") % waveBits) / 64).cast("int"))
          .withColumn("mbit", (col("idx") % 64).cast("int"))
          .localCheckpoint(true)
        (ranked, ranked.agg(coalesce(max("wave"), lit(-1))).head().getInt(0) + 1)
      }

    def nonZero(cols: Seq[String]): Column = nonZeroCols(cols)
    def newlyProj(state: DataFrame): DataFrame =
      state.where(nonZero(nsC)).select(
        col("id") +: nsC.zip(ms).map { case (n, m) => col(n).as(m) }: _*)
    def strip(df: DataFrame): DataFrame =
      org.apache.spark.sql.graft.CheckpointStats.strip(df)

    // Dense vertex frame for the join-form superstep: every vertex of the
    // (symmetrized) adjacency plus any isolated pivots, hash(id)-partitioned
    // by its own distinct — the partitioning every per-wave state inherits.
    // Built once per visit and dropped once all waves have materialized —
    // UNLESS the caller supplied one (`vertsIn`): loops that run many visits
    // over the same graph (a Chechik certification run is one visit per
    // batch) would otherwise pay an n-row distinct + checkpoint per visit.
    // A supplied frame must hold every adjacency vertex and every pivot,
    // materialized (the caller owns its lifecycle), ideally hash(id)-
    // partitioned so the one-exchange superstep shape holds from wave init.
    val verts =
      if (nWaves == 0) null
      else if (vertsIn != null) vertsIn
      else adjacency.select(col("src").as("id"))
        .unionAll(idx.select(col("pivot").as("id")))
        .distinct()
        .localCheckpoint(true)

    var incs = Vector.empty[(Int, Int, DataFrame)]
    var visitedOut = Vector.empty[(Int, DataFrame)]
    var statesAcc = Vector.empty[DataFrame]
    for (w <- 0 until nWaves) {
      // init: vertex = pivot, its own bit set (newly AND visited), dist 0;
      // all other vertices carry zero masks (dense state). The pivot side is
      // ≤ 64·maskCols rows — explicit broadcast, so the init join preserves
      // the verts partitioning.
      val masks0 = ms.indices.map { j =>
        when(col("mcol") === j, expr("shiftleft(CAST(1 AS BIGINT), mbit)"))
          .otherwise(0L)
      }
      val pivots0 = idx.where(col("wave") === w).select(
        col("pivot").as("id") +:
          (nsC.zip(masks0).map { case (n, m) => m.as(n) } ++
           vsC.zip(masks0).map { case (v, m) => m.as(v) }): _*)
      val init0 = verts.join(broadcast(pivots0), Seq("id"), "left")
        .select(col("id") +:
          (nsC ++ vsC).map(c => coalesce(col(c), lit(0L)).as(c)): _*)
      // a vertex can be several pivots only across waves, never within (idx distinct)
      // NOTE: state frames carry NO dist column — the superstep d lives in
      // the `incs` tuples. A `lit(d)` in the loop plan would change the
      // generated code every superstep (literals are inlined by codegen) and
      // force a janino recompile per superstep: measured seconds of SERIAL
      // driver time that caps N→4N scaling. The loop plan is superstep-
      // invariant, so codegen caches hit from superstep 2 on; consumers
      // attach dist from the tuple when assembling their one output plan.
      val (state0, rows0) = mat.iterateCountedWhere(init0, 0, -1.0, nonZero(nsC))
      var state = strip(state0)
      statesAcc :+= state
      incs :+= ((w, 0, newlyProj(state)))
      var d = 0
      var frontierRows = rows0
      val chainLen = math.max(1, math.min(chain, mat.chainCapacity))

      while (frontierRows > 0 && d < maxIter) {
        val u = math.min(chainLen, maxIter - d)
        if (u <= 1) {
          // eager path: one lazy-checkpoint-plus-filtered-count job per
          // superstep (also the DirMaterializer path, which wants the real
          // frontier count in each iteration's resume metadata)
          d += 1
          val next = superstep(state, adjacency, maskCols)
          val (st, cnt) = mat.iterateCountedWhere(next, d, frontierRows.toDouble, nonZero(nsC))
          state = strip(st)
          statesAcc :+= state
          frontierRows = cnt
          if (frontierRows > 0) incs :+= ((w, d, newlyProj(state)))
          onSuperstep(d, frontierRows)
        } else {
          // chained path: build u supersteps LAZILY (each localCheckpoint
          // truncates the plan immediately but materializes on first use),
          // then ONE union-multicount job computes the whole chain — the
          // stage graph covers all u message exchanges, each intermediate
          // state persists the first time a stage computes it (later
          // references hit its checkpoint blocks) — and returns every
          // substep's exact frontier count. u supersteps now cost ONE job
          // submission + driver roundtrip instead of u: JobProbe measured
          // the per-superstep driver gap at ~0.2-0.3 s, serial and
          // core-count-independent — precisely the term that caps the
          // N→4N scaling legs.
          var built = Vector.empty[DataFrame]
          var s = state
          for (k <- 1 to u) {
            val next = superstep(s, adjacency, maskCols)
            s = strip(mat.iterateDeferred(next, d + k, -1.0))
            built :+= s
          }
          val counts = built.zipWithIndex
            .map { case (st, i) => st.where(nonZero(nsC)).select(lit(i + 1).as("k")) }
            .reduce(_ unionAll _)
            .groupBy("k").agg(count(lit(1)).as("c"))
            .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
          statesAcc ++= built
          // report supersteps up to and including the first empty frontier —
          // identical telemetry to the eager loop (counts are monotone to
          // zero within a chain: an empty frontier sends no messages)
          var k = 1
          var stop = false
          while (k <= u && !stop) {
            val cnt = counts.getOrElse(k, 0L)
            if (cnt > 0) incs :+= ((w, d + k, newlyProj(built(k - 1))))
            onSuperstep(d + k, cnt)
            frontierRows = cnt
            if (cnt == 0) stop = true
            k += 1
          }
          d += u
          state = built.last
        }
      }
      // dense state carries never-visited rows (all-zero v masks) for
      // vertices unreachable from this wave's pivots — filter them so the
      // visited frame's row set matches the sparse form exactly
      val vis = state.where(nonZero(vsC)).select(
        col("id") +: vsC.zip(ms).map { case (v, m) => col(v).as(m) }: _*)
      visitedOut :+= ((w, vis))
      onWaveVisited(w, vis)
    }
    if (verts != null && vertsIn == null) graft.core.Materializer.unpersistCheckpoint(verts)
    Visit(idx, ms, incs, visitedOut, statesAcc)
  }

  /** Run the wave BFS and return the [[Visit]] handle for histogram/reverse
    * consumers. Parameters as for [[run]].
    */
  def visit(
      spark: SparkSession,
      adjacency: DataFrame,
      pivots: DataFrame,
      maskCols: Int = 16,
      maxIter: Int = 256,
      mat: Materializer = new LocalMaterializer(window = 0),
      onSuperstep: (Int, Long) => Unit = (_, _) => (),
      onWaveVisited: (Int, DataFrame) => Unit = (_, _) => (),
      verts: DataFrame = null,
      chain: Int = DefaultChain): Visit =
    waves(spark, adjacency, pivots, maskCols, maxIter, mat, onSuperstep, onWaveVisited, verts, chain)

  /** @param adjacency output of Graph.adjacency over SYMMETRIZED edges,
    *                  persisted by the caller.
    * @param pivots    one column `pivot: Long`.
    * @param maskCols  Long mask columns per wave (64 pivots each).
    * @param onWaveVisited called once per completed wave with the final
    *                  consolidated visited frame (id, m0..) — cached; lets
    *                  callers derive whole-visit aggregates (e.g.
    *                  Σ deg(v)·popcount(masks) = exact visited-arc count,
    *                  the reference's visitedArcs counter,
    *                  GeometricCentralities.java:179-181) without the explode.
    * @return Dist(pivot, id, dist) — same relation as [[MultiBfs.run]].
    */
  def run(
      spark: SparkSession,
      adjacency: DataFrame,
      pivots: DataFrame,
      maskCols: Int = 16,
      maxIter: Int = 256,
      mat: Materializer = new LocalMaterializer(window = 0),
      onSuperstep: (Int, Long) => Unit = (_, _) => (),
      onWaveVisited: (Int, DataFrame) => Unit = (_, _) => (),
      verts: DataFrame = null,
      chain: Int = DefaultChain): DataFrame = {

    val raw = waves(spark, adjacency, pivots, maskCols, maxIter, mat, onSuperstep, onWaveVisited, verts, chain)
    val ms = raw.maskNames

    if (raw.increments.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType.fromDDL("pivot LONG, id LONG, dist INT"))

    // explode masks → (pivot, id, dist), joined back through the idx map
    val bitsOf = (m: String) =>
      expr(s"filter(sequence(0, 63), b -> (shiftright($m, b) & 1) = 1)")
    raw.increments.groupBy(_._1).toSeq.sortBy(_._1).map { case (w, winc) =>
      val exploded = winc.map { case (_, d, inc) =>
        ms.zipWithIndex.map { case (m, j) =>
          inc.where(col(m) =!= 0L)
            .select(col("id"), lit(d).as("dist"),
              explode(bitsOf(m)).as("mbit"))
            .withColumn("mcol", lit(j))
        }.reduce(_ unionAll _)
      }.reduce(_ unionAll _)
      exploded
        .join(raw.idx.where(col("wave") === w), Seq("mcol", "mbit"))
        .select(col("pivot"), col("id"), col("dist"))
    }.reduce(_ unionAll _)
  }

  /** Per-pivot harmonic centrality Σ_v 1/d(pivot,v) WITHOUT materializing the
    * (pivot, id, dist) relation: one distributed aggregate over all waves'
    * increments computes the 64·maskCols bit-histogram sums
    * Σ_rows ((m_j >> b) & 1)/dist per wave, `stack` unpivots the per-wave
    * sum row into (wave, mcol, mbit, h) — nWaves·64·maskCols rows — and a
    * broadcast join attaches them to the distributed pivot index. Nothing of
    * pivot cardinality ever lands on the driver (round-2 assembled the
    * result via a driver-side map + collect + 1-partition parallelize —
    * exactly what breaks at the Chechik web-scale sample size).
    *
    * Identical output to `Geometric.scores(run(...)).select(id, harmonic)`
    * (spec-checked) at O(n·maskCols) aggregate cost instead of O(P·n) rows.
    */
  def harmonic(
      spark: SparkSession,
      adjacency: DataFrame,
      pivots: DataFrame,
      maskCols: Int = 16,
      maxIter: Int = 256,
      mat: Materializer = new LocalMaterializer(window = 0),
      onSuperstep: (Int, Long) => Unit = (_, _) => (),
      onWaveVisited: (Int, DataFrame) => Unit = (_, _) => (),
      verts: DataFrame = null,
      chain: Int = DefaultChain): DataFrame = {

    harmonic(waves(spark, adjacency, pivots, maskCols, maxIter, mat, onSuperstep, onWaveVisited, verts, chain))
  }

  /** Per-pivot harmonic from a completed [[Visit]] (see the other overload). */
  def harmonic(v: Visit): DataFrame =
    histogram(v, "harmonic", lit(0.0))(d => lit(1.0) / d)

  /** Per-pivot farness Σ_v d(pivot, v) from a completed [[Visit]] — exact
    * integer sums (Long end to end, GeometricCentralities.java:187 widened
    * per SURVEY.md §1.1), same distributed histogram assembly as
    * [[harmonic]]. Identical to
    * `run(...).groupBy(pivot).agg(sum(dist))` without the mask explode.
    */
  def farness(v: Visit): DataFrame =
    histogram(v, "farness", lit(0L))(d => d.cast("long"))

  /** Per-bit counting aggregate: one `long[64·maskCols]` buffer per
    * (wave, dist) group, incremented by iterating each row's SET bits only
    * (`m &= m−1`), so total work is Σ visited (pivot, vertex) pairs — not
    * rows × 64·maskCols cells.
    *
    * This is a typed [[org.apache.spark.sql.expressions.Aggregator]] on
    * purpose, against the usual built-ins-first rule: the relational
    * spelling is 64·maskCols parallel `sum((m >> b) & 1)` columns in one
    * HashAggregate, whose 513-field schema falls out of whole-stage codegen
    * (`spark.sql.codegen.maxFields` = 100) into interpreted per-expression
    * evaluation — measured 40-50 s per visit at 8 cores/2M vertices, and
    * still 20-35 s with the codegen limits raised. The primitive-buffer
    * aggregator runs the same reduction in a JIT-tight loop: 12 s → and its
    * output is 512 CELLS per group rather than 512 COLUMNS, so the
    * downstream weighting/unpivot is a tiny posexplode instead of a `stack`
    * over a wide row. (A custom Catalyst Expression could shave the
    * per-row Seq decode too; not worth the surface while the aggregate is
    * <10% of a visit.)
    */
  private final class BitCountAgg(maskCols: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    def zero: Array[Long] = new Array[Long](64 * maskCols)
    def reduce(buf: Array[Long], masks: Seq[Long]): Array[Long] = {
      var j = 0
      while (j < maskCols) {
        var m = masks(j)
        while (m != 0L) {
          buf(j * 64 + java.lang.Long.numberOfTrailingZeros(m)) += 1L
          m &= m - 1
        }
        j += 1
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Shared histogram assembly in two stages. The expensive pass over the
    * increment union reduces each (wave, dist) group to 64·maskCols integer
    * bit counts via [[BitCountAgg]] (see its scaladoc for why this is a
    * typed aggregate, with measurements). The tiny second stage —
    * supersteps × 64·maskCols rows — posexplodes the count cells, applies
    * `weight(dist)`, sums per (wave, mcol, mbit), and a broadcast join
    * attaches the sums to the distributed pivot index. Farness stays
    * exact: counts are integers, `weight` = dist as Long, Long sums end to
    * end. Harmonic's (1/d)·count carries one rounding per distance instead
    * of one per visited vertex.
    */
  private def histogram(v: Visit, outCol: String, zero: Column)(
      weight: Column => Column): DataFrame = {
    val ms = v.maskNames
    val body = v.increments.collect { case (w, d, inc) if d > 0 =>
        inc.select(lit(w).as("wave") +: lit(d).as("dist") +: ms.map(col): _*)
      }
      .reduceOption(_ unionAll _)
    body match {
      case None =>
        // no superstep ever advanced: every pivot reaches nothing
        v.idx.select(col("pivot").as("id"), zero.as(outCol))
      case Some(frames) =>
        val bitcount = udaf(new BitCountAgg(ms.size),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
        val byDist = frames
          .select(col("wave"), col("dist"), array(ms.map(col): _*).as("masks"))
          .groupBy("wave", "dist")
          .agg(bitcount(col("masks")).as("cnt"))
        val h = byDist
          .select(col("wave"), col("dist"),
            posexplode(col("cnt")).as(Seq("pos", "c")))
          .withColumn("h", weight(col("dist")) * col("c"))
          .groupBy(col("wave"), (col("pos") / 64).cast("int").as("mcol"),
            pmod(col("pos"), lit(64)).cast("int").as("mbit"))
          .agg(sum("h").as("h"))
        v.idx
          .join(broadcast(h), Seq("wave", "mcol", "mbit"), "left")
          .select(col("pivot").as("id"), coalesce(col("h"), zero).as(outCol))
    }
  }

  /** Per-TARGET Σ_s d(s, v) / div(s) over all pivots s (the accumulation
    * direction of the sampling estimators: Horvitz–Thompson apxFarness with
    * div = p_s, ChechikFarnessEstimator.java:143,158-161; plain reverse
    * farness with div = 1) WITHOUT the (pivot, id) row explosion — see
    * [[reverseAgg]]. Returns (id, value); targets visited by no pivot are
    * absent.
    */
  def reverseSum(v: Visit, divisors: DataFrame): DataFrame =
    reverseAgg(v, divisors, max = false)

  /** Per-TARGET max_s d(s, v) / div(s) — the λ estimator ratio with
    * div = F(s) (ChechikEstimator.java:151-160). Returns (id, value).
    */
  def reverseMax(v: Visit, divisors: DataFrame): DataFrame =
    reverseAgg(v, divisors, max = true)

  /** The reverse-direction aggregate: per wave, the ≤ 64·maskCols per-pivot
    * divisors are collected (bounded by the WAVE width, never the pivot
    * count) into per-mask-column array literals, and each increment row
    * folds its set bits through the array with a codegen'd `aggregate`
    * lambda — O(n·maskCols) row passes per wave for ANY pivot count, vs the
    * O(P·n) rows of a row-BFS accumulation. Ratios are computed d / div in
    * double, bit-identical to the row form. Pivots missing from `divisors`
    * (e.g. F(s) = 0 sources, excluded by ChechikEstimator.java:52) are
    * stored as divisor 0 and skipped by the fold; rows whose set bits are ALL
    * divisor-less are filtered out entirely, so a target reached only by
    * non-qualifying pivots is absent — exactly the row form's
    * inner-join-then-group keyset. d = 0 rows on qualifying pivots
    * contribute the identity but keep the target covered.
    *
    * @param divisors (pivot, div: Double), div ≠ 0 where the pivot counts.
    */
  private def reverseAgg(v: Visit, divisors: DataFrame, max: Boolean): DataFrame = {
    val ms = v.maskNames
    val perWave = v.increments.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (w, winc) =>
      val divs = v.idx.where(col("wave") === w)
        .join(divisors.select(col("pivot"), col("div").cast("double").as("div")), "pivot")
        .select("mcol", "mbit", "div")
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      if (divs.isEmpty) None
      else {
        // keyset parity with the row path (round-3 advice): a target reached
        // ONLY by divisor-less pivots must not appear at all — the row form
        // inner-joins divisors before grouping. Fold the qualifying bits into
        // one Long mask per column and filter rows up front (also skips the
        // fold work for non-qualifying rows).
        val qual = ms.indices.map { j =>
          (0 until 64).foldLeft(0L) { (acc, b) =>
            if (divs.getOrElse((j, b), 0.0) != 0.0) acc | (1L << b) else acc
          }
        }
        val qualPred = ms.zipWithIndex
          .map { case (m, j) => col(m).bitwiseAND(lit(qual(j))) =!= 0L }
          .reduce(_ || _)
        val body = winc.map { case (_, d, inc) =>
          inc.select(lit(d).as("dist") +: col("id") +: ms.map(col): _*)
        }.reduce(_ unionAll _).where(qualPred)
        val withArrs = ms.indices.foldLeft(body) { (df, j) =>
          df.withColumn(s"arr$j",
            typedLit((0 until 64).map(b => divs.getOrElse((j, b), 0.0))))
        }
        val op = if (max) "greatest(acc, %s)" else "acc + %s"
        val term = ms.zipWithIndex.map { case (m, j) =>
          val contrib =
            s"IF((($m >> b) & 1) = 1 AND element_at(arr$j, b + 1) != 0D, " +
              s"CAST(dist AS DOUBLE) / element_at(arr$j, b + 1), 0D)"
          expr(s"aggregate(sequence(0, 63), 0D, (acc, b) -> ${op.format(contrib)})")
        }
        val rowTerm =
          if (!max) term.reduce(_ + _)
          else if (term.size == 1) term.head
          else greatest(term: _*)
        Some(withArrs.select(col("id"), rowTerm.as("t")))
      }
    }
    perWave.reduceOption(_ unionAll _) match {
      case None =>
        v.idx.select(col("pivot").as("id")).limit(0).withColumn("value", lit(0.0))
      case Some(all) =>
        all.groupBy("id").agg((if (max) org.apache.spark.sql.functions.max(col("t"))
          else sum(col("t"))).as("value"))
    }
  }
}
