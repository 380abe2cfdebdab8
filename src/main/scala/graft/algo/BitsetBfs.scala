package graft.algo

import graft.core.{Materializer, LocalMaterializer}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Bitset multi-source BFS — the scale path for many-pivot visits.
  *
  * [[MultiBfs.run]] carries one row per (pivot, vertex): P pivots over an
  * m-arc graph shuffle O(P·m) message rows per full visit. This variant
  * packs pivots into Long bitmasks — `maskCols` Longs of 64 bits each, so up
  * to 64·maskCols pivots advance in ONE wave — and packs VERTICES into
  * chunks of [[ChunkSize]] (default 256, env `GRAFT_CHUNK_BITS`): state is
  * one row per chunk `(chunk, ns, vs)` where `ns`/`vs` are dense
  * `array<long>` TILES of ChunkSize·maskCols elements, element
  * `pos·maskCols + j` holding mask column j of vertex `chunk·ChunkSize + pos`
  * (`ns` = bits newly set this superstep, `vs` = cumulative visited).
  *
  * Semantically identical to the reference's per-source BFS
  * (GeometricCentralities.java:151-207): bit b of mask column j of vertex v
  * set at superstep d  ⇔  d(pivot_{j·64+b}, v) = d.
  *
  * Superstep = ONE fused job, ONE shuffle whose row count is
  * PARTITION-INDEPENDENT:
  *
  *   frontier = explode state tiles → (chunk, pos, m0..)  [no shuffle]
  *   msgs     = frontier ⋈ cadj on (chunk, pos) → explode neighbors
  *              → groupBy(dst chunk).agg(TileOr)           [THE shuffle]
  *   state'   = state ⟕ msgs on chunk:
  *              ns = zip_with(atile, vs, (a,v) -> a & ~v)
  *              vs = zip_with(vs, atile, (v,a) -> v | a)   [co-partitioned]
  *
  * Everything is hash(chunk)-partitioned — the state via its stripped
  * checkpoint ([[org.apache.spark.sql.graft.CheckpointStats.strip]] keeps
  * `outputPartitioning` while dropping the inherited stats whose
  * join-squaring blocked co-partitioned loops in round 3), the chunked
  * adjacency via [[prepare]], the messages via the tile groupBy — so both
  * joins are exchange-free shuffled-hash.
  *
  * WHY TILES (round-4 StageProbe finding): the per-vertex form's message
  * aggregate keyed on id has map-side-combine output ∝ map tasks × n — at
  * 2 vs 8 cores the 8-core leg shuffled 3× the rows (13.5M vs 4.0M per
  * superstep at n=2M) at ~1μs/row of task time, the entire N→4N scaling
  * gap. Tile aggregation bounds map-side output at (populated chunks ≈
  * n/ChunkSize) ROWS per map task — ChunkSize× fewer rows, and the per-row costs (hash
  * probe, serialization, join plumbing) amortize over a 64·maskCols-element
  * array processed in tight codegen'd/JIT loops (`zip_with`, primitive
  * buffer aggregators). Chunk granularity (ChunkSize) is the combine-vs-tile-memory
  * trade: a map task's partial-agg map holds ≤ populated-chunks tiles
  * (n/ChunkSize × 2 KB·maskCols worst case — bound map task input via
  * `maxPartitionBytes` at larger n, or shrink chunks).
  *
  * Consumers never see tiles unless they want them:
  *  - [[run]] explodes tiles back to the (pivot, id, dist) relation — once,
  *    after the iteration. O(P·n) output rows.
  *  - [[harmonic]]/[[farness]] aggregate the tile increments DIRECTLY —
  *    64·maskCols counting cells per (wave, dist) via [[org.apache.spark.sql.graft.TileBitCountAgg]] over
  *    n/ChunkSize-row frames, so the per-pivot score costs O(n·maskCols/ChunkSize) rows
  *    regardless of P — the 100 TB shape of "all per-source running sums
  *    become aggregates" (SURVEY.md §2.4 A3).
  *  - [[reverseSum]]/[[reverseMax]] and per-wave visited frames use
  *    [[idRows]], a lazy tile → (id, m0..) projection.
  */
object BitsetBfs {

  /** log2 of the vertex-chunk width (tile rows hold ChunkSize vertices;
    * a chunk's tile indexes as `pos·maskCols + j`). Env-overridable for
    * chunk-granularity A/B probes; all layouts in one JVM must agree, so it
    * is read once.
    */
  private val ChunkBits = sys.env.getOrElse("GRAFT_CHUNK_BITS", "8").toInt
  private[graft] val ChunkSize = 1 << ChunkBits

  /** Message-aggregation placement (`GRAFT_SUPERSTEP_AGG`):
    *  - `combine` (default): map-side partial tile aggregation before the
    *    exchange — shuffle rows bounded at map tasks × populated chunks,
    *    but every map task's partial map spans the FULL n·maskCols·8 B tile
    *    space (concurrent random RMW working set ∝ cores × n — the term
    *    StageProbe pinned the 2→8-core residual on).
    *  - `repart`: exchange the RAW (chunk, pos, masks) message rows first,
    *    then aggregate — each task's tile map holds only ITS hash(chunk)
    *    range (total live RMW working set = n·maskCols·8 B, core-count-
    *    INDEPENDENT), and the shuffle becomes sequential serialize/
    *    deserialize traffic ∝ Σ deg(frontier) rows.
    * Env-switchable for same-window A/B probes (round-5 scaling lever).
    */
  private val AggForm = sys.env.getOrElse("GRAFT_SUPERSTEP_AGG", "combine")

  /** Pivot count at or below which the pivot index is numbered on the driver
    * (ONE bounded collect) instead of via distributed rank minting — see
    * [[waves]]. Package-private VAR so specs can lower it to force the
    * large-P branch on a small pivot set and assert branch parity; both
    * branches produce identical output, so a concurrent suite observing a
    * lowered cap stays correct (just takes the distributed path).
    */
  private[graft] var smallPivotCap = 65536

  /** All-zero tiles stored as NULL (round 6 default): quiet chunks (no new
    * bits this superstep / never visited) carry NULL instead of a
    * materialized ChunkSize·maskCols zero array — less checkpoint DRAM
    * traffic on the non-peak supersteps and no allocation churn in the seed
    * stage. `0` restores the dense-array form for same-window A/B probes.
    */
  private val NullTiles = sys.env.getOrElse("GRAFT_NULL_TILES", "1") != "0"

  /** Message-aggregate form: mask columns as direct unboxed-ordinal children
    * (default; see [[org.apache.spark.sql.graft.TileAggs.tileOrCols]]) vs
    * one `array(...)` child. Same-window A/B (BASELINE.md): the unboxed
    * column form won every rotated pair by 0.5–1.6%; a boxed-eval column
    * form had LOST the mirror-image A/B by 1–2%. Env-overridable for A/B
    * probes only.
    */
  private val TileCols = sys.env.getOrElse("GRAFT_TILE_COLS", "1") != "0"

  /** Chunk-keyed visit inputs, built once and reused across visits over the
    * same graph (a Chechik certification run is one visit per batch; the
    * bench legs build it as untimed prep like the adjacency load itself):
    *   - `cadj`: (chunk, pos, neighbors) of each adjacency (src, slice) row,
    *     hash(chunk)-partitioned — the frontier join side.
    *   - `chunks`: distinct source chunks — the dense state universe.
    * Callers that supply one own its lifecycle ([[Prep.release]]).
    */
  case class Prep(cadj: DataFrame, chunks: DataFrame) {
    def release(): Unit = {
      Materializer.unpersistCheckpoint(cadj)
      Materializer.unpersistCheckpoint(chunks)
    }
  }

  /** Build a [[Prep]] from `Graph.adjacency` output (src, salt?, neighbors,
    * degree): one arcs-row repartition to hash(chunk), checkpointed.
    */
  def prepare(adjacency: DataFrame): Prep = {
    val cadj = adjacency.select(
        shiftright(col("src"), ChunkBits).as("chunk"),
        col("src").bitwiseAND(lit((ChunkSize - 1).toLong)).cast("int").as("pos"),
        col("neighbors"))
      .repartition(col("chunk"))
      .localCheckpoint(true)
    val chunks = cadj.select(col("chunk")).distinct().localCheckpoint(true)
    Prep(cadj, chunks)
  }

  /** Handle to a completed bitset visit: pivot→(wave,mcol,mbit) index map,
    * per-superstep newly-bit TILE frames (wave, dist, frame(chunk, tile)) —
    * filtered projections of the cached per-superstep state — and per-wave
    * final visited (id, m0..) frames. Consumed by the histogram/reverse
    * aggregates below; obtain one via [[visit]] and reuse it across several
    * aggregates (one BFS, many consumers — e.g. Chechik needs farness AND
    * the λ ratio from the same pivot visit).
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

  /** Any bit set anywhere in the tile — the frontier/visited row predicate.
    * NULL tiles (all-zero since round 6, see [[superstep]]) yield NULL and
    * are filtered by `where` exactly like an explicit zero tile.
    */
  private def tileNonZero(tileCol: String): Column =
    exists(col(tileCol), _ =!= 0L)

  /** Lazy tile → per-vertex projection: (chunk, `tileCol`) rows to
    * (id, m0..m{mc-1}) rows for every vertex with any bit set. Chunk slots
    * that are no real vertex carry all-zero masks and are filtered with the
    * rest, so the row set matches the sparse per-id form exactly.
    */
  private[graft] def idRows(frame: DataFrame, tileCol: String, maskCols: Int): DataFrame = {
    val ms = (0 until maskCols).map(j => s"m$j")
    frame.where(tileNonZero(tileCol))
      .select(col("chunk"), col(tileCol).as("tile"),
        explode(sequence(lit(0), lit(ChunkSize - 1))).as("pos"))
      .select(
        (col("chunk") * ChunkSize + col("pos")).as("id") +:
          ms.zipWithIndex.map { case (m, j) =>
            element_at(col("tile"), col("pos") * maskCols + (j + 1)).as(m)
          }: _*)
      .where(nonZeroCols(ms))
  }

  /** ONE tile superstep over the dense hash(chunk)-partitioned state
    * (chunk, ns, vs) — see the object scaladoc for the shape and why.
    * Exposed package-private so PlanSpec can assert the physical plan —
    * exactly one Exchange, shuffled-hash joins, no Sort — on the real loop
    * plan rather than prose.
    */
  private[graft] def superstep(state: DataFrame, cadj: DataFrame, maskCols: Int): DataFrame = {
    val ms = (0 until maskCols).map(j => s"m$j")
    // explode the frontier tiles to (chunk, pos, m0..) — in-task, no shuffle,
    // and the loop plan is superstep-invariant (no per-superstep literals →
    // codegen caches hit from superstep 2 on; the superstep d lives in the
    // consumer-side `incs` tuples, never in the plan)
    val frontier = state.where(tileNonZero("ns"))
      .select(col("chunk"), col("ns"),
        explode(sequence(lit(0), lit(ChunkSize - 1))).as("pos"))
      .select(col("chunk") +: col("pos") +:
        ms.zipWithIndex.map { case (m, j) =>
          element_at(col("ns"), col("pos") * maskCols + (j + 1)).as(m)
        }: _*)
      .where(nonZeroCols(ms))
    // frontier ⋈ cadj on (chunk, pos): both sides hash(chunk)-partitioned
    // (key position 0 of the join), so EnsureRequirements recognizes them
    // co-partitioned — no exchange. Shuffled-hash, built on the frontier
    // side: stripped state stats are defaultSizeInBytes, so the hint is
    // load-bearing (see CheckpointStats scaladoc), and SMJ would re-sort
    // the checkpointed adjacency every superstep.
    val fr = frontier.hint("shuffle_hash")
    // per-arc message rows: under GRAFT_TILE_COLS the mask columns feed the
    // tile aggregate DIRECTLY (unboxed ordinal reads) instead of being
    // packed into an array per arc row — no UnsafeArrayData alloc + copy on
    // the hottest projection in the engine (A/B: BASELINE.md).
    val arcs = fr
      .join(cadj, Seq("chunk", "pos"))
      .select(explode(col("neighbors")).as("dst") +: ms.map(col): _*)
    // under `repart` the raw message rows are exchanged BEFORE aggregation:
    // the groupBy's distribution requirement is then already satisfied, so
    // Catalyst plans partial+final aggregation together in the post-shuffle
    // stage and each task's tile map covers only its own hash(chunk) range
    // (see [[AggForm]]). Plan still has exactly ONE Exchange per superstep.
    def keyed(df: DataFrame): DataFrame =
      if (AggForm == "repart") df.repartition(col("chunk")) else df
    val msgs =
      (if (TileCols)
        keyed(arcs.select(
            shiftright(col("dst"), ChunkBits).as("chunk") +:
              col("dst").bitwiseAND(lit((ChunkSize - 1).toLong)).cast("int").as("pos") +:
              ms.map(col): _*))
          .groupBy("chunk")
          .agg(org.apache.spark.sql.graft.TileAggs
            .tileOrCols(col("pos"), ms.map(col), ChunkSize).as("atile"))
      else
        keyed(arcs.select(
            shiftright(col("dst"), ChunkBits).as("chunk"),
            col("dst").bitwiseAND(lit((ChunkSize - 1).toLong)).cast("int").as("pos"),
            array(ms.map(col): _*).as("masks")))
          .groupBy("chunk")
          .agg(org.apache.spark.sql.graft.TileAggs
            .tileOr(col("pos"), col("masks"), maskCols, ChunkSize).as("atile")))
    // visited test + visited update, fused into the co-partitioned merge
    // join (both sides hash(chunk)): two codegen'd zip_with lambdas over the
    // tiles, left outer keeps the state side's partitioning for the NEXT
    // superstep's checkpoint to capture. n/ChunkSize state rows never
    // re-shuffle. ALL-ZERO TILES ARE NULL (round 6): a chunk with no
    // incoming messages stores ns = NULL instead of a materialized
    // ChunkSize·maskCols zero array, and a never-visited chunk stores
    // vs = NULL — the checkpointed state then carries ~2–32 KB per QUIET
    // chunk less per superstep (most chunks are quiet outside the 2–3 peak
    // supersteps), and the init/seed stage allocates no zero arrays at all
    // (StageProbe r5 measured that stage at 19–49 % GC from exactly this
    // churn). `tileNonZero` treats NULL like zero, so frontier extraction,
    // increments, idRows and the wave loop see the identical row sets.
    val joined = state.join(msgs.hint("shuffle_hash"), Seq("chunk"), "left")
    if (NullTiles)
      joined.select(col("chunk"),
        when(col("atile").isNull, lit(null))
          .when(col("vs").isNull, col("atile"))
          .otherwise(expr("zip_with(atile, vs, (a, v) -> a & ~v)")).as("ns"),
        when(col("atile").isNull, col("vs"))
          .when(col("vs").isNull, col("atile"))
          .otherwise(expr("zip_with(vs, atile, (v, a) -> v | a)")).as("vs"))
    else
      // pre-round-6 dense form, byte-for-byte (A/B only; init0 is dense too)
      joined.select(col("chunk"),
        when(col("atile").isNull, array_repeat(lit(0L), ChunkSize * maskCols))
          .otherwise(expr("zip_with(atile, vs, (a, v) -> a & ~v)")).as("ns"),
        when(col("atile").isNull, col("vs"))
          .otherwise(expr("zip_with(vs, atile, (v, a) -> v | a)")).as("vs"))
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
      prepIn: Prep,
      chain: Int): Visit = {

    // Two session confs the tile loop NEEDS while its supersteps plan+run;
    // prior values are captured and restored on exit (round-4 advice: a
    // permanent mutation silently changed spill/co-partition behavior of
    // unrelated queries on the shared session). Restore is safe at the end
    // of waves(): every superstep plan is materialized inside the loop, and
    // the Visit's lazy increment/visited projections are plain scans +
    // aggregates over checkpointed frames — neither conf affects them.
    //  - fallbackThreshold: the tile aggregate's map-side hash map
    //    legitimately holds up to n/ChunkSize keys per task; the default
    //    ObjectHashAggregate fallback (128 keys) would silently degrade
    //    every superstep to sort-based aggregation — sorting the raw
    //    message rows each superstep.
    //  - requireAllClusterKeysForCoPartition=false: frontier ⋈ cadj joins on
    //    (chunk, pos) with BOTH sides hash(chunk)-partitioned — a key-subset
    //    co-partitioning Spark only accepts with this (conservative-by-
    //    default) flag off; without it EnsureRequirements re-exchanges both
    //    sides on (chunk, pos) every superstep, exactly the n-row reshuffle
    //    the tile layout removes.
    val FallbackKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val CoPartKey = "spark.sql.requireAllClusterKeysForCoPartition"
    val priorFallback = spark.conf.getOption(FallbackKey)
    val priorCoPart = spark.conf.getOption(CoPartKey)
    def restoreConfs(): Unit = {
      def put(k: String, v: Option[String]): Unit =
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      put(FallbackKey, priorFallback)
      put(CoPartKey, priorCoPart)
    }
    spark.conf.set(FallbackKey,
      sys.env.getOrElse("GRAFT_AGG_FALLBACK", (1 << 22).toString))
    spark.conf.set(CoPartKey, "false")
    try wavesBody(spark, adjacency, pivots, maskCols, maxIter, mat,
      onSuperstep, onWaveVisited, prepIn, chain)
    finally restoreConfs()
  }

  private def wavesBody(
      spark: SparkSession,
      adjacency: DataFrame,
      pivots: DataFrame,
      maskCols: Int,
      maxIter: Int,
      mat: Materializer,
      onSuperstep: (Int, Long) => Unit,
      onWaveVisited: (Int, DataFrame) => Unit,
      prepIn: Prep,
      chain: Int): Visit = {

    val waveBits = 64L * maskCols
    val ms = (0 until maskCols).map(j => s"m$j")

    // deterministic pivot numbering: idx → (wave, column, bit), ascending
    // pivot id. Two shapes with identical output:
    //  - small-P fast path (P ≤ 64k): ONE job — collect the distinct pivot
    //    ids (bounded: ≤ 0.5 MB of longs), number on the driver, hand the
    //    loop a local relation. A visit previously paid ~4 driver-gapped
    //    init jobs before its first superstep — per-visit fixed cost that a
    //    Chechik certification run re-pays every batch and that the scaling
    //    legs can't parallelize away.
    //  - large-P path: distributed range minting — the Chechik sample at
    //    web scale is K·E[λ] ≈ ln(n)/ε² · E[λ] · n rows, too big to collect.
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

    def newlyTiles(state: DataFrame): DataFrame =
      state.where(tileNonZero("ns")).select(col("chunk"), col("ns").as("tile"))
    def strip(df: DataFrame): DataFrame =
      org.apache.spark.sql.graft.CheckpointStats.strip(df)

    val prep =
      if (nWaves == 0) null
      else if (prepIn != null) prepIn
      else prepare(adjacency)

    var incs = Vector.empty[(Int, Int, DataFrame)]
    var visitedOut = Vector.empty[(Int, DataFrame)]
    var statesAcc = Vector.empty[DataFrame]
    for (w <- 0 until nWaves) {
      // init: the pivot's own bit set (newly AND visited) in its chunk's
      // tile, distance 0; all other chunks carry zero tiles (dense state).
      // The pivot side is ≤ 64·maskCols chunk tiles — explicit broadcast, so
      // the init join preserves the chunk universe's partitioning. Chunks of
      // pivots absent from the adjacency (isolated) union in through one
      // n/ChunkSize-row distinct.
      val wavePivots = idx.where(col("wave") === w)
      val pivotTiles = wavePivots.select(
          shiftright(col("pivot"), ChunkBits).as("chunk"),
          col("pivot").bitwiseAND(lit((ChunkSize - 1).toLong)).cast("int").as("pos"),
          array((0 until maskCols).map(j =>
            when(col("mcol") === j, expr("shiftleft(CAST(1 AS BIGINT), mbit)"))
              .otherwise(lit(0L))): _*).as("masks"))
        .groupBy("chunk").agg(org.apache.spark.sql.graft.TileAggs
          .tileOr(col("pos"), col("masks"), maskCols, ChunkSize).as("ptile"))
      val allChunks = prep.chunks
        .unionAll(wavePivots.select(shiftright(col("pivot"), ChunkBits).as("chunk")))
        .distinct()
      // non-pivot chunks init as NULL tiles (= all-zero; see superstep) —
      // the seed stage materializes no zero arrays
      def initTile =
        if (NullTiles) col("ptile")
        else coalesce(col("ptile"), array_repeat(lit(0L), ChunkSize * maskCols))
      val init0 = allChunks.join(broadcast(pivotTiles), Seq("chunk"), "left")
        .select(col("chunk"), initTile.as("ns"), initTile.as("vs"))
      // a vertex can be several pivots only across waves, never within (idx
      // distinct). NOTE: state frames carry NO dist column — the superstep d
      // lives in the `incs` tuples (see superstep scaladoc).
      val (state0, rows0) = mat.iterateCountedWhere(init0, 0, -1.0, tileNonZero("ns"))
      var state = strip(state0)
      statesAcc :+= state
      incs :+= ((w, 0, newlyTiles(state)))
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
          val next = superstep(state, prep.cadj, maskCols)
          val (st, cnt) = mat.iterateCountedWhere(next, d, frontierRows.toDouble, tileNonZero("ns"))
          state = strip(st)
          statesAcc :+= state
          frontierRows = cnt
          if (frontierRows > 0) incs :+= ((w, d, newlyTiles(state)))
          onSuperstep(d, frontierRows)
        } else {
          // chained path: build u supersteps LAZILY (each localCheckpoint
          // truncates the plan immediately but materializes on first use),
          // then ONE union-multicount job computes the whole chain — the
          // stage graph covers all u message exchanges, each intermediate
          // state persists the first time a stage computes it (later
          // references hit its checkpoint blocks) — and returns every
          // substep's exact frontier-chunk count. u supersteps now cost ONE
          // job submission + driver roundtrip instead of u: JobProbe
          // measured the per-superstep driver gap at ~0.2-0.3 s, serial and
          // core-count-independent — precisely the term that caps the
          // N→4N scaling legs.
          var built = Vector.empty[DataFrame]
          var s = state
          for (k <- 1 to u) {
            val next = superstep(s, prep.cadj, maskCols)
            s = strip(mat.iterateDeferred(next, d + k, -1.0))
            built :+= s
          }
          val counts = built.zipWithIndex
            .map { case (st, i) => st.where(tileNonZero("ns")).select(lit(i + 1).as("k")) }
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
            if (cnt > 0) incs :+= ((w, d + k, newlyTiles(built(k - 1))))
            onSuperstep(d + k, cnt)
            frontierRows = cnt
            if (cnt == 0) stop = true
            k += 1
          }
          d += u
          state = built.last
        }
      }
      // per-vertex visited masks for this wave — a lazy idRows projection,
      // so its row set matches the sparse form exactly (never-reached
      // vertices and phantom chunk slots carry all-zero masks and drop)
      val vis = idRows(state, "vs", maskCols)
      visitedOut :+= ((w, vis))
      onWaveVisited(w, vis)
    }
    if (prep != null && prepIn == null) prep.release()
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
      prep: Prep = null,
      chain: Int = DefaultChain): Visit =
    waves(spark, adjacency, pivots, maskCols, maxIter, mat, onSuperstep, onWaveVisited, prep, chain)

  /** @param adjacency output of Graph.adjacency over SYMMETRIZED edges,
    *                  persisted by the caller (only read when no `prep` is
    *                  supplied — the visit then builds and frees its own).
    * @param pivots    one column `pivot: Long`.
    * @param maskCols  Long mask columns per wave (64 pivots each).
    * @param onSuperstep (d, count) per superstep. NOTE: `count` is frontier
    *                  CHUNK rows (tiles with any new bit), not frontier
    *                  vertices — ~ChunkSize smaller than the row-BFS
    *                  frontier size; cross-telemetry comparisons with
    *                  pre-round-4 data must account for the unit change.
    * @param onWaveVisited called once per completed wave with the final
    *                  consolidated visited frame (id, m0..) — lets callers
    *                  derive whole-visit aggregates (e.g.
    *                  Σ deg(v)·popcount(masks) = exact visited-arc count,
    *                  the reference's visitedArcs counter,
    *                  GeometricCentralities.java:179-181) without the explode.
    * @param prep      chunk-keyed inputs from [[prepare]], reusable across
    *                  visits over the same graph; null → built per visit.
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
      prep: Prep = null,
      chain: Int = DefaultChain): DataFrame = {

    val raw = waves(spark, adjacency, pivots, maskCols, maxIter, mat, onSuperstep, onWaveVisited, prep, chain)
    val ms = raw.maskNames

    if (raw.increments.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType.fromDDL("pivot LONG, id LONG, dist INT"))

    // explode tiles → (pivot, id, dist), joined back through the idx map
    val bitsOf = (m: String) =>
      expr(s"filter(sequence(0, 63), b -> (shiftright($m, b) & 1) = 1)")
    raw.increments.groupBy(_._1).toSeq.sortBy(_._1).map { case (w, winc) =>
      val exploded = winc.map { case (_, d, inc) =>
        val rows = idRows(inc, "tile", ms.size)
        ms.zipWithIndex.map { case (m, j) =>
          rows.where(col(m) =!= 0L)
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
    * tile increments computes the 64·maskCols bit-histogram sums
    * Σ 1/dist per set bit, unpivoted into (wave, mcol, mbit, h) —
    * nWaves·64·maskCols rows — and a broadcast join attaches them to the
    * distributed pivot index. Nothing of pivot cardinality ever lands on the
    * driver (round-2 assembled the result via a driver-side map + collect +
    * 1-partition parallelize — exactly what breaks at the Chechik web-scale
    * sample size).
    *
    * Identical output to `Geometric.scores(run(...)).select(id, harmonic)`
    * (spec-checked) at O(n·maskCols/64) aggregate ROWS instead of O(P·n).
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
      prep: Prep = null,
      chain: Int = DefaultChain): DataFrame = {

    harmonic(waves(spark, adjacency, pivots, maskCols, maxIter, mat, onSuperstep, onWaveVisited, prep, chain))
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

  /** Shared histogram assembly in two stages. The expensive pass reduces
    * each (wave, dist) group of tile increments to 64·maskCols integer bit
    * counts via [[org.apache.spark.sql.graft.TileBitCountAgg]] — n/ChunkSize rows per frame, primitive-buffer
    * set-bit iteration. The tiny second stage — supersteps × 64·maskCols
    * rows — posexplodes the count cells, applies `weight(dist)`, sums per
    * (wave, mcol, mbit), and a broadcast join attaches the sums to the
    * distributed pivot index. Farness stays exact: counts are integers,
    * `weight` = dist as Long, Long sums end to end. Harmonic's (1/d)·count
    * carries one rounding per distance instead of one per visited vertex.
    */
  private def histogram(v: Visit, outCol: String, zero: Column)(
      weight: Column => Column): DataFrame = {
    val mc = v.maskNames.size
    val body = v.increments.collect { case (w, d, inc) if d > 0 =>
        inc.select(lit(w).as("wave"), lit(d).as("dist"), col("tile"))
      }
      .reduceOption(_ unionAll _)
    body match {
      case None =>
        // no superstep ever advanced: every pivot reaches nothing
        v.idx.select(col("pivot").as("id"), zero.as(outCol))
      case Some(frames) =>
        val byDist = frames
          .groupBy("wave", "dist")
          .agg(org.apache.spark.sql.graft.TileAggs
            .tileBitCount(col("tile"), mc).as("cnt"))
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
    * count) into per-byte lookup-table literals, and each increment row
    * (via the [[idRows]] projection) folds its set bits through the tables
    * with codegen'd `element_at` lookups — O(n·maskCols) row passes per
    * wave for ANY pivot count, vs the O(P·n) rows of a row-BFS
    * accumulation. History (round-4 verdict #5): this fold was an
    * `aggregate` higher-order-function lambda, which is `CodegenFallback`
    * (interpreted) — `graft.tools.ReverseProbe` measured it at 96.8 s
    * against the 28.7 s visit feeding it (n=2M, 512 pivots, 8 cores); the
    * byte-LUT form replaced it, same-window A/B in BASELINE.md round 5.
    * Ratios are dist · (1/div) in double — equal to the row form's
    * d / div up to FP re-association (the byte tables pre-reduce on the
    * driver; the row form's shuffle `sum` is order-nondeterministic anyway,
    * so neither form promises a bit pattern, and specs/oracles compare at
    * tolerance / 6 dp).
    * Pivots missing from `divisors` (e.g. F(s) = 0 sources, excluded by
    * ChechikEstimator.java:52) are stored as divisor 0 and skipped by the
    * fold; rows whose set bits are ALL divisor-less are filtered out
    * entirely, so a target reached only by non-qualifying pivots is absent —
    * exactly the row form's inner-join-then-group keyset. d = 0 rows on
    * qualifying pivots contribute the identity but keep the target covered.
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
          idRows(inc, "tile", ms.size)
            .select(lit(d).as("dist") +: col("id") +: ms.map(col): _*)
        }.reduce(_ unionAll _).where(qualPred)
        // A set bit contributes dist · inv(b) (inv = 1/div, 0 where the
        // pivot doesn't qualify — div is positive in every caller:
        // keep-probabilities, farness, offsets). Fold each 64-bit mask
        // through EIGHT 256-entry byte lookup tables pre-reduced on the
        // driver (byte value → sum or max of inv over its bits) instead of
        // a 64-step `aggregate` lambda: higher-order functions are
        // CodegenFallback (interpreted), while element_at on an array
        // literal is codegen'd — 8 compiled lookups per mask column keep
        // the row term inside whole-stage codegen. ReverseProbe (n=2M,
        // 512 pivots, 8 cores) measured the lambda form at 96.8 s against
        // the 28.7 s visit feeding it; see BASELINE.md round 5.
        val term = ms.zipWithIndex.map { case (m, j) =>
          val inv = (0 until 64).map { b =>
            val dv = divs.getOrElse((j, b), 0.0)
            if (dv != 0.0) 1.0 / dv else 0.0
          }
          val bytes = (0 until 8).map { k =>
            val lut = (0 until 256).map { x =>
              val vals = (0 until 8).collect { case b if ((x >> b) & 1) == 1 => inv(8 * k + b) }
              if (max) { if (vals.isEmpty) 0.0 else vals.max } else vals.sum
            }
            element_at(typedLit(lut),
              shiftright(col(m), 8 * k).bitwiseAND(lit(255L)).cast("int") + 1)
          }
          if (max) { if (bytes.size == 1) bytes.head else greatest(bytes: _*) }
          else bytes.reduce(_ + _)
        }
        val combined =
          if (!max) term.reduce(_ + _)
          else if (term.size == 1) term.head
          else greatest(term: _*)
        Some(body.select(col("id"),
          (col("dist").cast("double") * combined).as("t")))
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
