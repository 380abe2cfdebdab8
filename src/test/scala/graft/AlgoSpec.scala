package graft

import graft.algo.{PageRank, Components, LabelProp, Triangles, Chechik, MultiBfs, BitsetBfs, Geometric}
import graft.core.{Graph, DirMaterializer}
import org.apache.spark.sql.functions._

class AlgoSpec extends SparkTestBase {
  import spark.implicits._

  test("pagerank: uniform on cycle4; sums to 1") {
    val adj = adjOf(cycle4)
    val r = PageRank.run(spark, adj, maxIter = 20, tol = 1e-9).ranks
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Double]("pr")).toMap
    (0L to 3L).foreach(v => assert(approxEqual(r(v), 0.25)))
    assert(approxEqual(r.values.sum, 1.0))
  }

  test("pagerank matches in-memory oracle to 1e-6 convergence on ER graph") {
    val edges = erGraph(60, 0.08, seed = 4)
    val adj = adjOf(edges)
    val res = PageRank.run(spark, adj, maxIter = 200, tol = 1e-9)
    val got = res.ranks.collect().map(x => x.getAs[Long]("id") -> x.getAs[Double]("pr")).toMap
    val a = InMemoryOracle.adj(edges)
    val exp = InMemoryOracle.pagerank(a, InMemoryOracle.nodes(edges), 0.85, 200, 1e-9)
    exp.foreach { case (v, e) => assert(approxEqual(got(v), e), s"pr($v): ${got(v)} vs $e") }
  }

  test("pagerank chained supersteps: identical results and telemetry to the eager loop") {
    // convergence lands mid-chunk (first delta ≤ tol picked INSIDE a chain
    // of 4): ranks, iteration count, final delta and per-step (iter, delta)
    // telemetry must all match the eager loop bit-for-bit — the chained
    // path computes the same recurrence, just u supersteps per job.
    val adj = adjOf(erGraph(60, 0.08, seed = 4))
    def leg(chain: Int) = {
      var tel = Vector.empty[(Int, Double)]
      val res = PageRank.run(spark, adj, maxIter = 200, tol = 1e-6,
        onSuperstep = (i, d) => tel :+= ((i, d)), chain = chain)
      val ranks = res.ranks.collect()
        .map(x => x.getAs[Long]("id") -> x.getAs[Double]("pr")).toMap
      (ranks, res.iterations, res.finalDelta, tel)
    }
    val (eagerRanks, eagerIters, eagerDelta, eagerTel) = leg(1)
    val (chainRanks, chainIters, chainDelta, chainTel) = leg(4)
    assert(chainIters === eagerIters)
    assert(chainDelta === eagerDelta)
    assert(chainTel === eagerTel)
    assert(chainRanks === eagerRanks)
    assert(eagerIters % 4 !== 0, "want convergence mid-chunk to exercise overshoot")
  }

  test("components: exact labels on twocomp and disconnected ER") {
    val l1 = Components.run(spark, adjOf(twocomp)).labels
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(l1 === Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))

    val edges = erGraph(40, 0.04, seed = 5) // sparse → several components
    val got = Components.run(spark, adjOf(edges)).labels
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    val exp = InMemoryOracle.components(InMemoryOracle.adj(edges), InMemoryOracle.nodes(edges))
    assert(got === exp)
  }

  test("components: large-star/small-star rounds ≪ diameter on a path graph") {
    // hash-min would need 255 supersteps here; Two-Phase contracts in O(log n)
    val n = 256
    val path = (0L until (n - 1).toLong).map(i => i -> (i + 1))
    val res = Components.run(spark, adjOf(path))
    assert(res.iterations <= 20, s"rounds ${res.iterations} not ≪ diameter ${n - 1}")
    val labels = res.labels.collect().map(r => r.getAs[Long]("label")).distinct.toSeq
    assert(labels === Seq(0L))
  }

  test("label propagation matches in-memory oracle (4 synchronous rounds)") {
    val edges = erGraph(50, 0.08, seed = 6)
    val got = LabelProp.run(spark, adjOf(edges), rounds = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    val exp = InMemoryOracle.lpa(InMemoryOracle.adj(edges), InMemoryOracle.nodes(edges), 4)
    assert(got === exp)
  }

  test("label propagation chained rounds: identical labels to the eager loop") {
    // rounds = 6 with chain = 4 exercises a full chunk plus a partial one
    val adj = adjOf(erGraph(50, 0.08, seed = 6))
    def leg(chain: Int) = LabelProp.run(spark, adj, rounds = 6, chain = chain)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(leg(4) === leg(1))
  }

  test("row-bfs chained supersteps: identical dists and telemetry to the eager loop") {
    // 29-hop path from both endpoints: BFS depth 29 ends mid-chunk at
    // chain = 4 — dist rows and per-step (d, frontier-count) telemetry must
    // match the eager loop exactly, including the observed zero frontier
    val path = (0L until 29L).map(i => i -> (i + 1))
    val adj = adjOf(path)
    val pivots = Seq(0L, 29L).toDF("pivot")
    def leg(chain: Int) = {
      var tel = Vector.empty[(Int, Long)]
      val rows = MultiBfs.run(spark, adj, pivots,
        onSuperstep = (d, c) => tel :+= ((d, c)), chain = chain)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      (rows, tel)
    }
    val (eagerRows, eagerTel) = leg(1)
    val (chainRows, chainTel) = leg(4)
    assert(chainRows === eagerRows)
    assert(chainTel === eagerTel)
    assert(eagerTel.last._2 === 0L)
  }

  test("triangles: k4 has 4 global, 3 per vertex; matches oracle on ER") {
    import spark.implicits._
    val canonK4 = Graph.canonicalize(k4.toDF("src", "dst"))
    assert(Triangles.globalCount(spark, canonK4).head().getLong(0) === 4L)
    val pv = Triangles.perVertex(spark, canonK4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("triangles")).toMap
    (0L to 3L).foreach(v => assert(pv(v) === 3L))

    val edges = erGraph(60, 0.1, seed = 7)
    val canon = Graph.canonicalize(edges.toDF("src", "dst"))
    val exp = InMemoryOracle.triangles(InMemoryOracle.adj(edges), InMemoryOracle.nodes(edges))
    assert(Triangles.globalCount(spark, canon).head().getLong(0) === exp)
  }

  test("chechik certified top-k equals exact top-k (tie-extended)") {
    val edges = erGraph(80, 0.06, seed = 8)
    val adj = adjOf(edges)
    val k = 5
    val (topk, tel) = Chechik.topkCloseness(spark, adj, k = k)
    val got = topk.collect().map(_.getAs[Long]("id"))
    // exact oracle: farness ascending with rank-tie extension
    val a = InMemoryOracle.adj(edges)
    val far = InMemoryOracle.nodes(edges)
      .map(v => v -> InMemoryOracle.geometric(a, v).farness).sortBy(x => (x._2, x._1))
    val kth = far(k - 1)._2
    val expected = far.takeWhile(_._2 <= kth).map(_._1).toSet
    assert(got.toSet === expected, s"got ${got.toSet} vs $expected")
    assert(tel.totalBfs > 0 && tel.supersteps > 0)
  }

  test("chechik estimator coefficients: closed form on path P3") {
    // P3 symmetrized: 0-1-2. F(0)=3, F(1)=2, F(2)=3 (pivot=all vertices).
    // λ(0) = max(d(1,0)/2, d(2,0)/3) = max(0.5, 2/3) = 2/3; λ(1) = 1/3
    // (floor 1/n = 1/3 equals max ratio 1/3); λ(2) = 2/3.
    // K = ⌈ln 3/0.01⌉ = 110 ⇒ p = min(1, K·λ) = 1 everywhere.
    val edges = Seq(0L -> 1L, 1L -> 2L)
    val sym = Graph.symmetrize(edges.toDF("src", "dst"))
    val adj = Graph.adjacency(sym)
    val verts = Graph.vertices(sym)
    val pivots = verts.select(col("id").as("pivot"))
    // both cost-switch paths must produce the same coefficients
    Seq(Some(false), Some(true)).foreach { force =>
      val got = Chechik.estimatorCoefficients(spark, adj, pivots, verts, n = 3,
          forceBitset = force)
        .collect().map(r => r.getAs[Long]("id") -> (r.getAs[Double]("lambda"), r.getAs[Double]("p"))).toMap
      assert(approxEqual(got(0L)._1, 2.0 / 3), s"force=$force")
      assert(approxEqual(got(1L)._1, 1.0 / 3), s"force=$force")
      assert(approxEqual(got(2L)._1, 2.0 / 3), s"force=$force")
      got.values.foreach { case (_, p) => assert(approxEqual(p, 1.0)) }
    }
  }

  test("pagerank resumes from DirMaterializer checkpoint with identical result") {
    val edges = erGraph(50, 0.08, seed = 9)
    val adj = adjOf(edges)
    // baseline: uninterrupted run through the SAME parquet materializer
    // (double-sum order depends on scan order, so the fair baseline also
    // round-trips each iteration through parquet)
    val dirFull = java.nio.file.Files.createTempDirectory("graft_ckpt_full").toString
    val full = PageRank.run(spark, adj, maxIter = 8, tol = 0.0,
        mat = new DirMaterializer(spark, dirFull)).ranks
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Double]("pr")).toMap

    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    // phase 1: run only 3 iterations, checkpointing each to dir
    PageRank.run(spark, adj, maxIter = 3, tol = 0.0, mat = new DirMaterializer(spark, dir))
    // phase 2: a NEW run resumes at iteration 3 and finishes to 8
    val resumed = PageRank.run(spark, adj, maxIter = 8, tol = 0.0, mat = new DirMaterializer(spark, dir))
    assert(resumed.iterations === 8)
    val got = resumed.ranks.collect().map(x => x.getAs[Long]("id") -> x.getAs[Double]("pr")).toMap
    // byte-identical: same double bits, not just allclose
    full.foreach { case (v, e) =>
      assert(java.lang.Double.doubleToLongBits(got(v)) === java.lang.Double.doubleToLongBits(e),
        s"resume not bit-identical at $v")
    }
  }

  test("multi-source BFS distances match oracle on ER graph") {
    val edges = erGraph(60, 0.07, seed = 10)
    val adj = adjOf(edges)
    val pivots = Seq(0L, 7L, 13L).toDF("pivot")
    val got = MultiBfs.run(spark, adj, pivots)
      .collect().map(r => (r.getAs[Long]("pivot"), r.getAs[Long]("id")) -> r.getAs[Int]("dist")).toMap
    val a = InMemoryOracle.adj(edges)
    Seq(0L, 7L, 13L).foreach { p =>
      val exp = InMemoryOracle.bfs(a, p)
      exp.foreach { case (v, d) => assert(got((p, v)) === d, s"dist($p,$v)") }
      assert(got.keys.count(_._1 == p) === exp.size)
    }
  }

  test("bitset BFS ≡ row BFS (multi-wave, multi-column, disconnected)") {
    val edges = erGraph(80, 0.05, seed = 11) ++ Seq(200L -> 201L) // + far component
    val adj = adjOf(edges)
    // 40 pivots over maskCols=1 forces nothing; maskCols=1 with >64 pivots
    // would force waves — use 40 pivots with 1 column AND all-vertex pivots
    // with 2 columns to cover both packing regimes
    val pivots40 = (0L until 40L).toDF("pivot")
    val rows = MultiBfs.run(spark, adj, pivots40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bits = BitsetBfs.run(spark, adj, pivots40, maskCols = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(bits === rows)

    val allPivots = Graph.vertices(edgeDf(edges)).select(col("id").as("pivot"))
    val rowsAll = MultiBfs.run(spark, adj, allPivots)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bitsAll = BitsetBfs.run(spark, adj, allPivots, maskCols = 2) // n≈82 → waves of 128
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(bitsAll === rowsAll)
  }

  test("large-P distributed pivot minting ≡ small-P driver fast path") {
    // round-4 verdict #4: the distributed Rank.globalRank minting branch
    // (the path a web-scale Chechik sample takes, P > 64k) only engaged
    // above the cap, which no sf-level query reaches — force it by lowering
    // the cap and assert bit-identical output on the same pivot set
    val edges = erGraph(60, 0.07, seed = 17)
    val adj = adjOf(edges)
    val pivots = (0L until 8L).toDF("pivot")
    def dists() = BitsetBfs.run(spark, adj, pivots, maskCols = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val small = dists() // default cap: driver-numbered local index
    val prior = BitsetBfs.smallPivotCap
    val large =
      try { BitsetBfs.smallPivotCap = 4; dists() } // 8 pivots > 4 → globalRank
      finally BitsetBfs.smallPivotCap = prior
    assert(large === small)
    assert(small.nonEmpty)
  }

  test("chained supersteps: identical results and telemetry to the eager loop") {
    // long path ⇒ many supersteps; chain=4 chunks overshoot past the empty
    // frontier on the final chunk — results and reported (step, count)
    // telemetry must still match the eager loop exactly (counts within a
    // chunk are monotone to zero: an empty frontier sends no messages)
    val path = (0L until 29L).map(i => i -> (i + 1))
    val adj = adjOf(path)
    val pivots = Seq(0L, 29L).toDF("pivot")
    def leg(chain: Int) = {
      var tel = Vector.empty[(Int, Long)]
      val rows = BitsetBfs.run(spark, adj, pivots, maskCols = 1,
        onSuperstep = (d, c) => tel :+= ((d, c)), chain = chain)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      (rows, tel)
    }
    val (eagerRows, eagerTel) = leg(1)
    val (chainRows, chainTel) = leg(4)
    assert(chainRows === eagerRows)
    assert(chainTel === eagerTel)
    assert(eagerTel.last._2 === 0L) // both observed the converged frontier
  }

  test("bitset farness + reverse sum/max histograms match row-BFS accumulations") {
    val edges = erGraph(70, 0.06, seed = 13)
    val adj = adjOf(edges)
    val pivots = (0L until 70L).toDF("pivot")
    val v = BitsetBfs.visit(spark, adj, pivots, maskCols = 1) // 2 waves
    val dist = MultiBfs.run(spark, adj, pivots).localCheckpoint(true)

    val farRow = dist.groupBy("pivot").agg(sum("dist").cast("long").as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val farBits = BitsetBfs.farness(v)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("farness")).toMap
    (0L until 70L).foreach { p =>
      assert(farBits(p) === farRow.getOrElse(p, 0L), s"farness($p)")
    }

    val divs = (0L until 70L).map(p => (p, (p % 7 + 1).toDouble)).toDF("pivot", "div")
    val sumRow = dist.join(divs, "pivot")
      .groupBy("id").agg(sum(col("dist").cast("double") / col("div")).as("s"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("s")).toMap
    val sumBits = BitsetBfs.reverseSum(v, divs)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("value")).toMap
    assert(sumBits.keySet === sumRow.keySet)
    sumRow.foreach { case (i, s) => assert(approxEqual(s, sumBits(i)), s"revSum($i)") }

    val maxRow = dist.join(divs, "pivot")
      .groupBy("id").agg(max(col("dist").cast("double") / col("div")).as("s"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("s")).toMap
    val maxBits = BitsetBfs.reverseMax(v, divs)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("value")).toMap
    assert(maxBits.keySet === maxRow.keySet)
    maxRow.foreach { case (i, s) => assert(approxEqual(s, maxBits(i)), s"revMax($i)") }

    // divisor-less pivots (round-3 advice): a target reached ONLY by pivots
    // absent from `divisors` must be ABSENT from the reverse aggregates —
    // the row form inner-joins divisors before grouping. Keep just pivot 0's
    // divisor: every target outside pivot 0's component must disappear.
    val divsOnly0 = Seq((0L, 2.0)).toDF("pivot", "div")
    val rowOnly0 = dist.join(divsOnly0, "pivot")
      .groupBy("id").agg(sum(col("dist").cast("double") / col("div")).as("s"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("s")).toMap
    val bitsOnly0 = BitsetBfs.reverseSum(v, divsOnly0)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("value")).toMap
    assert(bitsOnly0.keySet === rowOnly0.keySet)
    rowOnly0.foreach { case (i, s) => assert(approxEqual(s, bitsOnly0(i)), s"revSumOnly0($i)") }
    val maxOnly0 = BitsetBfs.reverseMax(v, divsOnly0)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("value")).toMap
    assert(maxOnly0.keySet === rowOnly0.keySet)
  }

  test("bitset BFS: harmonic scores identical to row-BFS scores") {
    val edges = erGraph(70, 0.06, seed = 12)
    val adj = adjOf(edges)
    val pivots = (0L until 70L).toDF("pivot")
    val viaRows = Geometric.scores(MultiBfs.run(spark, adj, pivots))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("harmonic")).toMap
    val viaBits = Geometric.scores(BitsetBfs.run(spark, adj, pivots, maskCols = 1))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("harmonic")).toMap
    assert(viaRows.keySet === viaBits.keySet)
    viaRows.foreach { case (v, h) => assert(approxEqual(h, viaBits(v)), s"harmonic($v)") }

    // histogram variant (no explode): same values, multi-wave covered
    val viaHist = BitsetBfs.harmonic(spark, adj, pivots, maskCols = 1) // 70 pivots → 2 waves
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("harmonic")).toMap
    assert(viaHist.keySet === viaRows.keySet)
    viaRows.foreach { case (v, h) => assert(approxEqual(h, viaHist(v)), s"hist harmonic($v)") }

    // visited-mask popcount edge accounting == Σ deg over the dist relation
    val degs = Graph.degrees(Graph.symmetrize(edgeDf(edges)))
    var maskEdges = 0L
    BitsetBfs.run(spark, adj, pivots, maskCols = 1,
      onWaveVisited = (_, vis) => {
        val bits = vis.columns.filter(_ != "id")
          .map(c => expr(s"bit_count($c)").cast("long")).reduce(_ + _)
        maskEdges += vis.join(degs, vis("id") === degs("id"))
          .agg(coalesce(sum(col("degree") * bits), lit(0L))).head().getLong(0)
      }).count()
    val rowEdges = MultiBfs.run(spark, adj, pivots)
      .join(degs, Seq("id")).agg(sum("degree")).head().getLong(0)
    assert(maskEdges === rowEdges)
  }

  test("sparse tile serialization round-trips dense, sparse, and empty buffers") {
    import org.apache.spark.sql.graft.TileAggs
    val rnd = new scala.util.Random(7)
    val len = 512
    val dense = Array.fill(len)(rnd.nextLong())
    val sparse = new Array[Long](len)
    Seq(0, 17, 333, 511).foreach(i => sparse(i) = rnd.nextLong() | 1L)
    val empty = new Array[Long](len)
    for (buf <- Seq(dense, sparse, empty)) {
      val bytes = TileAggs.toBytes(buf)
      assert(TileAggs.fromBytes(bytes, len).toSeq === buf.toSeq)
    }
    // sparse encoding actually engages and pays
    assert(TileAggs.toBytes(sparse).length === 4 + 12 * 4)
    assert(TileAggs.toBytes(dense).length === 4 + 8 * len)
  }

  test("tileOrCols (unboxed column children) equals tileOr (array child)") {
    import org.apache.spark.sql.graft.TileAggs
    val rnd = new scala.util.Random(11)
    val mc = 3
    val chunkSize = 16
    val rows = Seq.tabulate(600) { _ =>
      (rnd.nextInt(4).toLong, rnd.nextInt(chunkSize),
        rnd.nextLong(), rnd.nextLong(), rnd.nextLong())
    }
    val df = spark.createDataFrame(rows)
      .toDF("chunk", "pos", "m0", "m1", "m2")
    val ms = Seq("m0", "m1", "m2").map(col)
    val viaArray = df
      .groupBy("chunk")
      .agg(TileAggs.tileOr(col("pos"), array(ms: _*), mc, chunkSize).as("tile"))
    val viaCols = df
      .groupBy("chunk")
      .agg(TileAggs.tileOrCols(col("pos"), ms, chunkSize).as("tile"))
    val a = viaArray.orderBy("chunk").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val c = viaCols.orderBy("chunk").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(a.toSeq === c.toSeq)
    // the unboxed bound-ordinal path must actually engage (local mode shares
    // the JVM) — a silent fallback to interpreted eval would invalidate the
    // form's measured advantage without failing anything
    assert(TileAggs.colsFastPathWasEngaged)
  }
}
