package graft

import graft.algo.{MultiBfs, Geometric}
import graft.core.Graph
import org.apache.spark.sql.functions._

class GeometricSpec extends SparkTestBase {
  import spark.implicits._

  private def allScores(edges: Seq[(Long, Long)]): Map[Long, InMemoryOracle.Scores] = {
    val adj = adjOf(edges)
    val sources = Graph.vertices(edgeDf(edges)).select($"id".as("pivot"))
    val got = Geometric.scores(MultiBfs.run(spark, adj, sources)).collect()
    got.map { r =>
      r.getAs[Long]("id") -> InMemoryOracle.Scores(
        r.getAs[Long]("farness"), r.getAs[Double]("harmonic"),
        r.getAs[Double]("exponential"), r.getAs[Long]("reachable"),
        r.getAs[Double]("closeness"), r.getAs[Double]("lin"))
    }.toMap
  }

  private def checkAgainstOracle(edges: Seq[(Long, Long)]): Unit = {
    val got = allScores(edges)
    val a = InMemoryOracle.adj(edges)
    InMemoryOracle.nodes(edges).foreach { v =>
      val exp = InMemoryOracle.geometric(a, v)
      val g = got(v)
      assert(g.farness === exp.farness, s"farness($v)")
      assert(g.reachable === exp.reachable, s"reachable($v)")
      assert(approxEqual(g.harmonic, exp.harmonic), s"harmonic($v): ${g.harmonic} vs ${exp.harmonic}")
      assert(approxEqual(g.exponential, exp.exponential), s"exponential($v)")
      assert(approxEqual(g.closeness, exp.closeness), s"closeness($v)")
      assert(approxEqual(g.lin, exp.lin), s"lin($v)")
    }
  }

  test("path4 closed form") {
    val s = allScores(path4)
    assert(s(0L).harmonic === 1.0 + 0.5 + 1.0 / 3) // FIXTURES.md §2
    assert(s(1L).farness === 1 + 1 + 2)
    assert(s(1L).closeness === 1.0 / 4)
  }

  test("star5 closed form") {
    val s = allScores(star5)
    assert(s(0L).harmonic === 4.0) // center
    assert(s(1L).harmonic === 1.0 + 3.0 / 2) // leaf
    // lin includes source in reachable: center reachable=5, farness=4
    assert(s(0L).lin === 25.0 / 4)
  }

  test("k4: harmonic=3, exponential=3*alpha, 4-clique") {
    val s = allScores(k4)
    (0L to 3L).foreach { v =>
      assert(s(v).harmonic === 3.0)
      assert(s(v).exponential === 1.5)
      assert(s(v).farness === 3L)
    }
  }

  test("cycle4: farness 4 each") {
    val s = allScores(cycle4)
    (0L to 3L).foreach(v => assert(s(v).farness === 4L))
  }

  test("two components: unreachable contribute 0 to harmonic") {
    val s = allScores(twocomp)
    assert(s(0L).harmonic === 1.0)
    assert(s(0L).reachable === 2L)
    assert(s(2L).farness === 1L)
  }

  test("matches in-memory oracle on seeded ER graphs") {
    checkAgainstOracle(erGraph(60, 0.08, seed = 2))
    checkAgainstOracle(erGraph(40, 0.05, seed = 3)) // likely disconnected
  }

  test("hub-salted adjacency yields identical scores (skew path)") {
    // power-law-ish: hub 0 connected to all, plus a sparse ring
    val n = 40
    val hub = (1 until n).map(i => 0L -> i.toLong)
    val ring = (1 until n).map(i => i.toLong -> ((i % (n - 1)) + 1).toLong)
    val edges = hub ++ ring
    val plain = allScores(edges)
    val adjSalted = Graph.adjacency(edgeDf(edges), maxSlice = 4)
    val sources = Graph.vertices(edgeDf(edges)).select($"id".as("pivot"))
    val salted = Geometric.scores(MultiBfs.run(spark, adjSalted, sources))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("harmonic")).toMap
    plain.foreach { case (v, s) => assert(approxEqual(salted(v), s.harmonic), s"salted harmonic($v)") }
  }
}
