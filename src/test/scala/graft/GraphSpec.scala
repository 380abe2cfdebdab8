package graft

import graft.core.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("symmetrize is idempotent and doubles canonical arcs") {
    val e = Seq((0L, 1L), (1L, 0L), (1L, 2L)).toDF("src", "dst")
    val sym = Graph.symmetrize(e)
    assert(sym.count() === 4) // 0-1, 1-0, 1-2, 2-1
    assert(Graph.symmetrize(sym).count() === 4)
  }

  test("symmetrized degree sum equals 2x undirected edge count") {
    val edges = erGraph(50, 0.1, seed = 1)
    val sym = edgeDf(edges)
    val degSum = Graph.degrees(sym).agg(sum("degree")).head().getLong(0)
    val m = edges.filter(e => e._1 != e._2).distinct.size
    assert(degSum === 2L * m)
  }

  test("canonicalize drops self-loops and orders endpoints") {
    val e = Seq((3L, 1L), (1L, 3L), (2L, 2L), (1L, 2L)).toDF("src", "dst")
    val c = Graph.canonicalize(e).as[(Long, Long)].collect().toSet
    assert(c === Set((1L, 3L), (1L, 2L)))
  }

  test("mintVertexIds yields dense 0..n-1 ordered by external id") {
    val ids = Seq("b", "a", "c", "a").toDF("extId")
    val m = Graph.mintVertexIds(ids).as[(String, Long)].collect().toMap
    assert(m === Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  test("salted adjacency slices reassemble the full neighbor set") {
    // star: center 0 with 5 leaves, maxSlice 2 → hash-salted into >1 slice
    val star = Seq(0L -> 1L, 0L -> 2L, 0L -> 3L, 0L -> 4L, 0L -> 5L)
    val adj = Graph.adjacency(edgeDf(star), maxSlice = 2)
    val centerSlices = adj.where($"src" === 0).collect()
    assert(centerSlices.length > 1)
    assert(centerSlices.forall(_.getAs[Long]("degree") === 5L))
    val reassembled = centerSlices.flatMap(r => r.getSeq[Long](r.fieldIndex("neighbors"))).sorted
    assert(reassembled === Array(1L, 2L, 3L, 4L, 5L))
    // leaves: single slice each
    assert(adj.where($"src" =!= 0).count() === 5)
  }

  test("adjacency build never materializes a hub's full neighbor list in one task") {
    // hub 0 with 4096 leaves, maxSlice 256: the salt is derived on edge rows
    // BEFORE the aggregation, so the largest array any aggregation task
    // builds is one hash-balanced slice (mean maxSlice/2 = 128), never the
    // 4096-long full adjacency. Deterministic: xxhash64 has no seed input.
    val hubDeg = 4096
    val hub = (1 to hubDeg).map(i => 0L -> i.toLong)
    val adj = Graph.adjacency(edgeDf(hub), maxSlice = 256)
    val slices = adj.where($"src" === 0).collect()
    val sizes = slices.map(r => r.getSeq[Long](r.fieldIndex("neighbors")).size)
    assert(sizes.sum === hubDeg)
    assert(sizes.max <= 256, s"largest slice ${sizes.max} exceeds maxSlice")
    assert(slices.forall(_.getAs[Long]("degree") === hubDeg.toLong))
    // every slice internally sorted (determinism contract)
    slices.foreach { r =>
      val ns = r.getSeq[Long](r.fieldIndex("neighbors"))
      assert(ns === ns.sorted)
    }
  }
}
