package graft

import graft.text.{TextOps, Dedup}
import graft.ann.Ann
import graft.multimodal.MultiModal
import org.apache.spark.sql.functions._

class TextAnnSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (3L, "completely different words entirely unrelated content here now"),
    (4L, "der hund und die katze und das haus und der baum ist")
  ).toDF("doc_id", "text")

  test("tokens and shingles") {
    val t = docs.select($"doc_id", size(TextOps.tokens($"text")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(t(0L) === 9)
    val sh = docs.where($"doc_id" === 0)
      .select(TextOps.shingles($"text", 3)).head().getSeq[String](0)
    assert(sh.size === 7)
    assert(sh.contains("the quick brown"))
    // short doc → empty shingles, no sequence() descent
    val short = Seq((9L, "one two")).toDF("doc_id", "text")
    assert(short.select(TextOps.shingles($"text", 3)).head().getSeq[String](0).isEmpty)
  }

  test("language id picks marker-heavy language") {
    val got = docs.select($"doc_id", TextOps.langId($"text").as("l")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) === "en")
    assert(got(4L) === "de")
    assert(got(3L) === "und") // no markers
  }

  test("exact dedup groups identical normalized texts") {
    val d = Dedup.exact(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dups")).toMap
    assert(d(0L) === 2L) // docs 0 and 2
    assert(d(1L) === 1L)
    assert(!d.contains(2L)) // absorbed into 0's group
  }

  test("jaccard pairs finds the near-dup and LSH candidates cover it") {
    val jp = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(jp.contains((0L, 2L))) // exact dup → jaccard 1
    assert(jp.contains((0L, 1L))) // near dup
    assert(!jp.exists { case (a, b) => a == 3L || b == 3L })
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, bands = 4, rows = 2, minJaccard = 0.5)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(lsh.contains((0L, 2L)))
    assert(lsh.subsetOf(jp)) // verified candidates can't exceed the exhaustive set
  }

  test("jaccardPairs hot-shingle cap defaults ON (100) — the 100 TB guard") {
    // round-4 verdict #3: the library default must match the SURVEY X2
    // claim, so no future caller inherits the quadratic hot-shingle fan-out
    val m = Dedup.getClass.getMethods
      .find(_.getName == "jaccardPairs$default$6").get
    assert(m.invoke(Dedup) === 100)
    // and on a corpus with no hot shingles the capped default is identical
    // to the explicit uncapped run
    val withDefault = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val uncapped = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5,
        hotShingleCap = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(withDefault === uncapped)
  }

  test("simhash: identical texts same signature, near-dups close in hamming") {
    val s = docs.select($"doc_id", Dedup.simhash($"text", 16).as("sig")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sig")).toMap
    assert(s(0L) === s(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(s(0L), s(1L)) < hamming(s(0L), s(3L)))
  }

  test("cosine knn: identical vector ranks first") {
    val embs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),   // identical to query
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Ann.knnBrute(embs, queryId = 0L, k = 2).collect().map(_.getAs[Long]("vec_id"))
    assert(got.take(2).toSeq === Seq(1L, 2L))
    val lsh = Ann.knnLsh(embs, queryId = 0L, k = 2, nBits = 3)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(lsh.contains(1L)) // same sign bucket as the query
    assert(!lsh.contains(4L)) // opposite signs → different bucket
  }

  test("embedding-cosine near-dup pairs: bucket-local, threshold respected") {
    val embs = Seq(
      (0L, Array(1.0f, 0.1f, 0.0f)),
      (1L, Array(1.0f, 0.11f, 0.0f)),  // near-dup of 0, same bucket
      (2L, Array(0.0f, 1.0f, 0.0f)),   // same bucket as nothing close
      (3L, Array(-1.0f, -0.1f, 0.0f))  // near-dup of 0 by |cos| but opposite bucket
    ).toDF("vec_id", "embedding")
    val pairs = Ann.cosineNearDupPairs(embs, minSim = 0.99, nBits = 3).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(pairs === Set((0L, 1L))) // 0-3 anti-parallel (sim -1) and cross-bucket
    val all = Ann.cosineNearDupPairs(embs, minSim = -2.0, nBits = 3).collect()
    assert(all.forall(r => r.getAs[Long]("a") < r.getAs[Long]("b")))
  }

  test("autoNBits: corpus-derived LSH width, dim-capped, floors at the historical constant") {
    // the driver corpus (500 docs, dim 64, 4 bands) must land on the
    // historical static config so d5/a2 results are unchanged
    assert(Ann.autoNBits(500, 64, bands = 4) === 8)
    // growth: occupancy n/2^nBits stays ≤ 4 while dims allow
    assert(Ann.autoNBits(1L << 20, 256, bands = 4) === 18)
    // dim cap: each band consumes its own nBits sign dimensions
    assert(Ann.autoNBits(1L << 40, 64, bands = 4) === 16)
    assert(Ann.autoNBits(1, 64, bands = 4) === 8)
  }

  test("multimodal frames: bounded, deterministic, drop partial frames") {
    val media = MultiModal.withMedia(docs, "doc_id", "text")
    val f = MultiModal.frameFeatures(media, nFrames = 3, stride = 10, width = 5)
    val rows = f.collect()
    assert(rows.forall(_.getAs[String]("feature").length === 32))
    // doc 0 has 44 chars → frames at byte 0,10,20 all full (width 5)
    assert(rows.count(_.getAs[Long]("doc_id") == 0L) === 3)
    // deterministic
    val again = MultiModal.frameFeatures(media, 3, 10, 5).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet ===
      again.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet)
  }
}
