package graft.text

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline.
  *
  * Scale shapes (designed for 100 TB, tested at sf):
  *   - exact: one hash-groupBy shuffle on a 16-byte key — never on content.
  *   - n-gram Jaccard: shingle-explode → self-join on shingle → pair-count.
  *     The shingle join is the scale risk: common shingles fan out
  *     quadratically, so `hotShingleCap` drops shingles whose document
  *     frequency exceeds the cap (a shingle shared by thousands of docs
  *     carries no near-dup signal but dominates the join).
  *   - MinHash+LSH: the scale path — band-bucket join only; candidate pairs
  *     are verified with true Jaccard afterwards.
  */
object Dedup {

  /** Exact dedup on normalized content: survivor = min doc id per group. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), md5(regexp_replace(lower(col(textCol)), "\\s+", " ")).as("h"))
      .groupBy("h")
      .agg(min("id").as("doc_id"), count(lit(1)).as("dups"))
      .select("doc_id", "dups")

  /** (doc, shingle) relation with hot-shingle capping. */
  private def docShingles(docs: DataFrame, idCol: String, textCol: String,
      n: Int, hotShingleCap: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      explode(TextOps.shingles(col(textCol), n)).as("s"))
    if (hotShingleCap <= 0) sh
    else {
      val hot = sh.groupBy("s").agg(count(lit(1)).as("df")).where(col("df") > hotShingleCap)
      sh.join(hot, Seq("s"), "left_anti")
    }
  }

  /** All pairs with n-gram Jaccard ≥ minJaccard (a, b, jaccard), a < b.
    * NOTE: capped shingles are excluded from union sizes too, so the score
    * is Jaccard over the capped shingle space — consistent on both sides.
    * `hotShingleCap` defaults ON (100): the uncapped self-join fans out
    * quadratically on hot shingles — the 100 TB killer; pass ≤ 0 to disable
    * explicitly (exact small-corpus Jaccard).
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.8, hotShingleCap: Int = 100): DataFrame = {
    val sh = docShingles(docs, idCol, textCol, n, hotShingleCap).localCheckpoint(true)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("c"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("a"), col("c").as("ca")), "a")
      .join(sizes.select(col("id").as("b"), col("c").as("cb")), "b")
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("ca") + col("cb") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** MinHash signature component i: min over shingles of md5(i || shingle)
    * — string-min over md5 hex, portable to any engine with md5.
    */
  def minhash(shingles: Column, i: Int): Column =
    array_min(transform(shingles, s => md5(concat(lit(i.toString), lit("|"), s))))

  /** MinHash+LSH candidate pairs, verified: signatures of `bands`×`rows`
    * hashes; docs sharing any band bucket become candidates; candidates are
    * then verified with true Jaccard ≥ minJaccard. Join cost is bands ×
    * bucket collisions — independent of n², the 100 TB path.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 4, rows: Int = 2,
      minJaccard: Double = 0.8): DataFrame = {
    // materialize the shingle relation once (round 6): sig, the bucket
    // self-join (both sides) and the verification joins all re-derived the
    // scan + shingling lazily — ~6 computations of the tokenize/distinct
    // per document. One checkpoint each for the shingles and the (small)
    // bucket relation cuts that to one.
    val withSh = docs
      .select(col(idCol).as("id"), TextOps.shingles(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
      .localCheckpoint(true)
    val sig = withSh.select(
      col("id"),
      array((0 until bands * rows).map(i => minhash(col("sh"), i)): _*).as("sig"))
    val buckets = sig.select(col("id"), explode(array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until rows).map(r => col("sig")(b * rows + r)): _*)).as("bucket"))
    }: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
      .localCheckpoint(true)
    val candidates = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    // verify candidates with true jaccard
    val sh = withSh.select(col("id"), explode(col("sh")).as("s"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("c"))
    val inter = candidates
      .join(sh.select(col("id").as("a"), col("s")), "a")
      .join(sh.select(col("id").as("b"), col("s").as("s2")), "b")
      .where(col("s") === col("s2"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("a"), col("c").as("ca")), "a")
      .join(sizes.select(col("id").as("b"), col("c").as("cb")), "b")
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("ca") + col("cb") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** SimHash signature (nBits ≤ 16): per token take `nBits` from its md5,
    * sum ±1 per bit over all tokens, sign-pack into a long. Near-dups have
    * small Hamming distance between signatures.
    */
  def simhash(text: Column, nBits: Int = 16): Column = {
    val tk = TextOps.tokens(text)
    val bitSums = (0 until nBits).map { b =>
      aggregate(tk, lit(0),
        (acc, t) => acc + when(
          conv(substring(md5(t), 1, 4), 16, 10).cast("int").bitwiseAND(1 << b) =!= 0,
          1).otherwise(-1))
    }
    bitSums.zipWithIndex.map { case (s, b) =>
      when(s > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
  }
}
