package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (array<float>).
  *
  * Brute-force cosine top-k is the exactness baseline (one broadcast of the
  * query vector + a single scan — fine at any corpus size for ONE query);
  * the sign-LSH bucketed variant is the scale path for query BATCHES: both
  * sides shuffle only by bucket, cost ∝ bucket collision count.
  *
  * All math in double via higher-order functions (`zip_with` + `aggregate`)
  * — stays inside codegen, no UDF.
  */
object Ann {

  /** Σ aᵢ·bᵢ in double, summed in array order (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Top-k by cosine to the embedding of `queryId` (query row excluded),
    * ties on the rounded similarity extended (rank ≤ k), deterministic.
    */
  def knnBrute(embs: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embs.where(col("vec_id") === queryId)
      .select(col("embedding").as("qe"))
    val sims = embs.where(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(cosine(col("embedding"), col("qe")), 6).as("sim"))
    sims
      .withColumn("rk", rank().over(Window.orderBy(desc("sim"))))
      .where(col("rk") <= k)
      .select("vec_id", "sim")
      .orderBy(desc("sim"), asc("vec_id"))
  }

  /** Random-hyperplane-style bucket from the signs of the first nBits
    * dimensions (deterministic stand-in for seeded gaussian hyperplanes —
    * same bucketing math, no RNG parity issues).
    */
  def signBucket(emb: Column, nBits: Int): Column =
    (0 until nBits).map { i =>
      when(emb.getItem(i) > 0f, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  /** Embedding-cosine near-duplicate pairs: sign-LSH bucket self-join (only
    * same-bucket pairs are candidates — the 100 TB shape: shuffle by bucket,
    * never all-pairs), then exact cosine ≥ minSim within the bucket.
    * Returns (a, b, sim) with a < b.
    */
  def cosineNearDupPairs(embs: DataFrame, minSim: Double, nBits: Int = 8): DataFrame = {
    val b = embs.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), nBits).as("bucket"))
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(
        col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        round(cosine(col("x.embedding"), col("y.embedding")), 6).as("sim"))
      .where(col("sim") >= minSim)
  }

  /** LSH-bucketed ANN: candidates restricted to the query's bucket, then
    * exact cosine within. Output shape matches [[knnBrute]].
    */
  def knnLsh(embs: DataFrame, queryId: Long, k: Int, nBits: Int = 8): DataFrame = {
    val bucketed = embs.withColumn("bucket", signBucket(col("embedding"), nBits))
    val q = bucketed.where(col("vec_id") === queryId)
      .select(col("embedding").as("qe"), col("bucket"))
    val sims = bucketed.where(col("vec_id") =!= queryId)
      .join(broadcast(q), "bucket")
      .select(col("vec_id"), round(cosine(col("embedding"), col("qe")), 6).as("sim"))
    sims
      .withColumn("rk", rank().over(Window.orderBy(desc("sim"))))
      .where(col("rk") <= k)
      .select("vec_id", "sim")
      .orderBy(desc("sim"), asc("vec_id"))
  }
}
