package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4 — the ground-truth JSON golden-file source (GTLoader.java:30-43).
  *
  * Format: ONE json object `{"nodes": [...], "closeness": [...],
  * "farness": [...]}` where `nodes` lists vertex ids in closeness-rank
  * order and `closeness`/`farness` are indexed BY VERTEX ID
  * (GTLoader.java:35-42). Parsed with Spark's multiLine JSON reader +
  * posexplode — no driver-side parsing.
  */
object GroundTruth {

  /** → (id, rank, closeness, farness), one row per vertex. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", true).json(path)
    val nodes = raw.select(posexplode(col("nodes"))).toDF("rank", "id")
    val clos = raw.select(posexplode(col("closeness"))).toDF("cid", "closeness")
    val far = raw.select(posexplode(col("farness"))).toDF("fid", "farness")
    nodes
      .join(clos, nodes("id") === clos("cid"))
      .join(far, nodes("id") === far("fid"))
      .select(
        col("id").cast("long").as("id"),
        col("rank").cast("long").as("rank"),
        col("closeness").cast("double").as("closeness"),
        col("farness").cast("long").as("farness"))
  }

  /** GTLoader.getTopKNodes (GTLoader.java:46-54): the first k rank-ordered
    * nodes, extended through ties on the k-th closeness value.
    */
  def topkNodes(gt: DataFrame, k: Int): DataFrame = {
    val kth = gt.where(col("rank") === (k - 1)).select("closeness").head().getDouble(0)
    gt.where(col("rank") < k || col("closeness") === kth)
      .select("id", "rank", "closeness")
      .orderBy("rank")
  }
}
