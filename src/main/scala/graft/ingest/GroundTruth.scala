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

  /** The golden-file WRITER half of the reference's correctness methodology
    * (ExactCloseness.java:46-58): exact per-vertex scores → ONE json object
    * `{"nodes": [...], "closeness": [...], "farness": [...]}` with `nodes`
    * in closeness-rank order (closeness desc, ties asc id — the
    * deterministic form of Sorter.closenessSort) and `closeness`/`farness`
    * indexed BY VERTEX ID, which therefore must be dense 0..n−1.
    *
    * Driver-side by design: the format is a single JSON object with
    * id-indexed arrays, inherently driver-sized — the reference's own
    * generator is likewise a single-node O(n²) validation tool, not a scale
    * path. Use at golden-fixture scale only.
    *
    * @param gt (id, closeness, farness) with ids dense 0..n−1.
    */
  def write(gt: DataFrame, path: String): Unit = {
    val rows = gt
      .select(col("id").cast("long"), col("closeness").cast("double"),
        col("farness").cast("long"))
      .orderBy("id")
      .collect()
    require(rows.zipWithIndex.forall { case (r, i) => r.getLong(0) == i.toLong },
      "ground-truth ids must be dense 0..n-1 (the arrays are id-indexed)")
    val nodes = rows.sortBy(r => (-r.getDouble(1), r.getLong(0))).map(_.getLong(0))
    val json =
      s"""{"nodes": [${nodes.mkString(",")}],
         | "closeness": [${rows.map(_.getDouble(1)).mkString(",")}],
         | "farness": [${rows.map(_.getLong(2)).mkString(",")}]}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
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
