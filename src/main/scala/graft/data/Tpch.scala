package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Edge tables derived from the driver's TPC-H-ish parquet (TESTDATA.md).
  * Every derivation here must stay expressible in the DuckDB oracle SQL in
  * `SparkEntry.oracleSql` — keep both in lockstep.
  *
  * Vertex ID space: part p → p; supplier s → 10_000_000 + s (disjoint Long
  * ranges, the engine's dense-ID discipline — SURVEY.md §1.2).
  */
object Tpch {

  val SuppOffset = 10000000L

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Bipartite part—supplier graph: an edge wherever a supplier shipped a
    * part (dense: the bench graph). Directed part→supplier; symmetrize for
    * algorithms.
    */
  def bipartiteEdges(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select(
        col("l_partkey").cast("long").as("src"),
        (col("l_suppkey").cast("long") + SuppOffset).as("dst"))
      .distinct()

  /** Sparse subgraph (avg degree ≈ 2–3, diameter ≥ 6): lineitems with
    * quantity ≤ maxQty. The correctness graph for BFS / centralities / CC —
    * interesting topology, cheap recursive-CTE oracle.
    */
  def sparseEdges(spark: SparkSession, dir: String, maxQty: Double = 2.0): DataFrame =
    table(spark, dir, "lineitem")
      .where(col("l_quantity") <= maxQty)
      .select(
        col("l_partkey").cast("long").as("src"),
        (col("l_suppkey").cast("long") + SuppOffset).as("dst"))
      .distinct()

  /** Part co-purchase graph: parts appearing in the same order, canonical
    * u < v. Has real triangle/community structure (LPA, triangle counting).
    */
  def copurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").cast("long").as("pk"))
    val a = li.as("a")
    val b = li.as("b")
    a.join(b, col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      .distinct()
  }

  /** Matching DuckDB SQL fragments (CTE bodies) for the oracle side. */
  object Sql {
    val bipartite: String =
      "SELECT DISTINCT CAST(l_partkey AS BIGINT) AS src, CAST(10000000 + l_suppkey AS BIGINT) AS dst FROM lineitem"
    def sparse(maxQty: Double = 2.0): String =
      s"SELECT DISTINCT CAST(l_partkey AS BIGINT) AS src, CAST(10000000 + l_suppkey AS BIGINT) AS dst FROM lineitem WHERE l_quantity <= $maxQty"
    val copurchase: String =
      "SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS src, CAST(b.l_partkey AS BIGINT) AS dst " +
        "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
    /** symmetrize a CTE named `e0` */
    val symmetrize: String = "SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0"
  }
}
