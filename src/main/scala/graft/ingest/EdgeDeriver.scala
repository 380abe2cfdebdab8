package graft.ingest

import graft.core.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Edge derivation from the files table (SURVEY.md §1.2 "Input table"):
  * vertices = distinct paths (dense IDs minted per GraphBuilder.java:17-33
  * semantics, deterministic order — Graph.mintVertexIds), edges =
  *   - co-commit: two paths touched by the same commit
  *   - import:    path A's content has `import pkgX.FileY` and B is FileY
  *
  * The import extraction parses CONTENT with a regexp (the real pipeline —
  * not a replay of the generator formula), so it works on any files table of
  * the north-rule shape.
  */
object EdgeDeriver {

  val ImportRe = "import pkg\\d+\\.File(\\d+)"

  /** Dense vertex map (extId = path, id). */
  def vertexMap(files: DataFrame): DataFrame =
    Graph.mintVertexIds(files.select(col("path").as("extId")))

  /** Co-commit edges in minted-ID space, canonical src<dst, distinct.
    * Self-join on commit; a commit touching k files yields C(k,2) pairs —
    * k is bounded by ingest (4 here); unbounded mega-commits would need the
    * same slice treatment as adjacency salting.
    */
  def cocommitEdges(files: DataFrame, vmap: DataFrame): DataFrame = {
    val occ = files.select(col("commit"), col("path")).distinct()
      .join(vmap, col("path") === col("extId"))
      .select(col("commit"), col("id"))
    val a = occ.as("a")
    val b = occ.as("b")
    a.join(b, col("a.commit") === col("b.commit") && col("a.id") < col("b.id"))
      .select(col("a.id").as("src"), col("b.id").as("dst"))
      .distinct()
  }

  /** Import edges in minted-ID space: regexp-extract targets from content,
    * join back to the vertex map by reconstructing the target's path prefix
    * (pkg/file index pair uniquely prefixes a path).
    */
  def importEdges(files: DataFrame, vmap: DataFrame): DataFrame = {
    val srcs = files.select(col("path"), col("content")).distinct()
      .join(vmap, col("path") === col("extId"))
      .select(col("id").as("src"),
        explode(regexp_extract_all(col("content"), lit(ImportRe), lit(1))).as("fileIdx"))
    // target path = 'src/pkg' || (idx % Pkgs) || '/File' || idx || '.' || ext;
    // match on the unambiguous 'File<idx>.' stem instead of rebuilding ext
    val targets = vmap.select(
      col("id").as("dst"),
      regexp_extract(col("extId"), "/File(\\d+)\\.", 1).as("fileIdx"))
    srcs.join(targets, "fileIdx")
      .select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
  }

  /** Full file graph: co-commit ∪ import, symmetrized. */
  def fileGraph(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val files = FilesTable.files(spark, dir).localCheckpoint(true)
    val vmap = vertexMap(files).localCheckpoint(true)
    val edges = cocommitEdges(files, vmap).unionAll(importEdges(files, vmap)).distinct()
    (vmap, Graph.symmetrize(edges))
  }

  /** DuckDB CTEs mirroring the derivation (expects `files` CTE in scope;
    * emits `vmap` and symmetrized `fedges`).
    */
  def edgesSql: String =
    s"""vmap AS (SELECT path AS extId, CAST(row_number() OVER (ORDER BY path) - 1 AS BIGINT) AS id
       |  FROM (SELECT DISTINCT path FROM files)),
       |occ AS (SELECT DISTINCT f."commit" AS cmt, v.id FROM files f JOIN vmap v ON f.path = v.extId),
       |cocommit AS (SELECT DISTINCT a.id AS src, b.id AS dst FROM occ a JOIN occ b ON a.cmt = b.cmt AND a.id < b.id),
       |imps AS (SELECT v.id AS src, CAST(u.fi AS VARCHAR) AS fileIdx
       |  FROM (SELECT DISTINCT path, content FROM files) f
       |  JOIN vmap v ON f.path = v.extId,
       |  UNNEST(regexp_extract_all(f.content, 'import pkg\\d+\\.File(\\d+)', 1)) AS u(fi)),
       |tgt AS (SELECT id AS dst, regexp_extract(extId, '/File(\\d+)\\.', 1) AS fileIdx FROM vmap),
       |fe0 AS (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM cocommit
       |  UNION ALL
       |  SELECT i.src, t.dst FROM imps i JOIN tgt t ON i.fileIdx = t.fileIdx WHERE i.src <> t.dst)),
       |fedges AS (SELECT src, dst FROM fe0 UNION SELECT dst, src FROM fe0)""".stripMargin
}
