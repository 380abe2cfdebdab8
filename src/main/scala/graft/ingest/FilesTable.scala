package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._

/** Deterministic synthetic source-code-repository table — the north rule's
  * input shape (BASELINE.json input_hint):
  *   files(repo: string, path: string, commit: string, lang: string, content: string)
  *
  * One row per (commit, file) occurrence, like an Iceberg snapshot of a repo
  * history. Everything is a pure function of the row index `i` (and the
  * derived file index `pi`), built from md5/modular arithmetic only, so the
  * DuckDB oracle regenerates the identical table from `range(N)` — generator
  * parity is itself oracle-checked, and `sha2(content,256)` equality is the
  * per-row invariant.
  *
  * Structure knobs (all deterministic):
  *   - `pi = (i * 2654435761) % P`: which of P distinct paths row i touches
  *   - commit ci = i / 4: each commit touches ≤4 files → co-commit edges
  *   - content embeds 0–3 `import pkgX.FileY` lines → import edges
  *     (reference analogue: arcs of the input graph, GraphBuilder.java:20-32)
  */
object FilesTable {

  val Mult = 2654435761L // Knuth multiplicative hash
  val FilesPerCommit = 4
  val Repos = 32
  val Pkgs = 100

  /** Number of occurrence rows at this scale: |lineitem| / 2. */
  def numRows(spark: SparkSession, dir: String): Long =
    spark.read.parquet(s"$dir/lineitem.parquet").count() / 2

  def langOf(m: Column): Column =
    when(m === 0, "scala").when(m === 1, "java").otherwise("py")

  /** The files table for scale dir. Generated distributedly from
    * spark.range — at 10^12 rows this is an embarrassingly parallel scan.
    */
  def files(spark: SparkSession, dir: String): DataFrame = {
    val n = numRows(spark, dir)
    val p = math.max(n / 3, 1L)
    val base = spark.range(n).toDF("i")
      .withColumn("pi", (col("i") * Mult) % p)
      .withColumn("ci", (col("i") / FilesPerCommit).cast("long"))
      .withColumn("m", col("pi") % 3)

    val importLines = (0 until 3).map { j =>
      val t = (col("pi") * 31 + (j + 1) * 7919) % p
      when(col("pi") % 4 > j,
        concat(lit("import pkg"), (t % Pkgs).cast("string"),
          lit(".File"), t.cast("string"), lit("\n")))
        .otherwise("")
    }

    base.select(
      concat(lit("repo"), (col("pi") % Repos).cast("string")).as("repo"),
      concat(lit("src/pkg"), (col("pi") % Pkgs).cast("string"),
        lit("/File"), col("pi").cast("string"), lit("."),
        langOf(col("m"))).as("path"),
      concat(lit("c"), substring(md5(concat(lit("commit"), col("ci").cast("string"))), 1, 12)).as("commit"),
      langOf(col("m")).as("lang"),
      concat(
        concat(lit("package pkg"), (col("pi") % Pkgs).cast("string"), lit("\n")),
        concat(importLines: _*),
        concat(lit("body "), md5(concat(lit("body"), col("pi").cast("string"))), lit("\n"))).as("content"))
  }

  /** DuckDB SQL regenerating the identical table (CTE named `files`).
    * `chr(10)` = newline (DuckDB string literals don't interpret \n).
    */
  def filesSql: String = {
    def t(j: Int) = s"((pi * 31 + ${(j + 1) * 7919}) % p)"
    def importLine(j: Int) =
      s"CASE WHEN pi % 4 > $j THEN 'import pkg' || CAST(${t(j)} % $Pkgs AS VARCHAR) || '.File' || CAST(${t(j)} AS VARCHAR) || chr(10) ELSE '' END"
    s"""params AS (SELECT CAST((SELECT count(*) FROM lineitem) // 2 AS BIGINT) AS n,
       |  GREATEST(CAST((SELECT count(*) FROM lineitem) // 2 // 3 AS BIGINT), 1) AS p),
       |rows0 AS (SELECT CAST(row_number() OVER () - 1 AS BIGINT) AS i FROM lineitem),
       |idx AS (SELECT i, (i * $Mult) % params.p AS pi,
       |  i // $FilesPerCommit AS ci, params.p AS p
       |  FROM rows0, params WHERE i < params.n),
       |langd AS (SELECT *, CASE pi % 3 WHEN 0 THEN 'scala' WHEN 1 THEN 'java' ELSE 'py' END AS lang FROM idx),
       |files AS (SELECT
       |  'repo' || CAST(pi % $Repos AS VARCHAR) AS repo,
       |  'src/pkg' || CAST(pi % $Pkgs AS VARCHAR) || '/File' || CAST(pi AS VARCHAR) || '.' || lang AS path,
       |  'c' || substr(md5('commit' || CAST(ci AS VARCHAR)), 1, 12) AS "commit",
       |  lang,
       |  'package pkg' || CAST(pi % $Pkgs AS VARCHAR) || chr(10)
       |    || ${importLine(0)} || ${importLine(1)} || ${importLine(2)}
       |    || 'body ' || md5('body' || CAST(pi AS VARCHAR)) || chr(10) AS content
       |  FROM langd)""".stripMargin
  }
}
