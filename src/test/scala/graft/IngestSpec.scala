package graft

import graft.ingest.{FilesTable, EdgeDeriver, ArcList}
import graft.core.Graph
import org.apache.spark.sql.functions._

class IngestSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val files = FilesTable.files(spark, dir).cache()

  test("files table has the north-rule shape and is deterministic") {
    assert(files.columns.toSeq === Seq("repo", "path", "commit", "lang", "content"))
    val n = FilesTable.numRows(spark, dir)
    assert(files.count() === n)
    // same generator twice → identical sha multiset
    val again = FilesTable.files(spark, dir)
    assert(files.select(sha2($"content", 256)).except(again.select(sha2($"content", 256))).count() === 0)
  }

  test("path determines content (file identity across commits)") {
    val bad = files.groupBy("path").agg(countDistinct("content").as("c")).where($"c" > 1).count()
    assert(bad === 0)
  }

  test("sha256 multiset survives a repartition + parquet rewrite (input_hint invariant)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_rw").toString
    files.repartition(5).write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.select(sha2($"content", 256).as("sha")).groupBy("sha").count()
    assert(m(files).except(m(back)).count() === 0)
    assert(m(back).except(m(files)).count() === 0)
  }

  test("import edges: every derived edge's target is actually imported in content") {
    val vmap = EdgeDeriver.vertexMap(files).cache()
    val imp = EdgeDeriver.importEdges(files, vmap)
    // join back: src's content must contain 'File<dstIdx>' as import
    val withPaths = imp
      .join(vmap.select($"id".as("src"), $"extId".as("srcPath")), "src")
      .join(vmap.select($"id".as("dst"), $"extId".as("dstPath")), "dst")
    val contents = files.select($"path".as("srcPath"), $"content").distinct()
    val checked = withPaths.join(contents, "srcPath")
      .withColumn("dstIdx", regexp_extract($"dstPath", "/File(\\d+)\\.", 1))
      .withColumn("ok", $"content".contains(concat(lit(".File"), $"dstIdx", lit("\n"))))
    assert(checked.where(!$"ok").count() === 0)
    assert(imp.count() > 0)
  }

  test("co-commit edges: endpoints share a commit") {
    val vmap = EdgeDeriver.vertexMap(files).cache()
    val cc = EdgeDeriver.cocommitEdges(files, vmap)
    val occ = files.select($"commit", $"path").distinct()
      .join(vmap, $"path" === $"extId").select($"commit", $"id")
    val bad = cc
      .join(occ.select($"commit".as("c1"), $"id".as("src")), "src")
      .join(occ.select($"commit".as("c2"), $"id".as("dst")), "dst")
      .where($"c1" === $"c2")
      .select("src", "dst").distinct()
    assert(bad.count() === cc.count()) // every edge witnessed by a shared commit
    assert(cc.count() > 0)
  }

  test("file graph is symmetric") {
    val (_, sym) = EdgeDeriver.fileGraph(spark, dir)
    val rev = sym.select($"dst".as("src"), $"src".as("dst"))
    assert(sym.except(rev).count() === 0)
  }

  test("arc-list text sink/source round-trips; dirty lines dropped") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (5L, 3L)).toDF("src", "dst")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_arclist_${System.nanoTime()}"
    ArcList.write(edges, path)
    val back = ArcList.read(spark, path)
    assert(back.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((0L, 1L), (1L, 2L), (2L, 0L), (5L, 3L)))

    // GraphSorter semantics: junk filtered, negative dst abs()'d, offset shift
    val dirty = s"${System.getProperty("java.io.tmpdir")}/graft_dirty_${System.nanoTime()}"
    new java.io.File(dirty).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dirty, "part-0.txt"),
      "1 2\n3.5 4\nnot a line\n7 -8\n9\n2 3\n")
    val cleaned = ArcList.read(spark, dirty, offset = 1L)
    assert(cleaned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((0L, 1L), (6L, 7L), (1L, 2L)))
  }
}
