package graft.algo

import graft.core.Rank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** R3 — the progressive-sampling driver loop (the reference's TopCloseness
  * variant, TopCloseness.java:76-107 + Sorter.java:36-53):
  *
  *  - schedule initialized by degree sort (degree desc, ties asc id —
  *    Sorter.degreeSort, Sorter.java:18-26);
  *  - each batch takes the next `batchSize` scheduled vertices and runs an
  *    exact BFS from each (one level-synchronous multi-source BFS here);
  *  - farness[s] accumulates the source's own exact farness
  *    (TopCloseness.java:158), approxFarness[v] accumulates d(s,v) over ALL
  *    processed sources (TopCloseness.java:159);
  *  - after each batch, `updateSchedule` re-sorts the UNPROCESSED segment by
  *    (approxFarness asc, ties asc id) — never-reached vertices carry 0 and
  *    sort first, exactly like the reference's int array
  *    (TopCloseness.java:180-186, Sorter.farnessSort:36-42);
  *  - the result order is the two-segment farnessSort: processed prefix by
  *    (farness asc, id asc), unprocessed tail by (approxFarness asc, id asc)
  *    (Sorter.java:36-53).
  *
  * S8 sink: with `snapshotDir` set, each batch's farnessSort order is written
  * as a JSON dataset under `run=<processedCount>/` — the engine form of
  * TopCloseness.printResult writing `results/<nextNode>.json`
  * (TopCloseness.java:189-201); [[graft.ingest.ResultsMerge]] is the
  * compact.py merge over those runs.
  *
  * Scale shape: the schedule is per-vertex metadata ranked with
  * [[Rank.globalRank]] (no single-partition sort); batch pivot selection is
  * a distributed TakeOrderedAndProject (`orderBy.limit`); accumulators are
  * n-row frames folded with union + groupBy and localCheckpoint'd per batch
  * to cut lineage, mirroring the engine's iterative-state discipline.
  */
object Progressive {

  /** Two-segment farnessSort position frame:
    * (id, processed 0/1, farness — 0 unless processed, apx_farness, pos).
    */
  private def farnessSort(
      verts: DataFrame, exactF: DataFrame, apxF: DataFrame): DataFrame = {
    val sc = verts
      .join(exactF.withColumnRenamed("farness", "ef"), Seq("id"), "left")
      .join(apxF, Seq("id"), "left")
      .select(
        col("id"),
        col("ef").isNotNull.as("proc"),
        coalesce(col("ef"), lit(0L)).as("farness"),
        coalesce(col("r"), lit(0L)).cast("long").as("apx_farness"))
    Rank.globalRank(sc, "pos",
        desc("proc"),
        when(col("proc"), col("farness")).otherwise(col("apx_farness")).asc,
        asc("id"))
      .select(col("id"), col("proc").cast("long").as("processed"),
        col("farness"), col("apx_farness"), col("pos"))
  }

  /** Run `numBatches` batches of `batchSize` exact BFS; returns the final
    * farnessSort frame.
    */
  def run(
      spark: SparkSession,
      adjacency: DataFrame,
      batchSize: Int,
      numBatches: Int,
      snapshotDir: Option[String] = None,
      onSuperstep: (Int, Long) => Unit = (_, _) => ()): DataFrame = {
    val verts = adjacency.select(col("src").as("id")).distinct().localCheckpoint(true)
    val deg = adjacency.select(col("src").as("id"), col("degree")).distinct()

    var exactF: Option[DataFrame] = None // (id, farness) for processed
    var apxF: Option[DataFrame] = None   // (id, r) accumulated reverse farness

    for (b <- 0 until numBatches) {
      val pivots =
        if (b == 0)
          deg.orderBy(desc("degree"), asc("id")).limit(batchSize)
            .select(col("id").as("pivot"))
        else
          verts
            .join(exactF.get.select("id"), Seq("id"), "left_anti")
            .join(apxF.get, Seq("id"), "left")
            .select(col("id"), coalesce(col("r"), lit(0L)).as("r"))
            .orderBy(asc("r"), asc("id")).limit(batchSize)
            .select(col("id").as("pivot"))
      val dist = MultiBfs.run(spark, adjacency, pivots, onSuperstep = onSuperstep)
        .localCheckpoint(true)
      val bf = dist.groupBy(col("pivot").as("id"))
        .agg(sum("dist").cast("long").as("farness"))
      val br = dist.groupBy("id").agg(sum("dist").cast("long").as("r"))
      exactF = Some(exactF.map(_.unionAll(bf)).getOrElse(bf).localCheckpoint(true))
      apxF = Some(apxF
        .map(p => p.unionAll(br).groupBy("id").agg(sum("r").as("r")))
        .getOrElse(br).localCheckpoint(true))
      snapshotDir.foreach { dir =>
        farnessSort(verts, exactF.get, apxF.get)
          .select("pos", "id")
          .write.mode("overwrite").json(s"$dir/run=${(b + 1) * batchSize}")
      }
    }

    farnessSort(verts, exactF.get, apxF.get)
  }
}
