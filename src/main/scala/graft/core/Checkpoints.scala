package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, Path}
import scala.collection.mutable

/** Per-iteration materialization for driver-side iterative algorithms.
  *
  * Iterative Dataset joins grow the Catalyst plan every superstep
  * (SURVEY.md §7.3 #1): persist() caches data but does NOT truncate the
  * logical plan, so analysis/optimization re-walks the whole lineage each
  * iteration. `localCheckpoint` (or a parquet round-trip) cuts the plan.
  *
  * Algorithms materialize per-iteration INCREMENTS (BFS: the newly-visited
  * frontier; PageRank: the new rank vector) — never rewrite accumulated
  * state, which at 100 TB would mean re-writing the world every superstep.
  *
  * Two strategies:
  *   - [[LocalMaterializer]]: eager `localCheckpoint` per iteration;
  *     `window > 0` evicts all but the last `window` iterations (for
  *     algorithms whose state is replaced, e.g. PageRank), `window = 0`
  *     keeps everything (for accumulating state, e.g. BFS visited-set
  *     increments, which stay live until the final aggregate).
  *   - [[DirMaterializer]]: parquet per iteration under `dir/iter=NNNN/`
  *     plus `_graft_meta.json` (iteration, convergence metric, partition
  *     count, wall time) — the north rule's "checkpointed per-iteration with
  *     per-partition lineage and convergence metrics so runs resume
  *     mid-algorithm". Parquet writes one file per partition: that is the
  *     per-partition lineage unit a resumed run re-reads.
  */
trait Materializer {
  /** Materialize iteration `iter`'s increment; the returned frame's plan no
    * longer references prior iterations. `metric` is this iteration's
    * convergence figure (frontier size, L∞ delta, label flips...).
    */
  def iterate(df: DataFrame, iter: Int, metric: Double): DataFrame

  /** Previously completed increments (iter → frame), ascending, for resume. */
  def resumeIncrements(): Seq[(Int, DataFrame)] = Seq.empty

  def close(): Unit = ()
}

final class LocalMaterializer(window: Int = 0) extends Materializer {
  private val live = mutable.Queue.empty[DataFrame]
  override def iterate(df: DataFrame, iter: Int, metric: Double): DataFrame = {
    val out = df.localCheckpoint(true)
    if (window > 0) {
      live.enqueue(out)
      while (live.size > window) live.dequeue().unpersist(false)
    }
    out
  }
}

final class DirMaterializer(spark: SparkSession, dir: String) extends Materializer {
  private def iterDir(i: Int): String = f"$dir/iter=$i%05d"
  private def metaPath(i: Int): Path = Paths.get(iterDir(i), "_graft_meta.json")

  override def iterate(df: DataFrame, iter: Int, metric: Double): DataFrame = {
    val d = iterDir(iter)
    df.write.mode("overwrite").parquet(d)
    val out = spark.read.parquet(d)
    val parts = out.rdd.getNumPartitions
    // written only after the parquet commit ⇒ doubles as a completion flag
    Files.writeString(
      metaPath(iter),
      s"""{"iter":$iter,"metric":$metric,"partitions":$parts,"wallMs":${System.currentTimeMillis()}}""")
    out
  }

  override def resumeIncrements(): Seq[(Int, DataFrame)] = {
    val base = Paths.get(dir)
    if (!Files.isDirectory(base)) return Seq.empty
    val iters = Files.list(base).toArray.toSeq
      .map(_.toString)
      .filter(_.matches(".*iter=\\d+$"))
      .map(p => p.substring(p.lastIndexOf('=') + 1).toInt)
      .filter(i => Files.exists(metaPath(i)))
      .sorted
    iters.map(i => (i, spark.read.parquet(iterDir(i))))
  }
}
