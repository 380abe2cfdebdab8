package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S9 — the results merge (reference results/compact.py:1-21): concatenate
  * per-run result files into one relation, ordered by run number — the
  * "natural sort" of the numeric filenames.
  *
  * Engine layout: json files under `base/run=[n]/` (written by
  * [[graft.algo.Progressive]]'s snapshot sink). Spark partition discovery
  * types `run` as a number, so compact.py's `natural_keys` filename sort is
  * simply `ORDER BY run, pos` — and the read stays a distributed JSON scan
  * instead of a driver-side file loop.
  */
object ResultsMerge {
  def merge(spark: SparkSession, base: String): DataFrame =
    spark.read.json(base)
      .select(
        col("run").cast("long").as("run"),
        col("pos").cast("long").as("pos"),
        col("id").cast("long").as("id"))
      .orderBy("run", "pos")
}
