package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Catalyst plumbing that needs `private[sql]` access (`Dataset.ofRows`), so
  * it lives in an `org.apache.spark.sql` subpackage — a plain shim over the
  * public Apache Spark source, nothing else.
  *
  * Why it exists: `Dataset.localCheckpoint` copies the ORIGIN plan's
  * statistics into the new `LogicalRDD` (`LogicalRDD.fromDataset` captures
  * `optimizedPlan.stats` as `originStats`). For an iterative algorithm whose
  * superstep references the previous state TWICE — e.g. a BFS superstep that
  * extracts the frontier from the state AND joins aggregated messages back
  * into it — join size estimates MULTIPLY, so the inherited stats SQUARE
  * every superstep: sizeInBytes becomes a BigInt whose digit count doubles
  * per iteration, and the eager stats capture inside the next checkpoint
  * call ends up multiplying million-digit numbers on the driver (serial,
  * unbounded). That is exactly the cost that blocked the co-partitioned
  * state⋈messages superstep in round 3.
  *
  * [[strip]] rebuilds the checkpointed frame with `originStats` and
  * `originConstraints` dropped — size estimates reset to
  * `spark.sql.defaultSizeInBytes` at every checkpoint boundary, so nothing
  * compounds — while KEEPING the checkpointed RDD, schema, output
  * partitioning and ordering. Keeping `outputPartitioning` is the point:
  * a state frame that a join or aggregate left hash-partitioned on its key
  * stays recognizably co-partitioned, and the next superstep's
  * state⋈messages join needs no state-side exchange.
  *
  * Joins over a stripped frame see `defaultSizeInBytes` (Long.MaxValue), so
  * Catalyst will never auto-broadcast it and `preferSortMergeJoin=false`
  * alone no longer selects shuffled-hash (`canBuildLocalHashMap` fails on
  * unknown sizes) — loop joins over stripped state must say
  * `.hint("shuffle_hash")` explicitly. Explicit `broadcast(...)` hints are
  * unaffected.
  */
object CheckpointStats {

  /** Drop inherited `originStats`/`originConstraints` from a checkpointed
    * frame, keeping RDD + partitioning + ordering. No-op for plans that are
    * not a bare `LogicalRDD` (e.g. a `DirMaterializer` parquet round-trip,
    * whose scan stats are real file sizes and reset naturally).
    */
  def strip(df: DataFrame): DataFrame = df.queryExecution.logical match {
    case lr: LogicalRDD =>
      val spark = df.sparkSession.asInstanceOf[ClassicSession]
      Dataset.ofRows(
        spark,
        LogicalRDD(
          lr.output,
          lr.rdd,
          lr.outputPartitioning,
          lr.outputOrdering,
          lr.isStreaming,
          lr.stream)(spark, None, None))
    case _ => df
  }

  /** [[strip]], additionally ASSERTING that the checkpointed rows are
    * hash-partitioned by `keys` with the RDD's own partition count.
    *
    * Why assert instead of keep: a full-outer USING join emits
    * `coalesce(l.k, r.k) AS k` — a fresh attribute Catalyst cannot trace to
    * either side's partitioning — so `Dataset.localCheckpoint` records
    * `UnknownPartitioning` even though every output row physically sits in
    * the partition `hash(keys)` selected by the join's own exchanges
    * (coalesce of two join keys that are equal-or-absent IS the key). The
    * caller must guarantee exactly that invariant: the frame is the
    * (projected) output of a co-partitioned join/aggregate keyed on `keys`,
    * planned with AQE off (coalesced or skew-split partitions are NOT a
    * `HashPartitioning` — asserting one over them would silently misjoin).
    * Used by the MultiBfs superstep loop, which pins AQE off for its
    * duration. No-op for plans that are not a bare `LogicalRDD`.
    */
  def stripHashPartitioned(df: DataFrame, keys: Seq[String]): DataFrame =
    df.queryExecution.logical match {
      case lr: LogicalRDD =>
        val spark = df.sparkSession.asInstanceOf[ClassicSession]
        val attrs = keys.map(k => lr.output.find(_.name == k).getOrElse(
          throw new IllegalArgumentException(
            s"stripHashPartitioned: no column '$k' in ${lr.output.map(_.name)}")))
        Dataset.ofRows(
          spark,
          LogicalRDD(
            lr.output,
            lr.rdd,
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(
              attrs, lr.rdd.getNumPartitions),
            lr.outputOrdering,
            lr.isStreaming,
            lr.stream)(spark, None, None))
      case _ => df
    }
}
