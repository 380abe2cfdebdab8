package graft.algo

import graft.core.{Materializer, LocalMaterializer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components by iterative hash-min label propagation
  * (SURVEY.md §2.12 G1 — the reference only prints the component COUNT of the
  * symmetrized graph via WebGraph's SCC, Main.java:59; we also expose labels).
  *
  * Label(v) converges to the minimum vertex ID in v's component —
  * deterministic, so component IDs are exactly comparable to any oracle
  * (north rule: "component IDs ... exactly").
  *
  * Superstep: newLabel(v) = min(label(v), min over neighbors u of label(u)),
  * a single join + groupBy(min); stop when no label changes. Converges in
  * O(diameter) supersteps on symmetrized inputs.
  */
object Components {

  case class Result(labels: DataFrame, iterations: Int)

  def run(
      spark: SparkSession,
      adjacency: DataFrame,
      maxIter: Int = 256,
      mat: Materializer = new LocalMaterializer(window = 3),
      onSuperstep: (Int, Long) => Unit = (_, _) => ()): Result = {

    var (iter, resumedState) = mat.resumeIncrements().lastOption.getOrElse {
      val init = adjacency.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("label"))
      (0, mat.iterate(init, 0, -1.0))
    }
    var labels = resumedState.select("id", "label")

    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      iter += 1
      // STATS DISCIPLINE (see PageRank): the superstep must reference the
      // previous `labels` state additively, never multiplicatively —
      // localCheckpoint inherits originStats and join stats multiply, so
      // a labels⋈msgs(⊃labels) shape squares sizeInBytes every iteration.
      // Self-messages via unionAll (stats ADD) give the same min() semantics.
      val nbrMsgs = labels
        .join(adjacency, labels("id") === adjacency("src"))
        .select(explode(col("neighbors")).as("id"), col("label"))
      val updated = nbrMsgs
        .unionAll(labels.select(col("id"), col("label")))
        .groupBy("id")
        .agg(min("label").as("label"))
      // deferred checkpoint: the changed-count below materializes it —
      // one job per superstep instead of checkpoint + count
      val state = mat.iterateDeferred(updated, iter, -1.0)
      // convergence: labels that changed — a scalar join of two checkpointed
      // frames, its stats die with the job
      changed = state.join(labels.withColumnRenamed("label", "prev"), "id")
        .where(col("label") =!= col("prev"))
        .count()
      labels = state
      onSuperstep(iter, changed)
    }
    Result(labels, iter)
  }
}
