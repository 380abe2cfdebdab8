package graft

import graft.ann.Ann
import graft.data.Tpch
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions: the 100 TB design claims (pushdown,
  * pruning, broadcast, codegen) must be visible in `.explain`, not just
  * asserted in prose.
  */
class PlanSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("projection prunes the parquet scan to selected columns") {
    val plan = Tpch.table(spark, dir, "documents").select("doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"), plan)
  }

  test("equality filter pushes down to the parquet scan") {
    val plan = Tpch.table(spark, dir, "documents")
      .where(col("doc_id") === 7L).select("doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(doc_id,7)"), plan)
  }

  test("knnBrute broadcasts the 1-row query vector and stays in codegen") {
    val df = Ann.knnBrute(Tpch.table(spark, dir, "embeddings"), queryId = 0L, k = 5)
    df.collect() // AQE finalizes the physical plan only on execution
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan)
    // whole-stage-codegen'd operators print with a "*(stageId)" prefix
    assert(plan.contains("*("), plan)
  }

  test("degree top-k plan is TakeOrderedAndProject, not a global sort") {
    val deg = graft.core.Graph.degrees(
      graft.core.Graph.symmetrize(Tpch.sparseEdges(spark, dir)))
    val plan = deg.orderBy(desc("degree")).limit(20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
