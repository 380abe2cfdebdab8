package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Arc-list text source/sink (SURVEY.md §2.1 S2/S6): the reference's
  * whitespace-separated `src dst` one-arc-per-line format
  * (GraphBuilder.java:15-33 read, GraphReader.java:14-35 dump).
  *
  * Reading tolerates the reference's dirty inputs (GraphSorter.java:23-46):
  * malformed lines are dropped, `dst` is abs()'d, an optional 1-based→0-based
  * offset shift is applied (GraphSorter.java:31,51-56).
  */
object ArcList {

  def read(spark: SparkSession, path: String, offset: Long = 0L): DataFrame =
    spark.read.text(path)
      .select(trim(col("value")).as("line"))
      .where(col("line").rlike("^\\d+\\s+-?\\d+$"))
      .select(split(col("line"), "\\s+").as("p"))
      .select(
        (element_at(col("p"), 1).cast("long") - offset).as("src"),
        (abs(element_at(col("p"), 2).cast("long")) - offset).as("dst"))

  def write(edges: DataFrame, path: String): Unit =
    edges
      .orderBy("src", "dst")
      .select(concat_ws(" ", col("src"), col("dst")).as("value"))
      .write.mode("overwrite").text(path)
}
