package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Graph
import graft.data.Tpch
import graft.algo.{BitsetBfs, Chechik, MultiBfs}

/** Dev probe: phase-level wall-clock of the flagship Chechik top-k internals
  * (estimator / sample visit + HT / schedule / certification batches) in the
  * bench regime — replicates `Chechik.topkCloseness` with timers so the
  * optimization round knows where the ~40 s actually goes. Args:
  * [sfDir] [forceBitset: auto|row|bitset]
  */
object ChechikPhase {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val force = args.lift(1).getOrElse("auto")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[phase] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }

    val adjacency = Graph.adjacency(Graph.symmetrize(Tpch.sparseEdges(spark, dir))).persist()
    adjacency.count()
    val k = 10; val eps = 0.1; val seed = 42; val batchSize = 128
    val mat = new graft.core.LocalMaterializer(window = 0)

    val total0 = System.nanoTime()
    val verts = adjacency.select(col("src").as("id")).distinct().localCheckpoint(true)
    val n = verts.count()
    println(s"[phase] n=$n")
    val bprep = t("bprep")(BitsetBfs.prepare(adjacency))
    val nPivots = math.max(math.ceil(math.log(n.toDouble) / math.log(2)).toLong, 2L).min(n)
    val pivots = verts.orderBy(xxhash64(lit(seed), col("id"))).limit(nPivots.toInt)
      .select(col("id").as("pivot"))
    var steps = 0
    val countStep = (_: Int, _: Long) => steps += 1
    val forceB = force match {
      case "row" => Some(false); case "bitset" => Some(true); case _ => None
    }
    val probs = t("estimator")(Chechik.estimatorCoefficients(
        spark, adjacency, pivots, verts, n, eps, countStep, forceBitset = forceB,
        prep = bprep)
      .select(col("id"), col("p")).localCheckpoint(true))
    println(s"[phase]   estimator supersteps=$steps")

    val sample = probs.where(
      pmod(xxhash64(lit(seed + 1), col("id")), lit(1000000L)).cast("double") / 1000000.0
        < col("p")).localCheckpoint(true)
    val sampleSize = sample.count()
    println(s"[phase] sampleSize=$sampleSize")

    val useBit = forceB.getOrElse(sampleSize * n > (1L << 25))
    steps = 0
    val apxFarness = t("sample_visit+HT")(if (useBit) {
      val vSample = BitsetBfs.visit(spark, adjacency,
        sample.select(col("id").as("pivot")),
        maskCols = math.max(1L, math.min(16L, (sampleSize + 63) / 64)).toInt,
        onSuperstep = countStep, prep = bprep)
      val out = BitsetBfs.reverseSum(
          vSample, sample.select(col("id").as("pivot"), col("p").as("div")))
        .select(col("id"), col("value").as("apxF"))
        .localCheckpoint(true)
      vSample.release()
      out
    } else {
      MultiBfs.run(spark, adjacency, sample.select(col("id").as("pivot")),
          onSuperstep = countStep)
        .join(sample.select(col("id").as("pivot"), col("p")), "pivot")
        .groupBy("id")
        .agg(sum(col("dist").cast("double") / col("p")).as("apxF"))
        .localCheckpoint(true)
    })
    println(s"[phase]   sample visit supersteps=$steps")

    val schedule = t("schedule")(graft.core.Rank.globalRank(
      verts.join(apxFarness, Seq("id"), "left")
        .select(col("id"), coalesce(col("apxF"), lit(Double.MaxValue)).as("apxF")),
      "pos", asc("apxF"), asc("id")).localCheckpoint(true))

    val batch = math.max(k, batchSize)
    var processed: Option[org.apache.spark.sql.DataFrame] = None
    var l = 0L
    var certified = 0L
    while (certified < k && l < n) {
      steps = 0
      val batchIds = schedule.where(col("pos") >= l && col("pos") < l + batch)
        .select(col("id").as("pivot"))
      val useBitB = forceB.getOrElse(batch * n > (1L << 25))
      val (exactF, releaseBatch) = t(s"batch@$l exactF") {
        if (useBitB) {
          val vb = BitsetBfs.visit(spark, adjacency, batchIds,
            maskCols = math.max(1L, math.min(16L, (batch + 63) / 64)).toInt,
            onSuperstep = countStep, prep = bprep)
          (BitsetBfs.farness(vb).select(col("id"), col("farness")), () => vb.release())
        } else
          (MultiBfs.run(spark, adjacency, batchIds, onSuperstep = countStep)
            .groupBy(col("pivot").as("id"))
            .agg(sum("dist").cast("long").as("farness")), () => ())
      }
      t(s"batch@$l processed ckpt") {
        processed = Some(mat.iterate(
          processed.map(_.unionAll(exactF)).getOrElse(exactF), (l / batch).toInt, certified.toDouble))
      }
      releaseBatch()
      l += batch
      certified = t(s"batch@${l - batch} certify") {
        val remAgg = schedule.where(col("pos") >= l)
          .agg(coalesce(max(lit(1.0) / nullif(col("apxF"), lit(0.0))), lit(0.0)).as("maxRem"))
        processed.get
          .crossJoin(broadcast(remAgg))
          .agg(count(when(
            col("farness") > 0 &&
              lit(1.0) / col("farness") >= lit(1.0 + eps) * col("maxRem"), 1)))
          .head().getLong(0)
      }
      println(s"[phase]   batch supersteps=$steps certified=$certified")
    }
    println(f"[phase] TOTAL ${(System.nanoTime() - total0) / 1e9}%.2f s")
    spark.stop()
  }
}
