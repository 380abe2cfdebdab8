package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Graph
import graft.algo.BitsetBfs
import graft.data.Synth

/** Ad-hoc A/B probe for the bitset-histogram assembly (not part of the
  * driver contract): one visit, then each histogram variant timed on the
  * SAME cached increments. Usage:
  *   runMain graft.tools.HistProbe <cores> <nVertices> <pivots>
  */
object HistProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).map(_.toInt).getOrElse(8)
    val n = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val pivots = args.lift(2).map(_.toInt).getOrElse(512)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.codegen.maxFields",
        sys.env.getOrElse("GRAFT_CODEGEN_MAXFIELDS", "100"))
      .config("spark.sql.codegen.hugeMethodLimit",
        sys.env.getOrElse("GRAFT_CODEGEN_HUGELIMIT", "65535"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[histprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      a
    }

    val adj = t("build") {
      Graph.adjacency(Graph.symmetrize(Synth.edges(spark, n))).persist()
    }
    val deg = adj.select(col("src").as("id"), col("degree")).distinct().localCheckpoint(true)
    val sources = t("sources")(deg.orderBy("id").limit(pivots)
      .select(col("id").as("pivot")).localCheckpoint(true))
    var vt = 0.0
    var vlast = System.nanoTime()
    val v = t("visit") {
      vlast = System.nanoTime()
      BitsetBfs.visit(spark, adj, sources, maskCols = math.min(16, (pivots + 63) / 64),
        onSuperstep = (d, fr) => {
          val now = System.nanoTime()
          println(f"[histprobe] visit superstep $d: ${(now - vlast) / 1e9}%.1fs frontier=$fr")
          vt += (now - vlast) / 1e9; vlast = now
        })
    }
    println(f"[histprobe] visit tickSum=$vt%.1f")
    val ms = v.maskNames

    def body: DataFrame = v.increments.collect { case (w, d, inc) if d > 0 =>
      inc.select(lit(w).as("wave") +: lit(d).as("dist") +: ms.map(col): _*)
    }.reduce(_ unionAll _)

    // old round-3 form: weighted double sums in ONE aggregate over the rows
    def oldHist(): Long = {
      val sums = for { (m, j) <- ms.zipWithIndex; b <- 0 until 64 }
        yield sum(expr(s"shiftright($m, $b) & 1").cast("double") / col("dist")).as(s"s_${j}_$b")
      body.groupBy("wave").agg(sums.head, sums.tail: _*).count()
    }

    // round-4 form: integer bit counts by (wave, dist), weight applied after
    def newHist(): Long = {
      val counts = for { (m, j) <- ms.zipWithIndex; b <- 0 until 64 }
        yield sum(expr(s"shiftright($m, $b) & 1")).as(s"c_${j}_$b")
      val byDist = body.groupBy("wave", "dist").agg(counts.head, counts.tail: _*)
      val sums = for { j <- ms.indices; b <- 0 until 64 }
        yield sum((lit(1.0) / col("dist")) * col(s"c_${j}_$b")).as(s"s_${j}_$b")
      byDist.groupBy("wave").agg(sums.head, sums.tail: _*).count()
    }

    // warm both once at tiny scale? run alternating reps instead
    for (r <- 1 to 2) {
      t(s"old rep$r")(oldHist())
      t(s"new rep$r")(newHist())
    }

    // bench-path split: fresh visit, then each consumer timed separately
    var tickSum = 0.0
    var last = System.nanoTime()
    val v2 = t("visit2") {
      last = System.nanoTime()
      BitsetBfs.visit(spark, adj, sources,
        maskCols = math.min(16, (pivots + 63) / 64),
        onSuperstep = (_, _) => {
          val now = System.nanoTime(); tickSum += (now - last) / 1e9; last = now
        })
    }
    println(f"[histprobe] visit2 tickSum=$tickSum%.1f")
    // histogram sub-stages on v1 (increments cached + already scanned)
    locally {
      val counts = for { (m, j) <- ms.zipWithIndex; b <- 0 until 64 }
        yield sum(expr(s"shiftright($m, $b) & 1")).as(s"c_${j}_$b")
      val byDist = body.groupBy("wave", "dist").agg(counts.head, counts.tail: _*)
      val sums = for { j <- ms.indices; b <- 0 until 64 }
        yield sum((lit(1.0) / col("dist")) * col(s"c_${j}_$b")).as(s"s_${j}_$b")
      val agg2 = byDist.groupBy("wave").agg(sums.head, sums.tail: _*)
      t("agg2 count")(agg2.count())
      val stackArgs = (for { j <- ms.indices; b <- 0 until 64 }
        yield s"$j, $b, s_${j}_$b").mkString(", ")
      val h = agg2.selectExpr("wave", s"stack(${64 * ms.size}, $stackArgs) AS (mcol, mbit, h)")
      t("h collect")(h.collect().length)
      t("join count") {
        v.idx.join(broadcast(h), Seq("wave", "mcol", "mbit"), "left")
          .select(col("pivot").as("id"), coalesce(col("h"), lit(0.0)).as("harmonic"))
          .count()
      }
    }
    t("harmonic(v1) again")(BitsetBfs.harmonic(v).count())

    // typed-Aggregator bit counting: primitive long[] buffer, set-bit loop
    locally {
      import org.apache.spark.sql.expressions.Aggregator
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      val mc = ms.size
      val agg = new Aggregator[Seq[Long], Array[Long], Seq[Long]] {
        def zero: Array[Long] = new Array[Long](64 * mc)
        def reduce(buf: Array[Long], masks: Seq[Long]): Array[Long] = {
          var j = 0
          while (j < mc) {
            var m = masks(j)
            while (m != 0L) {
              buf(j * 64 + java.lang.Long.numberOfTrailingZeros(m)) += 1L
              m &= m - 1
            }
            j += 1
          }
          buf
        }
        def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
        }
        def finish(b: Array[Long]): Seq[Long] = b.toSeq
        def bufferEncoder = ExpressionEncoder[Array[Long]]()
        def outputEncoder = ExpressionEncoder[Seq[Long]]()
      }
      val bitcount = udaf(agg, ExpressionEncoder[Seq[Long]]())
      val byDist = body
        .select(col("wave"), col("dist"), array(ms.map(col): _*).as("masks"))
        .groupBy("wave", "dist").agg(bitcount(col("masks")).as("cnt"))
      t("udaf bitcount #1")(byDist.collect().length)
      t("udaf bitcount #2")(byDist.collect().length)
      val h2 = byDist
        .select(col("wave"), col("dist"),
          posexplode(col("cnt")).as(Seq("pos", "c")))
        .withColumn("h", (lit(1.0) / col("dist")) * col("c"))
        .groupBy(col("wave"), (col("pos") / 64).cast("int").as("mcol"),
          pmod(col("pos"), lit(64)).cast("int").as("mbit"))
        .agg(sum("h").as("h"))
      t("udaf full h + join") {
        v.idx.join(broadcast(h2), Seq("wave", "mcol", "mbit"), "left")
          .select(col("pivot").as("id"), coalesce(col("h"), lit(0.0)).as("harmonic"))
          .count()
      }
    }
    spark.stop()
  }
}
