package graft.tools

/** Ad-hoc host probe (not part of the driver contract): random 64-byte-line
  * read-modify-write throughput at N threads — the access pattern of the
  * tile message aggregate (each arc ORs an 8-long contiguous stripe at a
  * hash-random position of a ~128 MB per-task buffer). The Bench hw_ceiling
  * burns measure arithmetic and SEQUENTIAL-stream scaling; random-line RMW
  * saturates DRAM differently (latency/MLP-bound per thread, controller-
  * bound across threads), so its 2→8-thread scaling — not the sequential
  * curve — is the matched ceiling for the message-superstep legs.
  *
  * Usage: runMain graft.tools.RmwProbe [threads] [mbPerThread] [opsPerThread]
  * Plain JVM threads, no Spark.
  */
object RmwProbe {
  def run(threads: Int, mbPerThread: Int, opsPerThread: Long): Double = {
    val lines = mbPerThread.toLong * 1024 * 1024 / 64
    val len = (lines * 8).toInt
    val arrays = (0 until threads).map { i =>
      val a = new Array[Long](len)
      var j = 0
      while (j < len) { a(j) = i.toLong + j; j += 1 }
      a
    }
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val ts = arrays.zipWithIndex.map { case (a, i) =>
      new Thread(() => {
        var x = 0x9e3779b97f4a7c15L ^ (i + 1).toLong
        var op = 0L
        val mask = lines - 1
        while (op < opsPerThread) {
          // xorshift64* index stream, line-aligned stripe of 8 longs
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          val base = ((x & Long.MaxValue) & mask).toInt * 8
          var j = 0
          while (j < 8) { a(base + j) |= x + j; j += 1 }
          op += 1
        }
        sink.addAndGet(a(((x & Long.MaxValue) % len).toInt))
      })
    }
    val t0 = System.nanoTime()
    ts.foreach(_.start())
    ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    threads.toDouble * opsPerThread * 64 / sec // bytes/sec of touched lines
  }

  def main(args: Array[String]): Unit = {
    val threads = args.lift(0).map(_.toInt).getOrElse(8)
    val mb = args.lift(1).map(_.toInt).getOrElse(128)
    val ops = args.lift(2).map(_.toLong).getOrElse(64L * 1024 * 1024)
    val gbps = run(threads, mb, ops) / 1e9
    println(f"[rmwprobe] threads=$threads mb=$mb ops=$ops rmw=$gbps%.2f GB/s")
  }
}
