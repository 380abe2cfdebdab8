package graft

/** Exact in-memory reference algorithms (the test oracle, SURVEY.md §5.2.2)
  * — replicates GeometricCentralities.IterationThread semantics
  * (GeometricCentralities.java:151-207) with Long farness, plus reference
  * implementations of PageRank / CC / LPA / triangles for allclose checks.
  */
object InMemoryOracle {

  /** adjacency sets from an undirected edge list (nodes = endpoints). */
  def adj(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] = {
    val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }.filter(e => e._1 != e._2)
    sym.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
  }

  def nodes(edges: Seq[(Long, Long)]): Seq[Long] =
    edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted

  /** BFS hop distances from `src` (src → 0). */
  def bfs(a: Map[Long, Set[Long]], src: Long): Map[Long, Int] = {
    var dist = Map(src -> 0)
    var frontier = Set(src)
    var d = 0
    while (frontier.nonEmpty) {
      d += 1
      val next = frontier.flatMap(a.getOrElse(_, Set.empty)).diff(dist.keySet)
      next.foreach(v => dist += v -> d)
      frontier = next
    }
    dist
  }

  case class Scores(farness: Long, harmonic: Double, exponential: Double,
      reachable: Long, closeness: Double, lin: Double)

  /** All six geometric scores of one vertex (exact reference semantics). */
  def geometric(a: Map[Long, Set[Long]], src: Long, alpha: Double = 0.5): Scores = {
    val dist = bfs(a, src)
    val pos = dist.values.filter(_ > 0)
    val far = pos.map(_.toLong).sum
    val harm = pos.map(1.0 / _).sum
    val expo = pos.map(d => math.pow(alpha, d)).sum
    val reach = dist.size.toLong // includes the source
    Scores(far, harm, expo, reach,
      if (far > 0) 1.0 / far else 0.0,
      if (far > 0) reach.toDouble * reach / far else 1.0)
  }

  /** PageRank, symmetrized graph, fixed damping; returns after `iters` or
    * when L∞ < tol. */
  def pagerank(a: Map[Long, Set[Long]], ns: Seq[Long], damping: Double,
      iters: Int, tol: Double = 0.0): Map[Long, Double] = {
    val n = ns.size
    var r = ns.map(_ -> 1.0 / n).toMap
    var it = 0
    var delta = Double.MaxValue
    while (it < iters && (tol <= 0 || delta > tol)) {
      it += 1
      val msgs = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      var dangling = 0.0
      ns.foreach { v =>
        val out = a.getOrElse(v, Set.empty)
        if (out.isEmpty) dangling += r(v)
        else out.foreach(u => msgs(u) += r(v) / out.size)
      }
      val nr = ns.map(v => v -> ((1 - damping) / n + damping * (msgs(v) + dangling / n))).toMap
      delta = ns.map(v => math.abs(nr(v) - r(v))).max
      r = nr
    }
    r
  }

  /** Connected components: label = min vertex id per component. */
  def components(a: Map[Long, Set[Long]], ns: Seq[Long]): Map[Long, Long] =
    ns.map(v => v -> (bfs(a, v).keySet + v).min).toMap

  /** Synchronous LPA, min-label tie-break, fixed rounds (LabelProp rule). */
  def lpa(a: Map[Long, Set[Long]], ns: Seq[Long], rounds: Int): Map[Long, Long] = {
    var labels = ns.map(v => v -> v).toMap
    (1 to rounds).foreach { _ =>
      labels = ns.map { v =>
        val nbrs = a.getOrElse(v, Set.empty)
        if (nbrs.isEmpty) v -> labels(v)
        else {
          val counts = nbrs.toSeq.map(labels).groupBy(identity).map { case (l, xs) => (l, xs.size) }
          val best = counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
          v -> best
        }
      }.toMap
    }
    labels
  }

  /** Global triangle count. */
  def triangles(a: Map[Long, Set[Long]], ns: Seq[Long]): Long =
    ns.flatMap { v =>
      val nb = a.getOrElse(v, Set.empty).filter(_ > v).toSeq
      for (i <- nb.indices; j <- (i + 1) until nb.size
           if a(nb(i)).contains(nb(j))) yield 1L
    }.sum
}
