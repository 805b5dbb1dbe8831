package graft.graph

import scala.collection.mutable

/** Beam-local approximate personalized PageRank (Andersen push) and
  * conductance sweep cut — the community step the reference runs on each
  * candidate edge's local neighborhood
  * (/root/reference/src/gnn/lcilp/subgraph_extraction/multicom.py:52-141,
  * wired at graph_sampler.py:319-325).
  *
  * These run INSIDE a mapGroups beam over one extracted subgraph (a few
  * hundred nodes), exactly as SURVEY.md §2.7 prescribes — a global
  * Pregel-style PPR would be wasted work since the reference only ever
  * evaluates the seed pair's neighborhood.
  */
object Ppr {

  /** alpha=0.85, eps=1e-3 defaults mirror multicom.py:52.
    *
    * `fullDeg` (optional): true full-graph degrees for nodes whose `adj`
    * entry is a beam-local truncation — pushes then normalize by the
    * real degree, and mass owed to outside-beam neighbors is dropped
    * (it is below eps at the beam boundary by construction).
    */
  def approximatePpr(
      adj: Map[Long, Array[Long]],
      seeds: Seq[Long],
      alpha: Double = 0.85,
      eps: Double = 1e-3,
      fullDeg: Map[Long, Int] = Map.empty): Map[Long, Double] = {
    val p = mutable.Map[Long, Double]().withDefaultValue(0.0)
    val r = mutable.Map[Long, Double]().withDefaultValue(0.0)
    seeds.foreach(s => r(s) = 1.0 / seeds.size)
    def deg(u: Long): Int =
      fullDeg.getOrElse(u, adj.getOrElse(u, Array.empty).length)
    val queue = mutable.Queue[Long](seeds.filter(s => r(s) >= eps * math.max(deg(s), 1)): _*)
    val inQueue = mutable.Set[Long](queue.toSeq: _*)
    while (queue.nonEmpty) {
      val u = queue.dequeue(); inQueue -= u
      val du = math.max(deg(u), 1)
      val ru = r(u)
      if (ru >= eps * du) {
        p(u) += (1 - alpha) * ru
        val push = alpha * ru / du
        r(u) = 0.0
        adj.getOrElse(u, Array.empty).foreach { v =>
          r(v) += push
          if (r(v) >= eps * math.max(deg(v), 1) && !inQueue(v)) {
            queue.enqueue(v); inQueue += v
          }
        }
      }
    }
    p.toMap
  }

  /** Greedy conductance sweep over PPR-desc-sorted nodes; local-minimum
    * early stop window of 10 (multicom.py:93-141). Returns the community
    * node set.
    */
  def sweepCut(
      adj: Map[Long, Array[Long]],
      ppr: Map[Long, Double],
      fullDeg: Map[Long, Int] = Map.empty,
      totalVolOverride: Option[Double] = None): Set[Long] = {
    val order = ppr.toSeq.sortBy { case (n, s) => (-s, n) }.map(_._1)
    if (order.isEmpty) return Set.empty
    def degOf(u: Long): Int =
      fullDeg.getOrElse(u, adj.getOrElse(u, Array.empty).length)
    val totalVol = totalVolOverride.getOrElse(
      adj.values.map(_.length.toLong).sum.toDouble)
    val in = mutable.Set[Long]()
    var vol = 0.0
    var cut = 0.0
    var best = Double.MaxValue
    var bestIdx = -1
    var sinceBest = 0
    var i = 0
    while (i < order.length && sinceBest < 10) {
      val u = order(i)
      val nbrs = adj.getOrElse(u, Array.empty)
      // cut delta: the node's full degree minus twice its edges into the
      // set; beam-internal edges are complete (induced subgraph), so
      // with fullDeg this equals the full-graph conductance restricted
      // to candidate sets inside the beam
      vol += degOf(u)
      cut += degOf(u) - 2 * nbrs.count(v => in(v))
      in += u
      val denom = math.min(vol, totalVol - vol)
      val cond = if (denom <= 0) Double.MaxValue else cut / denom
      if (cond < best) { best = cond; bestIdx = i; sinceBest = 0 }
      else sinceBest += 1
      i += 1
    }
    order.take(bestIdx + 1).toSet
  }
}
