package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{Bfs, Ppr, Subgraphs}

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // hand-sized fixture graph (FIXTURES.md F8): path + diamond + satellite
  //   1-2-3-4-5 path;  10-11, 10-12, 11-13, 12-13 diamond;  3-10 bridge
  val rawEdges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (10L, 11L), (10L, 12L), (11L, 13L), (12L, 13L),
    (3L, 10L))
  def edges = Bfs.undirected(rawEdges.toDF("src", "dst"))

  test("kHop: levels and reach are exact") {
    val got = Bfs.kHop(edges, Seq(1L).toDF("node"), 2)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2))
    val got3 = Bfs.kHop(edges, Seq(1L).toDF("node"), 3)
      .as[(Long, Int)].collect().toMap
    assert(got3 == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 10L -> 3))
  }

  test("kHop maxNodesPerHop caps each level deterministically") {
    val a = Bfs.kHop(edges, Seq(3L).toDF("node"), 2, Some(2)).collect()
    val b = Bfs.kHop(edges, Seq(3L).toDF("node"), 2, Some(2)).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
    val perLevel = Bfs.kHop(edges, Seq(3L).toDF("node"), 2, Some(2))
      .as[(Long, Int)].collect().groupBy(_._2).view.mapValues(_.length).toMap
    assert(perLevel.forall { case (lvl, n) => lvl == 0 || n <= 2 })
  }

  test("enclosing subgraph + double-radius labels: diamond candidate") {
    // candidate edge (10,13): N_2(10) ∩ N_2(13) with roots removed
    val cands = Seq(("e1", 10L, 13L)).toDF("edge_id", "head", "tail")
    val got = Subgraphs.encloseAndLabel(edges, cands, 2)
      .as[(String, Long, Int, Int)].collect()
      .map { case (_, n, dh, dt) => n -> ((dh, dt)) }.toMap
    // roots keep fixed labels
    assert(got(10L) == ((0, 1)))
    assert(got(13L) == ((1, 0)))
    // 11 and 12 are 1 hop from each root (with the other root removed)
    assert(got(11L) == ((1, 1)))
    assert(got(12L) == ((1, 1)))
    // path nodes are NOT in the intersection within h=2 of 13 (root
    // removal matters: 3 is 1 hop from 10 but unreachable from 13 in 2
    // hops without passing 10)
    assert(!got.contains(3L))
  }

  test("subgraph records: sorted nodes + label arrays") {
    val cands = Seq(("e1", 10L, 13L)).toDF("edge_id", "head", "tail")
    val rec = Subgraphs.records(Subgraphs.encloseAndLabel(edges, cands, 2))
      .as[(String, Array[Long], Array[Array[Int]], Int)].collect().head
    assert(rec._2.toSeq == Seq(10L, 11L, 12L, 13L))
    assert(rec._4 == 4)
    assert(rec._3(0).toSeq == Seq(0, 1)) // labels follow sorted node order
  }

  test("PPR push: mass concentrates near seeds; sweep cut finds the diamond") {
    val adj: Map[Long, Array[Long]] = rawEdges
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.toArray).toMap
    val ppr = Ppr.approximatePpr(adj, Seq(10L, 13L), eps = 1e-5)
    assert(ppr(10L) > ppr.getOrElse(1L, 0.0))
    assert(ppr(13L) > ppr.getOrElse(5L, 0.0))
    val cut = Ppr.sweepCut(adj, ppr)
    assert(Set(10L, 11L, 12L, 13L).subsetOf(cut))
    assert(!cut.contains(5L))
  }
}
