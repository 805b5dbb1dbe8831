package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.prune.{AntiJoinReconcile, Refill}

class RefillSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val vocab = Seq("p1", "p2", "p3", "p4")
  lazy val triples = (0 until 400).map(i =>
    (s"s$i", vocab(i % 4), s"o$i")).toDF("subject", "predicate", "object")

  test("priorityFill: cap path — target subjects capped, target<->target first, maxRows enforced") {
    // 6 target<->target triples, 20 other triples, one hub target subject
    // with 10 objects (must be capped at 3)
    val targets = Seq("t1", "t2", "t3")
    val tt = Seq(("t1", "p", "t2"), ("t2", "p", "t3"), ("t3", "p", "t1"))
    val hub = (0 until 10).map(i => ("t1", "p", s"h$i"))
    val other = (0 until 20).map(i => (s"a$i", "p", s"b$i"))
    val all = (tt ++ hub ++ other).toDF("subject", "predicate", "object")
    val out = Refill.priorityFill(all, all, targets,
      maxRows = 12, minRows = 3, maxObjectsPerSubject = 3).collect()
    assert(out.length == 12)
    assert(out.forall(_.getAs[String]("fill_source") == "core"))
    // t1's rows (target subject) capped at 3 total
    assert(out.count(_.getAs[String]("subject") == "t1") <= 3)
    // all target<->target triples that survive the cap rank first
    val got = out.map(r => (r.getAs[String]("subject"), r.getAs[String]("object"))).toSet
    assert(got.contains(("t2", "t3")) && got.contains(("t3", "t1")))
  }

  test("priorityFill: expansion path — below the floor pulls endpoint-connected triples") {
    val targets = Seq("t1", "t2")
    // filtered set has only 2 triples (< minRows 5); relevant superset has
    // connected and unconnected extras
    val filtered = Seq(("t1", "p", "t2"), ("t2", "p", "x1")).toDF("subject", "predicate", "object")
    val relevant = (Seq(("t1", "p", "t2"), ("t2", "p", "x1"),
      ("x1", "p", "y1"), ("t1", "q", "y2"), // share an endpoint with core
      ("z1", "p", "z2"), ("z3", "p", "z4")) // disconnected: must NOT appear
      ).toDF("subject", "predicate", "object")
    val out = Refill.priorityFill(filtered, relevant, targets,
      maxRows = 10, minRows = 5, maxObjectsPerSubject = 3).collect()
    val core = out.filter(_.getAs[String]("fill_source") == "core")
    val exp = out.filter(_.getAs[String]("fill_source") == "expanded")
    assert(core.length == 2)
    assert(exp.map(r => (r.getAs[String]("subject"), r.getAs[String]("object"))).toSet ==
      Set(("x1", "y1"), ("t1", "y2")))
    assert(!out.exists(_.getAs[String]("subject").startsWith("z")))
  }

  test("blanking: exactly int(count*pct) per predicate group, deterministic") {
    val blanked = Refill.blankPredicates(triples, 0.5)
    val empties = blanked.filter(trim(col("predicate")) === "").count()
    assert(empties == 200) // 4 groups x floor(100*0.5)
    val perGroupLeft = blanked.filter(col("predicate") =!= "")
      .groupBy("predicate").count().as[(String, Long)].collect().toMap
    assert(perGroupLeft.values.forall(_ == 50))
    val again = Refill.blankPredicates(triples, 0.5)
      .filter(trim(col("predicate")) === "")
      .select("subject").as[String].collect().toSet
    val first = blanked.filter(trim(col("predicate")) === "")
      .select("subject").as[String].collect().toSet
    assert(again == first)
  }

  test("random fill: no empties remain, all from the closed vocabulary") {
    val filled = Refill.randomFill(Refill.blankPredicates(triples, 0.5), vocab)
    assert(filled.filter(trim(col("predicate")) === "").count() == 0)
    val preds = filled.select("predicate").distinct().as[String].collect().toSet
    assert(preds.subsetOf(vocab.toSet))
  }

  test("synthetic fill: ~30/50/20 real/corrupted/random mix") {
    val blanked = Refill.blankPredicates(triples, 0.5)
    val filled = Refill.syntheticFill(blanked, triples, vocab)
    assert(filled.filter(trim(col("predicate")) === "").count() == 0)
    val wasBlanked = blanked.filter(trim(col("predicate")) === "")
      .select("subject").as[String].collect().toSet
    val truthMap = triples.select("subject", "predicate").as[(String, String)]
      .collect().toMap
    val refilled = filled.filter(col("subject").isin(wasBlanked.toSeq: _*))
      .select("subject", "predicate").as[(String, String)].collect()
    val realFrac = refilled.count { case (s, p) => truthMap(s) == p }.toDouble / refilled.length
    assert(realFrac > 0.25 && realFrac < 0.45, s"real fraction $realFrac")
  }

  test("end-to-end E1 shape: blank -> fill -> anti-join reconcile conserves rows") {
    val blanked = Refill.blankPredicates(triples, 0.5)
    val filled = Refill.randomFill(blanked, vocab)
    val out = AntiJoinReconcile.reconcileChecked(triples, filled)
    assert(out.count() == 400)
  }
}
