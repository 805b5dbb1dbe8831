package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Page
import graft.dedup.PageDedup
import graft.fixtures.Fixtures

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def page(url: String, text: String): Page =
    Page(url, new Timestamp(0L), text.getBytes("UTF-8"), text, "en")

  test("exact dedup: smallest url survives per identical text") {
    val pages = Seq(
      page("https://a/1", "alpha beta gamma delta epsilon zeta eta"),
      page("https://b/2", "alpha beta gamma delta epsilon zeta eta"), // dup
      page("https://c/3", "unique content entirely different here now"))
      .toDF()
    val out = PageDedup.exact(pages).select("url").as[String].collect().toSet
    assert(out == Set("https://a/1", "https://c/3"))
  }

  test("minhash dedup: near-duplicates dropped, distinct pages kept") {
    val base = "the quick brown fox jumps over the lazy dog and then runs far away home tonight"
    val near = base.replace("runs", "walks") // 1-token perturbation
    val far = "completely different words about spark catalyst shuffles joins windows aggregates and parquet"
    val pages = Seq(
      page("https://a/1", base),
      page("https://b/2", base), // exact dup
      page("https://c/3", near), // near dup: most shingles shared
      page("https://d/4", far))
      .toDF()
    val out = PageDedup.minhash(pages).select("url").as[String].collect().toSet
    assert(out.contains("https://a/1") && out.contains("https://d/4"))
    assert(!out.contains("https://b/2"), "exact dup must collide in every band")
  }

  test("minhash dedup: distinct short pages all survive; identical short pages dedup") {
    // ADVICE r1: sub-shingle pages all got the sentinel signature and were
    // mass-dropped as 'near-duplicates' of each other
    val pages = Seq(
      page("https://s/1", "alpha beta"),
      page("https://s/2", "gamma delta"),
      page("https://s/3", "epsilon"),
      page("https://s/4", "gamma delta"), // exact dup of s/2
      page("https://t/1", "one two three four five six seven eight nine ten"))
      .toDF()
    val out = PageDedup.minhash(pages).select("url").as[String].collect().toSet
    assert(out == Set("https://s/1", "https://s/2", "https://s/3", "https://t/1"))
  }

  test("dedup modes: none is identity; exact drops the fixture's true dups") {
    val cfg = Fixtures.tiny
    val pages = Fixtures.pages(spark, cfg).toDF()
    assert(PageDedup(pages, "none").count() == 200)
    // the fixture embeds true duplicates (srcOf: j%7==3 republishes j-1)
    val nDups = (0L until cfg.nPages).count(j => Fixtures.srcOf(j) != j)
    assert(nDups > 20)
    assert(PageDedup(pages, "exact").count() == 200 - nDups)
    assertThrows[IllegalArgumentException](PageDedup(pages, "bogus"))
  }

  test("pipeline P/R unchanged with minhash dedup on the fixture") {
    val cfg = Fixtures.tiny
    val res = graft.pipeline.KgPipeline.runWith(
      spark, graft.pipeline.KgPipeline.fixtureInputs(spark, cfg), dedup = "minhash")
    val got = graft.pipeline.KgPipeline.outputTriples(res)
    val want = Fixtures.expectedTriples(spark, cfg).toDF()
    val hit = got.join(want, Seq("subject", "predicate", "object"), "left_semi").count()
    // near-dup banding may drop a few legitimately similar fixture pages;
    // precision must hold exactly, recall nearly
    assert(hit.toDouble / got.count() >= 0.95)
    assert(hit.toDouble / want.count() >= 0.90)
  }

  test("NgramJaccard: candidateBound parameterized; None == bound above max id") {
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d x y"), // share shingles
      (250L, "a b c d e f"), // above the fixture default bound
      (3L, "p q r s t u")) // no shared shingles
      .toDF("doc_id", "text")
    val bounded = graft.dedup.NgramJaccard.pairs(docs, 0.02, Some(200L))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(bounded.map(p => (p._1, p._2)) == Set((1L, 2L)))
    val unbounded = graft.dedup.NgramJaccard.pairs(docs, 0.02, None)
      .as[(Long, Long, Long, Double)].collect().toSet
    // doc 250 duplicates doc 1 exactly: unbounded finds the pair the
    // bound excluded, and a bound past the max id is identical to None
    assert(unbounded.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 250L), (2L, 250L)))
    val wide = graft.dedup.NgramJaccard.pairs(docs, 0.02, Some(10000L))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(wide == unbounded)
    // threshold is a parameter too: jaccard(1,250) = 1.0 survives 0.5
    val strict = graft.dedup.NgramJaccard.pairs(docs, 0.5, None)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(strict.map(p => (p._1, p._2)) == Set((1L, 250L)))
  }
}
