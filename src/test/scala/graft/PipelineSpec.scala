package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableFormat
import graft.fixtures.Fixtures
import graft.pipeline.KgPipeline

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("end-to-end P/R >= 0.95 vs fixture oracle (tiny)") {
    val cfg = Fixtures.tiny
    val res = KgPipeline.run(spark, cfg)
    val (p, r) = KgPipeline.precisionRecall(spark, cfg, res)
    info(f"tiny precision=$p%.4f recall=$r%.4f")
    assert(p >= 0.95, s"precision $p")
    assert(r >= 0.95, s"recall $r")
  }

  test("end-to-end P/R >= 0.95 vs fixture oracle (small, 5k pages)") {
    val cfg = Fixtures.small
    val res = KgPipeline.run(spark, cfg)
    val (p, r) = KgPipeline.precisionRecall(spark, cfg, res)
    info(f"small precision=$p%.4f recall=$r%.4f")
    assert(p >= 0.95, s"precision $p")
    assert(r >= 0.95, s"recall $r")
  }

  test("checkpoint resume: second run skips all stages, same output") {
    val cfg = Fixtures.tiny
    val root = Files.createTempDirectory("graft-tables").toString
    val tf = new TableFormat(root)
    val r1 = KgPipeline.run(spark, cfg, Some(tf), runId = "rA")
    val out1 = KgPipeline.outputTriples(r1).count()
    assert(r1.metrics.nonEmpty) // stages actually ran
    val r2 = KgPipeline.run(spark, cfg, Some(tf), runId = "rA")
    assert(r2.metrics.isEmpty, "resume must skip every stage")
    assert(KgPipeline.outputTriples(r2).count() == out1)
    // lineage rows were written
    assert(Files.exists(java.nio.file.Paths.get(root, "_lineage.jsonl")))
    // relation-partitioned materialization (D3): triples partitioned by
    // predicate, adjacency partitioned by rel, dictionaries present
    val triplesDir = new java.io.File(s"$root/triples/snapshot=rA-triples")
    assert(triplesDir.list().exists(_.startsWith("predicate=")))
    val adjDir = new java.io.File(s"$root/adjacency/snapshot=rA-adjacency")
    assert(adjDir.list().exists(_.startsWith("rel=")))
    val ent = spark.read.parquet(s"$root/entity_dict/snapshot=rA-entity_dict")
    assert(ent.columns.toSeq.sorted == Seq("entity", "id"))
  }

  test("resume is keyed by input identity: same runId over a DIFFERENT input re-runs") {
    val root = Files.createTempDirectory("graft-tables").toString
    val tf = new TableFormat(root)
    val r1 = KgPipeline.run(spark, Fixtures.tiny, Some(tf), runId = "rB")
    def assertionRows(m: Seq[graft.pipeline.StageMetrics]): Long =
      m.find(_.stage == "assertions").map(_.rows).getOrElse(-1L)
    assert(assertionRows(r1.metrics) > 0)
    // same runId, bigger fixture: silently skipping would report the tiny
    // run's output under the new label (ADVICE r1, medium)
    val cfg2 = Fixtures.tiny.copy(nPages = Fixtures.tiny.nPages * 2)
    val r2 = KgPipeline.run(spark, cfg2, Some(tf), runId = "rB")
    assert(r2.metrics.nonEmpty, "different input with the same runId must NOT resume")
    assert(assertionRows(r2.metrics) > assertionRows(r1.metrics),
      "the re-run must process the NEW (larger) input")
  }

  test("review queue has at most N rows, ordered by uncertainty desc") {
    val cfg = Fixtures.tiny
    val res = KgPipeline.run(spark, cfg, reviewN = 5)
    val rows = res.review.collect()
    assert(rows.length <= 5)
    val u = rows.map(_.getAs[Double]("uncertainty")).toSeq
    assert(u == u.sorted.reverse)
  }
}
