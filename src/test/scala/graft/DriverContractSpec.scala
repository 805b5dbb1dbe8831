package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract guards for the driver harness: every query runs, every
  * oracle key has a query, the flagship entry returns rows. Result
  * parity vs DuckDB is checked by tools/crosscheck.py (driver-side).
  */
class DriverContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
  }

  test("EVERY query has an oracle (zero rows-only correctness rows)") {
    // r5 closed the last no_oracle row (q78: pair semi-oracle over the
    // emitted feature vectors); a new query landing without an oracle
    // should fail here, not silently weaken the correctness gate
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(qs.subsetOf(os), s"oracle-less queries: ${qs.diff(os)}")
  }

  test("every registered query executes at sf0.001") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, name)
    }
  }

  test("queries that must be non-empty at sf0.001 are non-empty") {
    val mustBeNonEmpty = Seq(
      "q01_scan_project", "q06_antijoin_reconcile", "q10_dict_encode",
      "q16_uncertainty_topk", "q27_connected_components", "q33_prune_threshold",
      "q40_minhash_lsh", "q42_cosine_topk", "q46_tpch1",
      "q55_auc_pr", "q56_score_quantiles", "q57_ranking_protocol_5050",
      "q58_new_entity_triage", "q59_priority_fill", "q60_regex_extract_all",
      "q61_community_f1", "q62_eccentricity", "q48_simhash_neardup",
      "q63_target_component", "q64_row_chunk", "q65_community_subgraph",
      "q69_ann_ivf_topk", "q70_pii_redact", "q71_repetition_ratio",
      "q72_protate_score", "q73_url_normalize", "q74_bpe_pretokenize",
      "q75_cdc_rolling_hash", "q81_dedup_clusters", "q82_quality_filter")
    mustBeNonEmpty.foreach { name =>
      assert(SparkEntry.queries(name)(spark, sf).count() > 0, name)
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
