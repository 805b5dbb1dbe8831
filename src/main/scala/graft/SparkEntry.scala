package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.fixtures.Fixtures
import graft.pipeline.KgPipeline
import graft.queries.{DataQueries, KgQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are generated from the single registry in
  * graft.queries (Spark fn and DuckDB SQL defined side by side so the
  * column-name/rounding contracts stay in lockstep).
  */
object SparkEntry {

  /** Flagship: the full KG construction-and-pruning pipeline on the tiny
    * deterministic fixture (200 pages -> extract -> link -> canonicalize
    * -> prune). Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val res = KgPipeline.run(spark, Fixtures.tiny)
    KgPipeline.outputTriples(res)
  }

  private val registry = KgQueries.all ++ DataQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
