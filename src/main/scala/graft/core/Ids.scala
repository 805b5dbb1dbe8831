package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic id assignment + seeded hashing utilities.
  *
  * The reference builds entity/relation dictionaries by first-seen file
  * order (/root/reference/src/gnn/lcilp/utils/data_utils.py:23-45) — a
  * single-process notion. Distributed equivalent must be retry-stable:
  * NEVER monotonically_increasing_id (non-deterministic under task
  * retry). We use row_number over a global sort of the DISTINCT key set
  * (small relative to the fact table) — SURVEY.md §4 item 3.
  */
object Ids {

  /** (key -> dense long id) dictionary, deterministic: ids follow the
    * lexicographic order of the distinct keys.
    */
  def dictionary(df: DataFrame, keyCol: String, idCol: String = "id"): DataFrame =
    df.select(col(keyCol)).distinct()
      .withColumn(idCol, row_number().over(Window.orderBy(col(keyCol))).cast("long"))

  /** Pure 64-bit mix (splitmix64 finalizer). Stable across JVMs/retries;
    * used anywhere the reference used a sequential RNG (SURVEY.md §7.4:
    * "make it a pure hash-based function of (s,o,seed)").
    */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** mix64 of two longs (seeded). */
  def mix64(a: Long, b: Long): Long = mix64(mix64(a) ^ b)

  /** Uniform double in [0,1) from a long, pure. */
  def unitDouble(x: Long): Double = (mix64(x) >>> 11).toDouble / (1L << 53).toDouble

  /** Column form: deterministic per-row salt in [0, buckets) derived from
    * the given key columns — used for skew salting (north_star "salted
    * sort-merge join") so the salt is stable under retries, unlike rand().
    */
  def saltCol(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong)).cast("int")
}
