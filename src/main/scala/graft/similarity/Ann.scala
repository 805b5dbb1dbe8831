package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Ids

/** Approximate nearest neighbor over embedding columns.
  *
  * Baseline: brute-force cosine top-k (also exposed as driver query
  * q42). Scale path: random-hyperplane LSH — L hash tables of P
  * Rademacher hyperplanes each; vectors sharing a bucket in ANY table
  * are candidates; exact cosine reranks candidates. All hyperplanes are
  * derived from splitmix64, so signatures are deterministic across
  * retries and engines.
  *
  * At 10^9+ vectors the bucket join replaces the O(N*Q) cross join with
  * O(candidates) work: shuffle keys are (table, bucket), and skewed
  * buckets split fine under AQE because the join is a plain equi-join.
  */
object Ann {

  /** Rademacher (+1/-1) hyperplane component, pure in (table, plane, dim). */
  private def sign(table: Int, plane: Int, d: Int): Double =
    if ((Ids.mix64(Ids.mix64(table * 131L + plane) ^ d) & 1L) == 0L) 1.0 else -1.0

  /** signed projection of v on (table, plane): sum_d v[d]*sign(t,p,d) */
  private def proj(v: Column, table: Int, plane: Int, dim: Int): Column = {
    val signs = array((0 until dim).map(d => lit(sign(table, plane, d))): _*)
    aggregate(zip_with(v, signs, (x, s) => x * s), lit(0.0), (acc, x) => acc + x)
  }

  /** bucket id of v in `table`: P projection sign bits packed into a long */
  def bucket(v: Column, table: Int, planes: Int, dim: Int): Column =
    (0 until planes).map { p =>
      when(proj(v, table, p, dim) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val n = (v: Column) => sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))
    dot / (n(a) * n(b))
  }

  /** (id, bucketTable, bucket) rows — one per hash table. */
  def signatures(emb: DataFrame, idCol: String, vCol: String,
      tables: Int, planes: Int, dim: Int): DataFrame = {
    val perTable = (0 until tables).map { t =>
      emb.select(col(idCol), col(vCol),
        lit(t).as("tbl"), bucket(col(vCol), t, planes, dim).as("bucket"))
    }
    perTable.reduce(_ unionAll _)
  }

  /** LSH-bucketed top-k: queries x corpus restricted to shared buckets,
    * exact cosine rerank, deterministic tiebreak.
    */
  def lshTopK(
      emb: DataFrame, // (id, v: array<double>)
      queries: DataFrame, // (qid, qv: array<double>)
      k: Int,
      // defaults tuned for weakly-clustered data: more tables + shorter
      // signatures = higher collision probability per true neighbor
      tables: Int = 8,
      planes: Int = 6,
      dim: Int = 64): DataFrame = {
    val corpusSig = signatures(emb, "id", "v", tables, planes, dim)
    val querySig = signatures(queries, "qid", "qv", tables, planes, dim)
    val cands = querySig.join(corpusSig, Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("id"))
      .select("qid", "qv", "id", "v")
      .distinct() // a pair may share buckets in several tables
    cands
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("id"))))
      .filter(col("rn") <= k)
      .select(col("qid"), col("id").as("nn_id"), col("cos"), col("rn"))
  }

  /** Brute-force cosine top-k (exact baseline). */
  def bruteTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame =
    queries.crossJoin(emb)
      .filter(col("qid") =!= col("id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("id"))))
      .filter(col("rn") <= k)
      .select(col("qid"), col("id").as("nn_id"), col("cos"), col("rn"))
}
