package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-page deduplication ahead of extraction — the standard first stage
  * of a Common-Crawl-scale pipeline (a large fraction of crawled pages
  * are exact or near duplicates; extracting from them double-counts
  * evidence and wastes the whole downstream pipeline).
  *
  * - exact: md5 fingerprint of whitespace-normalized lowercased text,
  *   keep the lexicographically smallest url per fingerprint.
  * - minhash: 4-component seeded-md5 MinHash over 3-gram word shingles,
  *   2 LSH bands; a page is dropped when any of its band buckets
  *   contains a smaller url ("keep first in bucket" — deterministic,
  *   one aggregation + one join; no transitive clustering pass).
  */
object PageDedup {

  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Only (url, fp) is shuffled — never the html payloads; the usually
    * small dropped-url set anti-joins back (broadcastable under AQE).
    */
  def exact(pages: DataFrame): DataFrame = {
    val fp = pages.select(col("url"), fingerprint(col("text")).as("__fp"))
    val keepers = fp.groupBy(col("__fp")).agg(min(col("url")).as("__keeper"))
    val dropped = fp.join(keepers, "__fp")
      .filter(col("url") > col("__keeper"))
      .select(col("url"))
    pages.join(dropped, Seq("url"), "left_anti")
  }

  /** (url, band) rows: 2 bands of 3 over a 6-component minhash
    * signature — per-band collision probability is jaccard^3, steep
    * enough that merely-templated pages don't collide.
    */
  private def bands(pages: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val sh = transform(sequence(lit(0), greatest(size(toks) - 3, lit(0))), i =>
      concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))
    val top = "f" * 32
    val names = (0 until 6).map(k => s"s$k")
    val sig0 = struct(names.map(n => lit(top).as(n)): _*)
    val sig = aggregate(sh, sig0, (acc, s) => struct(
      names.zipWithIndex.map { case (n, k) =>
        least(acc(n), md5(concat(lit(s"$k:"), s))).as(n)
      }: _*))
    pages.select(col("url"), sig.as("sig"))
      .select(col("url"), explode(array(
        md5(concat(col("sig.s0"), col("sig.s1"), col("sig.s2"))),
        md5(concat(col("sig.s3"), col("sig.s4"), col("sig.s5"))))).as("band"))
  }

  def minhash(pages: DataFrame): DataFrame = {
    val b = bands(pages)
    val keepers = b.groupBy(col("band")).agg(min(col("url")).as("__keeper"))
    val dropped = b.join(keepers, "band")
      .filter(col("url") > col("__keeper"))
      .select(col("url")).distinct()
    pages.join(dropped, Seq("url"), "left_anti")
  }

  def apply(pages: DataFrame, mode: String): DataFrame = mode match {
    case "none" => pages
    case "exact" => exact(pages)
    case "minhash" => minhash(pages)
    case other => throw new IllegalArgumentException(s"unknown dedup mode: $other")
  }
}
