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

  /** Urls to drop under exact dedup. Only (url, fp) is ever shuffled —
    * never the html payloads.
    */
  def exactDropped(pages: DataFrame): DataFrame = {
    val fp = pages.select(col("url"), fingerprint(col("text")).as("__fp"))
    val keepers = fp.groupBy(col("__fp")).agg(min(col("url")).as("__keeper"))
    fp.join(keepers, "__fp")
      .filter(col("url") > col("__keeper"))
      .select(col("url"))
  }

  def exact(pages: DataFrame): DataFrame =
    pages.join(exactDropped(pages), Seq("url"), "left_anti")

  /** (url, band) rows: 2 bands of 3 over a 6-component minhash
    * signature — per-band collision probability is jaccard^3, steep
    * enough that merely-templated pages don't collide.
    *
    * Signature components use ONE string xxhash64 per shingle plus k
    * cheap seeded long-rehashes (the classic k-permutation trick)
    * rather than k cryptographic hashes: ~100x less CPU at identical
    * minhash semantics (and no ANSI long-overflow, unlike affine
    * multiply remixes).
    */
  private def bands(pages: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val sh = transform(sequence(lit(0), greatest(size(toks) - 3, lit(0))), i =>
      xxhash64(concat_ws(" ",
        element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3))))
    val names = (0 until 6).map(k => s"s$k")
    val sig0 = struct(names.map(n => lit(Long.MaxValue).as(n)): _*)
    val sig = aggregate(sh, sig0, (acc, h) => struct(
      names.zipWithIndex.map { case (n, k) =>
        least(acc(n), xxhash64(h, lit(k))).as(n)
      }: _*))
    pages.select(col("url"), sig.as("sig"))
      .select(col("url"), explode(array(
        xxhash64(col("sig.s0"), col("sig.s1"), col("sig.s2"), lit(0)),
        xxhash64(col("sig.s3"), col("sig.s4"), col("sig.s5"), lit(1)))).as("band"))
  }

  /** Urls to drop under minhash near-dup. */
  def minhashDropped(pages: DataFrame): DataFrame = {
    val b = bands(pages)
    val keepers = b.groupBy(col("band")).agg(min(col("url")).as("__keeper"))
    b.join(keepers, "band")
      .filter(col("url") > col("__keeper"))
      .select(col("url")).distinct()
  }

  def minhash(pages: DataFrame): DataFrame =
    pages.join(minhashDropped(pages), Seq("url"), "left_anti")

  /** Dropped-url set for the given mode; empty for "none". The pipeline
    * applies this to EXTRACTED assertions (url-keyed small rows), never
    * to the page table itself — anti-joining the pages would shuffle
    * every html payload, which measured 6x the entire pipeline cost.
    */
  def droppedUrls(pages: DataFrame, mode: String): DataFrame = mode match {
    case "none" => pages.select(col("url")).limit(0)
    case "exact" => exactDropped(pages)
    case "minhash" => minhashDropped(pages)
    case other => throw new IllegalArgumentException(s"unknown dedup mode: $other")
  }

  /** Page-table form (convenience / tests). */
  def apply(pages: DataFrame, mode: String): DataFrame = mode match {
    case "none" => pages
    case _ => pages.join(droppedUrls(pages, mode), Seq("url"), "left_anti")
  }
}
