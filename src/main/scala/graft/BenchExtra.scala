package graft

import org.apache.spark.sql.SparkSession

import graft.extract.{TextExtract, TripleExtract}
import graft.fixtures.Fixtures
import graft.link.EntityLink
import graft.pipeline.KgPipeline
import org.apache.spark.sql.functions._

/** Noop-sink isolation bench (guide §1.4) for the KG-pipeline stages —
  * NOT part of the frozen driver protocol (Bench.scala). Times each
  * sub-chain of the `scored` fused stage independently so the hot spot
  * is attributable: every timing computes every column of every row
  * into the noop sink. Prints one JSON line.
  *
  * Usage: SPARK_GRAFT_KG_SCALE=small sbt "runMain graft.BenchExtra"
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val kgScale = sys.env.getOrElse("SPARK_GRAFT_KG_SCALE", "small")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "256m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = kgScale match {
      case "tiny" => Fixtures.tiny
      case "bench" => Fixtures.bench
      case _ => Fixtures.small
    }
    val inDir = s"/tmp/graft-input-$kgScale"
    val gen = KgPipeline.fixtureInputs(spark, cfg)
    val stagedOk = java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$inDir/same_as/_SUCCESS"))
    if (!stagedOk) {
      gen.pages.write.mode("overwrite").parquet(s"$inDir/pages")
      gen.aliasDict.write.mode("overwrite").parquet(s"$inDir/alias_dict")
      gen.entityKeywords.write.mode("overwrite").parquet(s"$inDir/entity_keywords")
      gen.sameAs.write.mode("overwrite").parquet(s"$inDir/same_as")
    }
    val pages = spark.read.parquet(s"$inDir/pages").drop("bucket")
    val aliasDict = spark.read.parquet(s"$inDir/alias_dict")
    val entityKw = spark.read.parquet(s"$inDir/entity_keywords")
    val sameAs = spark.read.parquet(s"$inDir/same_as")

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): (String, Double) = {
      spark.sparkContext.setJobDescription(s"extra: $name")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      name -> dt
    }

    // warm-up
    pages.count(); spark.range(1000).selectExpr("sum(id)").collect()

    val dropped = graft.dedup.PageDedup.droppedUrls(pages, "minhash")
    val verified = pages
      .withColumn("extracted", TextExtract.extractTextCol(col("html")))
      .withColumn("text_ok", col("extracted") === col("text"))
      .where(col("text_ok")).drop("extracted", "text_ok")
    def assertions = TripleExtract.assertions(verified)
      .join(dropped.select(xxhash64(col("url")).as("__url_h")),
        xxhash64(col("url")) === col("__url_h"), "left_anti")
    def linked = EntityLink.link(assertions, aliasDict, entityKw)
    def canonical = graft.canon.Canonicalize.rewrite(
      linked, graft.canon.Canonicalize.canonicalMap(sameAs))

    val timings = Seq(
      time("pages_scan_only")(pages.select("url", "text")),
      time("dropped_urls")(dropped),
      time("text_reextract_verify")(verified.select("url")),
      time("extract_assertions")(TripleExtract.assertions(verified)),
      time("assertions_plus_dedup_antijoin")(assertions),
      time("linked")(linked),
      time("canonical")(canonical),
      time("scored_full")(graft.prune.AssertionPruning.score(
        canonical, gen.ontology)))
    val json = timings.map { case (k, v) => s""""$k":$v""" }
      .mkString(s"""{"scale":"$kgScale","cpus":$cpus,""", ",", "}")
    println(json)
    spark.stop()
  }
}
