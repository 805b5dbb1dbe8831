package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.extract.{TextExtract, TripleExtract}

/** Stage-isolation microbenchmark: where does extraction time go and
  * does each piece scale with cores? Usage:
  *   SPARK_GRAFT_CPUS=N runMain graft.Microbench <pagesParquetDir>
  */
object Microbench {
  def main(args: Array[String]): Unit = {
    val pagesDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[micro] cpus=$cpus $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // media mode: args = <sfDir> media [amplify] — isolates the
    // sampleFrames codec path (per-partition reader/writer reuse A/B).
    // Builds real 4-frame GIF clips from the documents table, amplified
    // x`amplify` (default 20), and times frame extraction + PNG
    // re-encode end-to-end (sum of payload lengths defeats pruning).
    if (args.length > 1 && args(1) == "media") {
      import spark.implicits._
      val amplify = if (args.length > 2) args(2).toInt else 20
      val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
        .select(col("doc_id")).as[Long]
        .flatMap(id => (0 until amplify).map(i => id * 64 + i))
        .toDF("doc_id")
      val media = graft.multimodal.Multimodal
        .mediaFromDocsVideo(spark, docs)
        .localCheckpoint(true) // encode cost OUT of the timed section
      val clips = media.count()
      (1 to 3).foreach { rep =>
        time(s"frame_sample_rep$rep")(
          graft.multimodal.Multimodal.sampleFrames(media, 4)
            .agg(sum(length(col("frame_payload")))).collect()(0).getLong(0))
      }
      println(s"[micro] media clips = $clips")
      spark.stop()
      return
    }

    val pages = spark.read.parquet(pagesDir).drop("bucket")
    println(s"[micro] input partitions = ${pages.rdd.getNumPartitions}")
    time("read_count")(pages.count())
    time("read_count_again")(pages.count())
    time("text_extract_only")(
      pages.select(length(TextExtract.extractTextCol(col("html"))).as("l"))
        .agg(sum("l")).collect()(0).getLong(0))
    if (args.length > 1 && args(1) == "quick") {
      time("assertions_full")(TripleExtract.assertions(pages).count())
      spark.stop()
      return
    }
    time("sentence_explode_only")(
      pages.filter(col("lang") === "en")
        .select(explode(split(regexp_replace(col("text"), "\\.$", ""), "\\. ")).as("s"))
        .count())
    time("assertions_full")(TripleExtract.assertions(pages).count())

    // full link stage (broadcast dict join + HOF argmax), fixture dicts
    val cfg = graft.fixtures.Fixtures.xbench
    val inputs = graft.pipeline.KgPipeline.fixtureInputs(spark, cfg)
    val verified = pages
      .withColumn("extracted", TextExtract.extractTextCol(col("html")))
      .where(col("extracted") === col("text"))
      .drop("extracted")
    time("extract_verify_assert")(TripleExtract.assertions(verified).count())
    time("extract_verify_assert2")(TripleExtract.assertions(verified).count())
    time("link_noverify")(
      graft.link.EntityLink.link(
        TripleExtract.assertions(pages), inputs.aliasDict, inputs.entityKeywords)
        .count())
    time("link_full")(
      graft.link.EntityLink.link(
        TripleExtract.assertions(verified), inputs.aliasDict, inputs.entityKeywords)
        .count())
    time("link_full2")(
      graft.link.EntityLink.link(
        TripleExtract.assertions(verified), inputs.aliasDict, inputs.entityKeywords)
        .count())

    // dedup banding in isolation (narrow (url, band) rows)
    time("dedup_minhash_dropped")(
      graft.dedup.PageDedup.droppedUrls(pages, "minhash").count())
    time("dedup_exact_dropped")(
      graft.dedup.PageDedup.droppedUrls(pages, "exact").count())

    // scored stage in isolation: linked assertions pre-materialized to
    // tmpfs parquet so extraction cost can't leak into the measurement.
    // Cache keyed by (full path, input _SUCCESS mtime): a path-only key
    // reused stale linked rows after a fixture was REGENERATED at the
    // same path — the exact measurement-corruption class this cache
    // exists to prevent.
    val successMtime = {
      val p = java.nio.file.Paths.get(s"$pagesDir/_SUCCESS")
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.getLastModifiedTime(p).toMillis
      else 0L
    }
    val inputKey = java.lang.Long.toHexString(
      graft.core.Ids.mix64(
        graft.core.Ids.mix64(pagesDir.hashCode.toLong) ^ successMtime))
    val linkedDir = s"/dev/shm/graft-micro-linked-$inputKey"
    // evict stale keyed caches: each fixture regeneration mints a new
    // key, and leftover RAM-backed parquet on /dev/shm perturbs the
    // very measurements this cache protects. Only dirs idle >30 min are
    // evicted — a concurrently running Microbench JVM's in-use staged
    // parquet must not be deleted mid-measurement — and the Files.list
    // stream is closed (it holds an fd until closed).
    val evictAgeMs = 30L * 60 * 1000
    // live-PID marker: mtime alone can't protect a run whose measurement
    // phase outlasts the eviction age (a concurrent different-key JVM's
    // sweep would delete the in-use cache mid-measurement), so eviction
    // additionally skips dirs whose recorded owner JVM is still alive.
    // An unreadable marker counts as alive — never delete on doubt.
    def ownerAlive(d: java.nio.file.Path): Boolean = {
      val f = d.resolve("_live_pid")
      try {
        java.nio.file.Files.exists(f) && {
          val pid = new String(java.nio.file.Files.readAllBytes(f), "UTF-8").trim
          pid.nonEmpty &&
            java.nio.file.Files.exists(java.nio.file.Paths.get(s"/proc/$pid"))
        }
      } catch { case _: Throwable => true }
    }
    val shm = java.nio.file.Files.list(java.nio.file.Paths.get("/dev/shm"))
    try {
      shm.forEach { d =>
        val idleMs = try {
          System.currentTimeMillis() -
            java.nio.file.Files.getLastModifiedTime(d).toMillis
        } catch { case _: Throwable => 0L }
        if (d.getFileName.toString.startsWith("graft-micro-linked-") &&
            d.toString != linkedDir && idleMs > evictAgeMs && !ownerAlive(d)) {
          scala.reflect.io.Directory(new java.io.File(d.toString)).deleteRecursively()
        }
      }
    } finally shm.close()
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$linkedDir/_SUCCESS"))) {
      graft.link.EntityLink.link(
        TripleExtract.assertions(pages), inputs.aliasDict, inputs.entityKeywords)
        .write.mode("overwrite").parquet(linkedDir)
    }
    // touch the cache dir on USE: reads don't update mtime, so without
    // this a long-running JVM's in-use cache would look idle to a
    // concurrent different-key run's 30-min eviction sweep
    try java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(linkedDir),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: Throwable => () }
    // claim ownership for the eviction sweep's live-PID check (last
    // claimant wins; same-key sharers only ever make eviction MORE
    // conservative, never less)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$linkedDir/_live_pid"),
      ProcessHandle.current().pid().toString.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    val linked = spark.read.parquet(linkedDir)
    time("evidence_agg")(
      graft.prune.AssertionPruning.evidence(linked).count())
    time("score_full")(
      graft.prune.AssertionPruning.score(linked, inputs.ontology).count())
    time("score_full2")(
      graft.prune.AssertionPruning.score(linked, inputs.ontology).count())
    spark.stop()
  }
}
