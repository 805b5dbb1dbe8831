package graft

import org.apache.spark.sql.SparkSession

import graft.extract.TripleExtract
import graft.fixtures.Fixtures
import graft.pipeline.KgPipeline

/** Driver benchmark main. Prints exactly ONE JSON line:
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *  "kg":{...}}.
  *
  * Env knobs:
  *  - SPARK_GRAFT_SF_DIR: testdata dir for the operator queries
  *  - SPARK_GRAFT_CPUS:   local[N] parallelism (scaling protocol runs
  *                        this twice at 8 and 32 — see BASELINE.md)
  *  - SPARK_GRAFT_KG_SCALE: tiny|small|bench fixture for the end-to-end
  *                        KG pipeline throughput measurement
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val kgScale = sys.env.getOrElse("SPARK_GRAFT_KG_SCALE", "small")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      // 4 shuffle partitions per core: exactly-#cores shuffles run as ONE
      // task wave, so one slow task idles every other core (wave
      // quantization); 4x gives the scheduler slack and AQE coalesces
      // what's too fine
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", (cpus.toInt * 4).toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // 16MB scan splits: the 2.3GB xxbench pages parquet yields only ~43
      // default splits = 1.3 task waves at 32 cores, capping measured
      // 8->32 scaling at ~2.7x regardless of the engine (measured: 16MB
      // splits took text-extract from 37s to 26s at 32 cores and moved
      // per-stage scaling efficiency from ~0.5 to ~0.75)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_SPLIT", "16m"))
      // shuffle spill on fast storage (a real cluster has per-executor
      // NVMe; this box's /tmp disk was the measured bottleneck)
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      // the dedup dropped-url set (~100MB at 20M pages) must broadcast:
      // measured A/B at 32 cores — broadcast anti-join 141s wall vs
      // shuffled-hash 196s (the 28M-row assertion shuffle costs more
      // than the one-time serial broadcast build). Non-broadcast joins
      // prefer shuffled-hash over sort-merge (no sort of the big side).
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "256m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- operator queries on the driver-provided tables
    // (SPARK_GRAFT_SKIP_QUERIES=1 -> KG-pipeline-only scaling run)
    val skipQueries = sys.env.get("SPARK_GRAFT_SKIP_QUERIES").contains("1")
    if (!skipQueries) {
      // untimed warm-up: first-job session/codegen startup (~3-4s) was
      // landing entirely on whichever query ran first (alphabetically
      // q01), misattributing harness cost to that operator
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    }
    // SPARK_GRAFT_ONLY_QUERIES=q57,q40 — comma-separated name prefixes
    // (A/B iteration; default all, what the driver measures).
    // SPARK_GRAFT_QUERY_REPS=N repeats each query N times and reports
    // the BEST successful rep — the host VM's ±30-60% wall noise drowns
    // single-rep A/Bs of sub-5s queries.
    val onlyQ = sys.env.get("SPARK_GRAFT_ONLY_QUERIES").map(_.split(",").toSeq)
    val qReps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_QUERY_REPS", "1").toInt)
    val repResults =
      if (skipQueries) Seq.empty[(String, Option[(Double, Double)])]
      else SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => onlyQ.forall(_.exists(name.startsWith)) }
        .map { case (name, fn) =>
          val reps = (1 to qReps).flatMap { _ =>
            val t0 = System.nanoTime()
            try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
            catch {
              case e: Throwable =>
                System.err.println(s"[bench] $name failed: ${e.getMessage}")
                None // a failed rep must never become the recorded minimum
            }
          }
          // a query whose reps ALL failed is recorded in "failed", not as
          // a Double.MaxValue time corrupting the map and the total.
          // (best, first): first-rep = the plain-protocol time for this
          // query, best = the warm within-run minimum — one run records
          // BOTH protocols from the same window (r6 verdict nit #2: the
          // cold-vs-warm gap is structural, not window noise, so the
          // comparison must come from a single run, not chased windows)
          name -> (if (reps.nonEmpty) Some((reps.min, reps.head)) else None)
        }
    val results = repResults.collect { case (k, Some(v)) => (k, v) }
    val failedQ = repResults.collect { case (k, None) => k }
    val qs = results.map { case (k, (b, _)) => "\"" + k + "\":" + b }
      .mkString("{", ",", "}")
    val failedJson = failedQ.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2._1).sum
    val totalFirst = results.map(_._2._2).sum
    // emitted only when reps>1 (otherwise identical to "queries");
    // value_first excludes the kg-pipeline wall (which runs once) —
    // compare it against sum(queries), not "value"
    val qsFirstJson =
      if (qReps > 1)
        results.map { case (k, (_, f)) => "\"" + k + "\":" + f }
          .mkString(""""value_first":""" + totalFirst + ""","queries_first":{""",
            ",", "},")
      else ""

    // ---- end-to-end KG pipeline throughput (extract->link->canon->prune)
    // Inputs are materialized to parquet FIRST (untimed): the engine is
    // measured reading pages from disk like production, not generating
    // the fixture.
    val cfg = kgScale match {
      case "tiny" => Fixtures.tiny
      case "bench" => Fixtures.bench
      case "xbench" => Fixtures.xbench
      case "xxbench" => Fixtures.xxbench
      case _ => Fixtures.small
    }
    val inDir = s"/tmp/graft-input-$kgScale"
    val gen = KgPipeline.fixtureInputs(spark, cfg)
    import org.apache.spark.sql.functions._
    // restage when missing OR when the staged page count disagrees with
    // the fixture config (parquet footer count — cheap): a
    // _SUCCESS-only guard replays stale pages after a config change
    val stagedOk = java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$inDir/same_as/_SUCCESS")) &&
      spark.read.parquet(s"$inDir/pages").count() == cfg.nPages
    if (!stagedOk) {
      gen.pages
        .withColumn("bucket", pmod(xxhash64(col("url")), lit(16L)).cast("int"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$inDir/pages")
      gen.aliasDict.write.mode("overwrite").parquet(s"$inDir/alias_dict")
      gen.entityKeywords.write.mode("overwrite").parquet(s"$inDir/entity_keywords")
      gen.sameAs.write.mode("overwrite").parquet(s"$inDir/same_as")
    }
    // SPARK_GRAFT_BUCKETS="0-3": restrict to a url-hash bucket range —
    // the disjoint-input slice for the multi-JVM scale-out experiment
    // (4 independent 8-core JVMs over quarters vs one 8-core JVM over
    // the full input isolates shared-JVM/GC effects from shared-DRAM)
    val bucketRange = sys.env.get("SPARK_GRAFT_BUCKETS").map { r =>
      r.split("-").map(_.trim) match {
        case Array(loS, hiS) if loS.forall(_.isDigit) && hiS.forall(_.isDigit) =>
          val (lo, hi) = (loS.toInt, hiS.toInt)
          require(lo >= 0 && lo <= hi && hi <= 15,
            s"SPARK_GRAFT_BUCKETS '$r' out of range: need 0 <= lo <= hi <= 15")
          (lo, hi)
        case _ => sys.error(
          s"SPARK_GRAFT_BUCKETS '$r' malformed: expected 'lo-hi' like '0-3'")
      }
    }
    val pagesAll = spark.read.parquet(s"$inDir/pages")
    val pagesSel = bucketRange match {
      case Some((lo, hi)) => pagesAll.filter(col("bucket").between(lo, hi))
      case None => pagesAll
    }
    bucketRange.foreach { case (lo, hi) =>
      require(pagesSel.limit(1).count() > 0,
        s"SPARK_GRAFT_BUCKETS $lo-$hi selected zero pages")
    }
    val inputs = graft.pipeline.KgInputs(
      pages = pagesSel.drop("bucket"),
      aliasDict = spark.read.parquet(s"$inDir/alias_dict"),
      entityKeywords = spark.read.parquet(s"$inDir/entity_keywords"),
      ontology = gen.ontology,
      sameAs = spark.read.parquet(s"$inDir/same_as"))
    // scale-aware KG-block configs (runtime-settable): the wave-
    // quantization tuning (4x-cores shuffle partitions + 16MB scan
    // splits) wins at bench+ scales where waves dominate, but at the
    // small fixture the same settings cost ~1.2s of pure task-launch
    // overhead (measured A/B: scored stage 4.7-5.4s at 32/128m vs
    // 5.5-6.9s at 128/16m, REPS=3). Operator queries above ran with the
    // large-scale settings (sf0.1 tables are wave-sensitive).
    val isBigKg = Set("bench", "xbench", "xxbench")(kgScale)
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS",
        if (isBigKg) (cpus.toInt * 4).toString else cpus))
    spark.conf.set("spark.sql.files.maxPartitionBytes",
      sys.env.getOrElse("SPARK_GRAFT_MAX_SPLIT", if (isBigKg) "16m" else "128m"))
    val dedup = sys.env.getOrElse("SPARK_GRAFT_DEDUP", "minhash")
    val nAssertions = TripleExtract.assertions(inputs.pages).count() // untimed warm-up
    val t0 = System.nanoTime()
    val degJoin = sys.env.getOrElse("SPARK_GRAFT_DEGJOIN", "auto")
    val res = KgPipeline.runWith(spark, inputs, dedup = dedup, degJoin = degJoin)
    val kept = KgPipeline.outputTriples(res).count()
    val kgWall = (System.nanoTime() - t0) / 1e9
    val tps = nAssertions / kgWall
    val stagesJson = res.metrics
      .map(m => s"""{"stage":"${m.stage}","wall_ms":${m.wallMs}}""")
      .mkString("[", ",", "]")
    // in bucket-slice mode cfg.nPages is the FULL fixture; echo the
    // range so slice JSONs are not misread as full-input runs
    val bucketsJson = bucketRange
      .map { case (lo, hi) => s""""buckets":"$lo-$hi",""" }.getOrElse("")
    val kgJson =
      s"""{"scale":"$kgScale",$bucketsJson"pages":${cfg.nPages},"assertions":$nAssertions,""" +
        s""""kept_triples":$kept,"wall_sec":$kgWall,"triples_per_sec":$tps,"cpus":$cpus,""" +
        s""""stages":$stagesJson}"""

    // session-wide featurize codec-fallback total (q78/q83-85 and the
    // pipeline all ran above): nonzero on the fixture = codec regression
    val stubFallbackRows = graft.multimodal.Multimodal
      .stubFallbackCounter(spark.sparkContext).value
    val json =
      s"""{"metric":"total","value":${total + kgWall},"unit":"sec","queries":$qs,""" +
        qsFirstJson +
        s""""failed":$failedJson,"stub_fallback_rows":$stubFallbackRows,""" +
        s""""sf":"$sfDir","kg":$kgJson}"""
    println(json)
    // Persist the whole record too: the harness captures only a stdout
    // tail (BENCH_r03.json "parsed": null). The DEFAULT whole-file path
    // is /tmp — never the curated BENCH/last_bench.json, which an
    // env-less or A/B run (ONLY_QUERIES / QUERY_REPS / bucket-slice)
    // used to clobber with a non-comparable record. Opt in to the
    // committed record path explicitly via SPARK_GRAFT_BENCH_OUT.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/tmp/graft-last-bench.json")
    try {
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(outPath).toAbsolutePath.getParent)
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // Full-protocol runs (the driver's shape: every query, single rep,
    // whole fixture) additionally APPEND to an in-repo history so each
    // round's complete record survives the harness truncation without
    // ever overwriting the curated clean-window file. A run that sets
    // SPARK_GRAFT_BENCH_OUT is an explicitly-routed experiment (record
    // captures, smoke runs at other sf dirs) and stays out of the
    // history — only env-less driver-shaped runs land there.
    // ... and a run with ANY all-reps-failed query is excluded too: its
    // "value" omits the failed queries' time, so the total would read as
    // an improvement next to a clean run (the "failed" array flags it in
    // the whole-file record; the append-only history stays comparable)
    val fullProtocol =
      !skipQueries && onlyQ.isEmpty && qReps == 1 && bucketRange.isEmpty &&
        sys.env.get("SPARK_GRAFT_BENCH_OUT").isEmpty && failedQ.isEmpty
    if (fullProtocol) {
      try {
        val p = java.nio.file.Paths.get("/root/repo/BENCH/bench_history.jsonl")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] history append failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
