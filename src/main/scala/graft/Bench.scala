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
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- operator queries on the driver-provided tables
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // ---- end-to-end KG pipeline throughput (extract->link->canon->prune)
    val cfg = kgScale match {
      case "tiny" => Fixtures.tiny
      case "bench" => Fixtures.bench
      case _ => Fixtures.small
    }
    val nAssertions = TripleExtract.assertions(Fixtures.pages(spark, cfg).toDF()).count()
    val t0 = System.nanoTime()
    val res = KgPipeline.run(spark, cfg)
    val kept = KgPipeline.outputTriples(res).count()
    val kgWall = (System.nanoTime() - t0) / 1e9
    val tps = nAssertions / kgWall
    val kgJson =
      s"""{"scale":"$kgScale","pages":${cfg.nPages},"assertions":$nAssertions,""" +
        s""""kept_triples":$kept,"wall_sec":$kgWall,"triples_per_sec":$tps,"cpus":$cpus}"""

    println(s"""{"metric":"total","value":${total + kgWall},"unit":"sec","queries":$qs,"sf":"$sfDir","kg":$kgJson}""")
    spark.stop()
  }
}
