package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Ann

class AnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id").as("id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    .cache()
  lazy val queries = emb.filter(col("id") < 10)
    .select(col("id").as("qid"), col("v").as("qv"))

  test("LSH top-k returns valid, deterministic, cosine-ordered results") {
    val a = Ann.lshTopK(emb, queries, 3).collect()
    val b = Ann.lshTopK(emb, queries, 3).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
    // per query: at most k rows, cosine descending by rn
    val byQ = a.groupBy(_.getAs[Long]("qid"))
    byQ.values.foreach { rows =>
      assert(rows.length <= 3)
      val sorted = rows.sortBy(_.getAs[Int]("rn"))
      assert(sorted.map(_.getAs[Double]("cos")).toSeq ==
        sorted.map(_.getAs[Double]("cos")).sortBy(-(_: Double)).toSeq)
    }
  }

  test("LSH candidates are a subset of brute-force domain and recall is sane") {
    val brute = Ann.bruteTopK(emb, queries, 3).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nn_id"))).toSet
    val lsh = Ann.lshTopK(emb, queries, 3).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nn_id"))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    info(f"recall@3 = $recall%.2f (lsh pairs=${lsh.size}, brute=${brute.size})")
    // floor pinned at ~75% of the measured fixture recall (0.93 at the
    // r5 default 8 tables x 6 planes with full 1-bit multiprobe, fully
    // deterministic: hash-seeded planes, no rand) — a broken index
    // fails loudly instead of slipping under a vacuous 0.1 bar
    assert(recall >= 0.7, f"recall collapsed: $recall%.2f (fixture measures 0.93)")
  }

  test("IVF top-k: deterministic, valid shape, recall beats random") {
    val a = Ann.ivfTopK(emb, queries, 3).collect()
    val b = Ann.ivfTopK(emb, queries, 3).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
    val byQ = a.groupBy(_.getAs[Long]("qid"))
    byQ.values.foreach { rows =>
      assert(rows.length <= 3)
      val sorted = rows.sortBy(_.getAs[Int]("rn"))
      assert(sorted.map(_.getAs[Double]("cos")).toSeq ==
        sorted.map(_.getAs[Double]("cos")).sortBy(-(_: Double)).toSeq)
    }
    val brute = Ann.bruteTopK(emb, queries, 3).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nn_id"))).toSet
    val ivf = a.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nn_id"))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(f"IVF recall@3 = $recall%.2f (ivf pairs=${ivf.size}, brute=${brute.size})")
    // pinned to ~75% of the measured deterministic fixture recall
    // (0.83 at the r5 default c=32/nprobe=8 — same scanned fraction as
    // the old c=16/nprobe=4, finer quantization)
    assert(recall >= 0.6, f"recall collapsed: $recall%.2f (fixture measures 0.83)")
  }

  test("IVF index: every vector assigned to its true max-cosine centroid") {
    val (centroids, index) = Ann.ivfIndex(emb, c = 8, iters = 2)
    assert(centroids.length == 8)
    val rows = index.as[(Long, Seq[Double], Int)].collect()
    assert(rows.length == emb.count())
    def cos(a: Seq[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    rows.take(200).foreach { case (id, v, cid) =>
      val best = centroids.indices.minBy(c => (-cos(v, centroids(c)), c))
      assert(cid == best, s"id=$id assigned $cid, true argmax $best")
    }
  }

  test("zero-norm vectors score 0.0 and rank last, never NaN-first") {
    val corpus = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(0.6, 0.8)))
      .toDF("id", "v")
    val q = Seq((10L, Seq(1.0, 0.0))).toDF("qid", "qv")
    val rows = Ann.bruteTopK(corpus, q, 3).collect()
      .sortBy(_.getAs[Int]("rn"))
    // NaN would sort FIRST under desc; the guard emits 0.0 so the
    // degenerate vector lands last
    assert(rows.map(_.getAs[Long]("nn_id")).toSeq == Seq(2L, 3L, 1L))
    assert(rows.last.getAs[Double]("cos") == 0.0)
    // zero-norm QUERY: all cosines 0.0, no NaN anywhere
    val qz = Seq((11L, Seq(0.0, 0.0))).toDF("qid", "qv")
    val zr = Ann.bruteTopK(corpus, qz, 3).collect()
    assert(zr.forall(r => r.getAs[Double]("cos") == 0.0))
  }

  test("centroid transport: broadcast path is bit-identical to inline at c=1024") {
    import graft.functions.{BroadcastCentroids, InlineCentroids, VectorOps}
    // deterministic c=1024 x dim=16 matrix — pure in (cid, d) via mix64,
    // values in [-1, 1); no rand() so both runs see the same matrix
    val dim = 16
    val m = Array.tabulate(1024, dim)((c, d) =>
      graft.core.Ids.mix64(c * 8191L + d).toDouble / Long.MaxValue)
    val inline = emb.select(col("id"),
      VectorOps.centroidRanks(col("v"), InlineCentroids(m)).as("r"))
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    val bcast = emb.select(col("id"),
      VectorOps.centroidRanks(col("v"),
        BroadcastCentroids(spark.sparkContext.broadcast(m))).as("r"))
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    assert(inline.length == bcast.length && inline.nonEmpty)
    inline.zip(bcast).foreach { case ((ia, ir), (ba, br)) =>
      assert(ia == ba && ir == br, s"rank mismatch at id=$ia")
    }
    // the auto-pick cutover: fixture-default c=32 stays inline (4 KiB),
    // c=1024 x dim=16 = 128 KiB crosses InlineCentroidLimitBytes
    val small = Array.tabulate(32, dim)((c, d) => m(c)(d))
    assert(Ann.centroidSource(emb, small).isInstanceOf[InlineCentroids])
    assert(Ann.centroidSource(emb, m).isInstanceOf[BroadcastCentroids])
  }

  test("auto-c: c ~ sqrt(N) derived from the corpus, recall floor holds") {
    // 4096-vector deterministic corpus, 64 natural clusters of 64
    // (cluster base direction + small mix64 jitter, dim 8): autoC =
    // round(sqrt(4096)) = 64 — a bigger index than any literal driver
    // default, derived, not passed
    val dim = 8
    val big = (0L until 4096L).map { i =>
      val k = i % 64
      (i, (0 until dim).map { d =>
        graft.core.Ids.mix64(k * 31L + d).toDouble / Long.MaxValue +
          0.05 * graft.core.Ids.mix64(i * 131L + d).toDouble / Long.MaxValue
      })
    }.toDF("id", "v")
    assert(Ann.autoC(big) == 64)
    val qs = big.filter(col("id") < 10)
      .select(col("id").as("qid"), col("v").as("qv"))
    val auto = Ann.ivfTopK(big, qs, 3, c = Ann.AutoC, nprobe = 16)
    val a = auto.collect()
    val brute = Ann.bruteTopK(big, qs, 3).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nn_id"))).toSet
    val got = a.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nn_id"))).toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    info(f"auto-c IVF recall@3 = $recall%.2f at c=64/nprobe=16")
    // same scanned-list fraction as the driver default (nprobe/c = 0.25)
    assert(recall >= 0.6, f"auto-c recall collapsed: $recall%.2f")
    // determinism across re-runs (fresh k-means + broadcasts each time)
    val b = Ann.ivfTopK(big, qs, 3, c = Ann.AutoC, nprobe = 16).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
  }

  test("brute-force agrees with the q42 driver query on overlap") {
    val q42 = SparkEntry.queries("q42_cosine_topk")(spark, sf)
      .filter(col("qid") < 10)
      .select(col("qid"), col("nn_id"), col("rn"))
      .as[(Long, Long, Int)].collect().toSet
    val brute = Ann.bruteTopK(emb, queries, 3)
      .select(col("qid"), col("nn_id"), col("rn"))
      .as[(Long, Long, Int)].collect().toSet
    assert(q42 == brute)
  }

  test("dedup-before-index (q89 shape): results invariant under exact replication") {
    // replicate every corpus vector 5x at disjoint id offsets (the
    // ScaleUp shape), collapse by the raw vector with rep = min(id),
    // and search the rep index: the (qid, nn_id, cos) results must be
    // IDENTICAL to searching the original distinct corpus, and every
    // class must report multiplicity 5 — search cost scales with
    // distinct vectors, not copies.
    val copies = (0 until 5).map { k =>
      emb.select((col("id") + lit(k * 1000000L)).as("vec_id"), col("v"))
    }.reduce(_ unionAll _)
    val classes = copies.groupBy(col("v"))
      .agg(min("vec_id").as("id"), count(lit(1)).as("n_copies"))
    assert(classes.filter(col("n_copies") =!= 5).count() == 0)
    val repIndex = classes.select(col("id"), col("v"))
    // originals all have id < 1000000, so rep == the original id
    val dedup = Ann.ivfTopK(repIndex, queries, 3)
      .select(col("qid"), col("nn_id"), round(col("cos"), 6).as("cos"))
      .as[(Long, Long, Double)].collect().toSet
    val direct = Ann.ivfTopK(emb, queries, 3)
      .select(col("qid"), col("nn_id"), round(col("cos"), 6).as("cos"))
      .as[(Long, Long, Double)].collect().toSet
    assert(dedup == direct)
  }
}
