package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.Fixtures
import graft.functions.SimHash
import graft.multimodal.Multimodal

class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("simhash: identical texts collide, perturbed texts are near") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox leaps over the lazy dog again and again"),
      (4L, "completely different content about spark shuffles and joins"))
      .toDF("id", "text")
      .select(col("id"), SimHash.simhash(split(col("text"), " ")).as("sh"))
    val m = docs.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    val near = java.lang.Long.bitCount(m(1L) ^ m(3L))
    val far = java.lang.Long.bitCount(m(1L) ^ m(4L))
    assert(near < far, s"near=$near far=$far")
    assert(near <= 8)
  }

  test("banded simhash pairs == brute-force all-pairs at hamming <= 3") {
    // 4 byte-bands are complete for hamming <= 3 (pigeonhole): the banded
    // candidate join must reproduce the crossJoin result exactly
    val docs = (1L to 120L).map { i =>
      val base = Seq("alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta", "iota", "kappa")
      val words = base.map(w => if (i % 7 == 0) w else s"$w${i % 11}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val fp = SimHash.fingerprintsPortable(docs, "doc_id", split(col("text"), " "))
    val banded = SimHash.bandedPairs(fp, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    val right = fp.select(col("doc_id").as("id2"), col("sh").as("sh2"))
    val brute = fp.crossJoin(right).filter(col("doc_id") < col("id2"))
      .withColumn("hamming", SimHash.hamming(col("sh"), col("sh2")))
      .filter(col("hamming") <= 3)
      .select(col("doc_id"), col("id2"), col("hamming"))
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute)
    assert(brute.nonEmpty, "fixture must actually produce near-dup pairs")
    assertThrows[IllegalArgumentException](SimHash.bandedPairs(fp, maxHamming = 4))
  }

  test("simhash hamming column matches JVM bitCount") {
    val rows = Seq((0xffL, 0x0fL)).toDF("a", "b")
      .select(SimHash.hamming(col("a"), col("b"))).as[Int].collect()
    assert(rows.head == 4)
  }

  test("multimodal featurize: deterministic stub features, batch plumbing") {
    val pages = Fixtures.pages(spark, Fixtures.tiny).toDF()
    val media = Multimodal.mediaFromPages(spark, pages)
    val feats = Multimodal.featurize(media, 4).collect()
    assert(feats.length == 200)
    assert(feats.forall(_.features.length == Multimodal.featureDim))
    // deterministic: same input -> same features
    val again = Multimodal.featurize(media, 8).collect()
    assert(feats.map(f => f.media_id -> f.features.toSeq).toMap ==
      again.map(f => f.media_id -> f.features.toSeq).toMap)
    // kinds assigned
    assert(feats.map(_.kind).toSet == Set("image", "audio", "video"))
  }

  test("multimodal features compose into the IVF ANN index end-to-end") {
    // the declared multimodal contract: opaque binary -> feature vector
    // -> similarity search. Wire the stub featurizer's output straight
    // into ivfIndex/ivfTopK to prove the schema/typing seam is real.
    val pages = Fixtures.pages(spark, Fixtures.tiny).toDF()
    val media = Multimodal.mediaFromPages(spark, pages)
    val emb = Multimodal.featurize(media, 4).toDF()
      .select(col("media_id").as("id"),
        transform(col("features"), _.cast("double")).as("v"))
    val queries = emb.filter(col("id") < 5)
      .select(col("id").as("qid"), col("v").as("qv"))
    val topk = graft.similarity.Ann.ivfTopK(emb, queries, 3, c = 8)
      .collect()
    assert(topk.nonEmpty)
    val byQ = topk.groupBy(_.getAs[Long]("qid"))
    assert(byQ.values.forall(_.length <= 3))
    // 16-dim stub features: dimensionality is derived from the data,
    // not assumed 64 (the round-3 review fix)
    val (centroids, _) = graft.similarity.Ann.ivfIndex(emb, c = 8)
    assert(centroids.forall(_.length == Multimodal.featureDim))
  }

  test("real PNG codec round-trip: block sums equal the closed-form pixel formula") {
    // independent re-derivation: plain (x, y) sweep accumulating into
    // blocks — a different loop structure than poolSums' block-major one
    for (id <- Seq(0L, 1L, 7L, 499L, 123456L)) {
      val expected = new Array[Long](16)
      for (y <- 0 until 16; x <- 0 until 16)
        expected((y / 4) * 4 + (x / 4)) += (id * 31 + x * 7 + y * 13) % 256
      val png = Multimodal.encodePng(id, 16, 16)
      assert(Multimodal.isPng(png))
      assert(Multimodal.decodeImageBlockSums(png, 4).toSeq == expected.toSeq,
        s"codec round-trip diverged for id=$id")
    }
  }

  test("featurize dispatch: real decode for PNG image rows, stub for the rest") {
    val png = Multimodal.encodePng(42L, 16, 16)
    val textBytes = "not an image".getBytes("UTF-8")
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png, 16, 16), // real decoder
      Multimodal.MediaRow(2L, "image", textBytes, 16, 16), // not PNG -> stub
      Multimodal.MediaRow(3L, "audio", png, 16, 16) // kind gate -> stub
    ).toDS()
    val feats = Multimodal.featurize(media, 2).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(feats(1L) == Multimodal.decodeImage(png).toSeq)
    assert(feats(1L) != Multimodal.decodeStub(png).toSeq)
    assert(feats(2L) == Multimodal.decodeStub(textBytes).toSeq)
    assert(feats(3L) == Multimodal.decodeStub(png).toSeq)
    // real features share the stub contract: dim 16, centered range
    assert(feats(1L).length == Multimodal.featureDim)
    assert(feats(1L).forall(v => v >= -0.5f && v < 0.5f))
  }

  test("corrupt image payload fails loud, never silently fake features") {
    val truncated = Multimodal.encodePng(1L, 16, 16).take(20)
    intercept[Exception](Multimodal.decodeImageBlockSums(truncated, 4))
  }

  test("real WAV codec round-trip: window sums equal the closed-form sample formula") {
    for (id <- Seq(0L, 1L, 7L, 499L, 123456L)) {
      val expected = new Array[Long](16)
      for (j <- 0 until 256)
        expected(j / 16) += (id * 131 + j * 17) % 65536 - 32768
      val wav = Multimodal.encodeWav(id, 256)
      assert(Multimodal.isWav(wav))
      assert(Multimodal.decodeWavWindowSums(wav, 16).toSeq == expected.toSeq,
        s"audio codec round-trip diverged for id=$id")
    }
    // corrupt: RIFF magic but truncated body
    intercept[Exception](
      Multimodal.decodeWavWindowSums(Multimodal.encodeWav(1L, 256).take(24), 16))
  }

  test("real GIF codec round-trip: per-frame block sums equal the formula") {
    for (id <- Seq(0L, 1L, 499L, 123456L)) {
      val gif = Multimodal.encodeGif(id, 4, 16, 16)
      assert(Multimodal.isGif(gif))
      val frames = Multimodal.decodeGifFrameSums(gif, 4)
      assert(frames.map(_._1) == Seq(0, 1, 2, 3))
      for ((f, sums) <- frames) {
        val expected = new Array[Long](16)
        for (y <- 0 until 16; x <- 0 until 16)
          expected((y / 4) * 4 + (x / 4)) += (id * 31 + f * 41 + x * 7 + y * 13) % 256
        assert(sums.toSeq == expected.toSeq,
          s"gif codec round-trip diverged for id=$id frame=$f")
      }
    }
    intercept[Exception](
      Multimodal.decodeGifFrameSums("GIF89a-garbage".getBytes("UTF-8"), 4))
  }

  test("frame sampling is REAL for GIF payloads: frames come back as decodable PNGs") {
    val gif = Multimodal.encodeGif(7L, 4, 16, 16)
    val media = Seq(
      Multimodal.MediaRow(1L, "video", gif, 16, 16),
      Multimodal.MediaRow(2L, "video", "not a gif".getBytes("UTF-8"), 0, 0)
    ).toDS()
    val frames = Multimodal.sampleFrames(media, 3).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("frame_idx"),
        r.getAs[Array[Byte]]("frame_payload")))
    val real = frames.filter(_._1 == 1L).sortBy(_._2)
    assert(real.length == 3) // capped at nFrames of the 4 in the clip
    for ((_, f, png) <- real) {
      assert(Multimodal.isPng(png)) // re-encoded standalone frame
      val expected = new Array[Long](16)
      for (y <- 0 until 16; x <- 0 until 16)
        expected((y / 4) * 4 + (x / 4)) += (7L * 31 + f * 41 + x * 7 + y * 13) % 256
      assert(Multimodal.decodeImageBlockSums(png, 4).toSeq == expected.toSeq)
    }
    // non-GIF keeps the stub byte-slice shape
    assert(frames.count(_._1 == 2L) == 3)
    assert(frames.filter(_._1 == 2L).forall(r => !Multimodal.isPng(r._3)))
  }

  test("featurize dispatch: real audio decode for WAV rows, stub otherwise") {
    val wav = Multimodal.encodeWav(9L, 256)
    val gif = Multimodal.encodeGif(9L, 4, 16, 16)
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", wav, 256, 1), // real decoder
      Multimodal.MediaRow(2L, "audio", "noise".getBytes("UTF-8"), 0, 0), // stub
      Multimodal.MediaRow(3L, "video", wav, 256, 1), // magic gate -> stub
      Multimodal.MediaRow(4L, "video", gif, 16, 16) // real video decoder
    ).toDS()
    val feats = Multimodal.featurize(media, 2).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(feats(1L) == Multimodal.decodeAudio(wav).toSeq)
    assert(feats(2L) == Multimodal.decodeStub("noise".getBytes("UTF-8")).toSeq)
    assert(feats(3L) == Multimodal.decodeStub(wav).toSeq)
    assert(feats(4L) == Multimodal.decodeVideo(gif).toSeq)
    assert(feats(4L).forall(v => v >= -0.5f && v < 0.5f))
    assert(feats(1L).length == Multimodal.featureDim)
    assert(feats(1L).forall(v => v >= -0.5f && v < 0.5f))
  }

  test("decodeVideo normalizes each GIF frame by its OWN geometry (delta-frame shape)") {
    // hand-build a 2-frame GIF whose second frame is a smaller
    // sub-rectangle (the delta-optimized layout): a frame-0-sized
    // divisor would mis-scale frame 1 by 4x
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    def flat(w: Int, h: Int, v: Int) = {
      // explicit 256-gray indexed palette, like the engine's encoder —
      // TYPE_BYTE_GRAY would be re-palettized lossily by the GIF writer
      val p = Array.tabulate[Byte](256)(_.toByte)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED,
        new java.awt.image.IndexColorModel(8, 256, p, p, p))
      val g = img.getRaster
      for (y <- 0 until h; x <- 0 until w) g.setSample(x, y, 0, v)
      img
    }
    try {
      wr.setOutput(ios)
      wr.prepareWriteSequence(null)
      wr.writeToSequence(new javax.imageio.IIOImage(flat(16, 16, 100), null, null), null)
      wr.writeToSequence(new javax.imageio.IIOImage(flat(8, 8, 200), null, null), null)
      wr.endWriteSequence()
    } finally { ios.close(); wr.dispose() }
    val gif = bos.toByteArray
    assert(Multimodal.isGif(gif))
    // each flat frame's block mean equals its pixel value regardless of
    // frame size, so the average of per-frame means is exactly 150
    val feats = Multimodal.decodeVideo(gif)
    val want = (150f / 2f / 255f) * 2f - 0.5f // (100/255 + 200/255)/2 - 0.5
    assert(feats.length == Multimodal.featureDim)
    feats.foreach(v => assert(math.abs(v - want) < 1e-6f,
      s"per-frame normalization broken: $v vs $want"))
  }

  test("featurize degrades to the stub on decoder-rejected payloads instead of failing") {
    // a header-only WAV passes the RIFF/WAVE sniff but decodeAudio
    // rejects it loud (0 samples); featurize must not fail the job
    val emptyWav = Multimodal.encodeWav(3L, 0)
    assert(Multimodal.isWav(emptyWav))
    intercept[Exception](Multimodal.decodeAudio(emptyWav))
    val media = Seq(Multimodal.MediaRow(1L, "audio", emptyWav, 0, 1)).toDS()
    val fallbacks = spark.sparkContext.longAccumulator("test.stubFallbacks")
    val feats = Multimodal.featurize(media, 2, Some(fallbacks)).collect()
    assert(feats.length == 1)
    assert(feats.head.features.toSeq == Multimodal.decodeStub(emptyWav).toSeq)
    // the degradation must be OBSERVABLE: the exception-path fallback
    // increments the counter (declared stub dispatch must not — second
    // run with a plain non-media payload stays at the same count)
    assert(fallbacks.value == 1L)
    val declared = Seq(Multimodal.MediaRow(2L, "image",
      "not a png".getBytes("UTF-8"), 0, 0)).toDS()
    Multimodal.featurize(declared, 2, Some(fallbacks)).collect()
    assert(fallbacks.value == 1L)
    // counter-less calls land on the SESSION-WIDE default counter —
    // the one Bench reads into stub_fallback_rows
    val session = Multimodal.stubFallbackCounter(spark.sparkContext)
    val before = session.value
    Multimodal.featurize(media, 2).collect()
    assert(session.value == before + 1L,
      s"default-counter wiring broken: $before -> ${session.value}")
    assert(Multimodal.stubFallbackCounter(spark.sparkContext) eq session,
      "counter must be one per SparkContext, not one per call")
  }

  test("multimodal frame sampling: n typed frames per row") {
    val pages = Fixtures.pages(spark, Fixtures.tiny).toDF().limit(5)
    val media = Multimodal.mediaFromPages(spark, pages)
    val frames = Multimodal.sampleFrames(media, 4)
    assert(frames.count() == 20)
    assert(frames.groupBy("media_id").count().select(max("count")).as[Long].head() == 4)
  }

  test("Md5MinHash == built-in split/shingle/md5/min form, incl. edge tokenization") {
    // adversarial tokenization: empty tokens (double/leading/trailing
    // spaces), unicode, exactly-3 tokens, under-3 tokens (NULL)
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a  b c"), // empty token between a and b
      (3L, " leading space tokens here"),
      (4L, "trailing space tokens here "),
      (5L, "exactly three tokens"),
      (6L, "two tokens"),
      (7L, "naïve café déjà vu ünïcôdé"),
      (8L, ""),
      (9L, "x " * 50 + "y"))
      .toDF("id", "text")
    val native = texts.select(col("id"),
      graft.functions.Md5MinHash.of(col("text"), n = 3, k = 2).as("sg"))
    // reference form: interpreted HOF shingles + exploded md5 mins
    val t = split(col("text"), " ")
    val sh = transform(sequence(lit(0), size(t) - 3), i =>
      concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3)))
    val ref = texts.withColumn("t", t).filter(size(col("t")) >= 3)
      .select(col("id"), explode(sh).as("g"))
      .groupBy("id")
      .agg(min(md5(concat(lit("0:"), col("g")))).as("s0"),
        min(md5(concat(lit("1:"), col("g")))).as("s1"))
    val nat = native.filter(col("sg").isNotNull)
      .select(col("id"), element_at(col("sg"), 1).as("s0"), element_at(col("sg"), 2).as("s1"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    val exp = ref.as[(Long, String, String)].collect().sortBy(_._1)
    assert(nat.toSeq == exp.toSeq)
    // NULL exactly where fewer than 3 tokens
    val nulls = native.filter(col("sg").isNull).select("id").as[Long].collect().toSet
    assert(nulls == Set(6L, 8L), s"unexpected null set $nulls")
  }

  test("Md5SimHash == relational fingerprintsPortable") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a  b c"),
      (3L, " leading and trailing "),
      (4L, "single"),
      (5L, ""),
      (6L, "naïve café déjà vu ünïcôdé"),
      (7L, ("tok " * 200).trim))
      .toDF("doc_id", "text")
    val native = texts.select(col("doc_id"),
      graft.functions.Md5SimHash.of(col("text")).as("sh"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val rel = SimHash.fingerprintsPortable(texts, "doc_id", split(col("text"), " "))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(native.toSeq == rel.toSeq)
  }

  test("Md5MinHash/Md5SimHash parity holds on 300 seeded-random strings") {
    // randomized sweep (fixed seed, deterministic): mixed alphabets,
    // space runs, unicode, zero-to-long lengths — one DF pass per form
    val rnd = new scala.util.Random(4242)
    val alphabet = "ab cde  f—ghé世 ij" // spaces, accents, CJK
    val texts = (1L to 300L).map { i =>
      val len = rnd.nextInt(120)
      (i, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }.toDF("id", "text")
    val t = split(col("text"), " ")
    val sh = transform(sequence(lit(0), size(t) - 3), i =>
      concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3)))
    val refMin = texts.withColumn("t", t).filter(size(col("t")) >= 3)
      .select(col("id"), explode(sh).as("g"))
      .groupBy("id")
      .agg(min(md5(concat(lit("0:"), col("g")))).as("s0"),
        min(md5(concat(lit("1:"), col("g")))).as("s1"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    val natMin = texts.select(col("id"),
      graft.functions.Md5MinHash.of(col("text"), n = 3, k = 2).as("sg"))
      .filter(col("sg").isNotNull)
      .select(col("id"), element_at(col("sg"), 1), element_at(col("sg"), 2))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(natMin.toSeq == refMin.toSeq)
    val refSim = SimHash.fingerprintsPortable(texts, "id", split(col("text"), " "))
      .as[(Long, Long)].collect().sortBy(_._1)
    val natSim = texts.select(col("id"),
      graft.functions.Md5SimHash.of(col("text")).as("sh"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(natSim.toSeq == refSim.toSeq)
  }

  test("CosineSim bit-equal to HOF form; LshBuckets equal to per-plane formula") {
    import graft.core.Ids
    val dim = 64
    val vecs = (1L to 40L).map { i =>
      (i, (0 until dim).map(d => Ids.unitDouble(Ids.mix64(i, d.toLong)) - 0.5).toArray)
    }.toDF("id", "v")
    val v2 = vecs.select(col("id").as("id2"), col("v").as("w"))
    val pairs = vecs.crossJoin(v2).filter(col("id") < col("id2"))
    val hofDot = aggregate(zip_with(col("v"), col("w"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val hofNrm = (a: org.apache.spark.sql.Column) =>
      sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val both = pairs.select(col("id"), col("id2"),
      graft.functions.VectorOps.cosine(col("v"), col("w")).as("native"),
      (hofDot / (hofNrm(col("v")) * hofNrm(col("w")))).as("hof"))
      .as[(Long, Long, Double, Double)].collect()
    // identical operation order => bit-equal, not just close
    assert(both.forall(r => r._3 == r._4),
      both.filter(r => r._3 != r._4).take(3).mkString(","))

    // LshBuckets == the old per-plane constant-sign-array formula
    def sign(t: Int, p: Int, d: Int): Double =
      if ((Ids.mix64(Ids.mix64(t * 131L + p) ^ d) & 1L) == 0L) 1.0 else -1.0
    val (tables, planes) = (8, 6)
    val got = vecs.select(col("id"),
      graft.functions.VectorOps.lshBuckets(col("v"), tables, planes).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    val raw = vecs.as[(Long, Seq[Double])].collect().toMap
    for ((id, v) <- raw; t <- 0 until tables) {
      var bucket = 0L
      for (p <- 0 until planes) {
        val proj = (0 until dim).map(d => v(d) * sign(t, p, d)).sum
        if (proj > 0) bucket += 1L << p
      }
      assert(got(id)(t) == bucket, s"id=$id t=$t")
    }
  }

  test("CdcBoundaries == interpreted HOF rolling-hash form on fixture docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .withColumn("n", length(col("text")))
      .filter(col("n") >= 8)
    val w = 8
    val pow = (0 until w).map(j => (0 until (w - 1 - j)).foldLeft(1L)((a, _) => a * 31L))
    val hof = docs
      .withColumn("cp", transform(split(col("text"), ""), ch => ascii(ch).cast("long")))
      .select(col("doc_id"),
        filter(
          transform(sequence(lit(1), col("n") - (w - 1)), i =>
            struct(i.as("i"),
              (0 until w).map(j =>
                element_at(col("cp"), i + lit(j)) * lit(pow(j)))
                .reduce(_ + _).as("h"))),
          x => pmod(x("h"), lit(64L)) === 0).as("b"))
      .select(col("doc_id"), transform(col("b"), x => x("i")).as("b"))
      .as[(Long, Seq[Int])].collect().toMap
    val native = docs
      .select(col("doc_id"),
        graft.functions.CdcBoundaries.of(col("text"), w, 64L).as("b"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(native.keySet == hof.keySet && native.nonEmpty)
    native.foreach { case (id, b) => assert(b == hof(id), s"doc $id") }
    // edge cases: under-window text -> empty; exact-window boundary math
    val edge = Seq((1L, "short"), (2L, "12345678"), (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.CdcBoundaries.of(col("text"), w, 64L).as("b"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(edge(1L).isEmpty && edge(3L).isEmpty)
    val h8 = "12345678".map(_.toLong).zip(pow).map { case (cp, pw) => cp * pw }.sum
    assert(edge(2L) == (if (h8 % 64 == 0) Seq(1) else Seq.empty))
    // astral chars: positions/codepoints must match the HOF form (which
    // is codepoint-indexed via split(text,'')+ascii), not UTF-16 units
    val astral = Seq((1L, "a😀bcdefghij klmnop qrstuv"))
      .toDF("doc_id", "text")
      .withColumn("n", length(col("text")))
    val hofA = astral
      .withColumn("cp", transform(split(col("text"), ""), ch => ascii(ch).cast("long")))
      .select(filter(
        transform(sequence(lit(1), col("n") - (w - 1)), i =>
          struct(i.as("i"),
            (0 until w).map(j =>
              element_at(col("cp"), i + lit(j)) * lit(pow(j)))
              .reduce(_ + _).as("h"))),
        x => pmod(x("h"), lit(64L)) === 0).as("b"))
      .select(transform(col("b"), x => x("i")).as("b"))
      .as[Seq[Int]].head()
    val natA = astral
      .select(graft.functions.CdcBoundaries.of(col("text"), w, 64L).as("b"))
      .as[Seq[Int]].head()
    assert(natA == hofA, s"astral divergence: native $natA vs hof $hofA")
  }
}
