package graft

import graft.operators.TextStats
import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("language ID: correct on real-language text; driver docs detect as en") {
    // NOTE: the driver documents table's `lang` column is a synthetic
    // label — its text is English-ish word salad for every lang value
    // (verified by inspection), so accuracy-vs-column is not a valid
    // oracle. Validate on constructed sentences + en-dominance instead.
    assert(TextStats.detectLang("the cat and the dog went to the barn") == "en")
    assert(TextStats.detectLang("der Hund und die Katze ist im Haus") == "de")
    assert(TextStats.detectLang("le chat est dans la maison avec le chien") == "fr")
    assert(TextStats.detectLang("el perro y el gato en la casa") == "es")
    assert(TextStats.detectLang("xyzzy 12345") == "und")
    assert(TextStats.detectLang("") == "und")
    val preds = TextStats.withLangId(docs)
    val enRate = preds
      .agg(avg((col("lang_pred") === "en").cast("int"))).collect()(0).getDouble(0)
    info(f"driver docs detected as en: $enRate%.3f")
    assert(enRate >= 0.7) // stopword-poor word salad may fall to "und"
    // but never to a wrong language
    assert(preds.filter(!col("lang_pred").isin("en", "und")).count() == 0)
  }

  test("token counts: whitespace and BPE-ish are consistent") {
    val d = docs.withColumn("ws", TextStats.wsTokenCount(col("text")))
      .withColumn("bpe", TextStats.bpeishTokenCount(col("text")))
    // BPE-ish splits at least as fine as whitespace
    assert(d.filter(col("bpe") < col("ws")).count() == 0)
    val row = spark.sql("SELECT 'a b  c-d' AS t")
    assert(row.select(TextStats.wsTokenCount(col("t"))).collect()(0).getInt(0) == 3)
    assert(row.select(TextStats.bpeishTokenCount(col("t"))).collect()(0).getInt(0) == 5)
  }

  test("quality score is in [0,1] and penalizes junk") {
    import spark.implicits._
    val sample = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and runs to the barn with great speed today."),
      (2L, "!!!###$$$ ??? *** ### !!!"),
      (3L, "a")
    ).toDF("doc_id", "text")
    val q = TextStats.withQualityScore(sample)
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(2L))
    assert(q(1L) > q(3L))
  }

  test("repetition signals: hand-computed goldens") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b\na b\nc\n\nc"),
      (2L, "spam ham spam ham spam ham spam ham"),
      (3L, ""),
      (4L, "one two three four five six")
    ).toDF("doc_id", "text")
    val r = TextStats.withRepetitionSignals(d).orderBy("doc_id")
      .select("doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac",
        "dup_para_frac", "n_2grams", "top_2gram_frac", "dup_5gram_frac")
      .collect()
    // doc 1: lines [a b, a b, c, c] → dup 2/4; chars (3+3+1+1)−(3+1)=4 of 8;
    // paras [a b\na b\nc, c] distinct; bigrams [a b, b a, a b, b c, c c] →
    // top "a b"=2 of 5; 5-grams [a b a b c, b a b c c] distinct
    assert(r(0).getInt(1) == 4 && r(0).getDouble(2) == 0.5 &&
      r(0).getDouble(3) == 0.5 && r(0).getDouble(4) == 0.0)
    assert(r(0).getInt(5) == 5 && r(0).getDouble(6) == 2.0 / 5.0 &&
      r(0).getDouble(7) == 0.0)
    // doc 2: 8 words → 7 bigrams, "spam ham"×4 → 4/7; 4 5-grams, 2
    // distinct → 0.5; one line, no duplicates
    assert(r(1).getDouble(2) == 0.0 && r(1).getInt(5) == 7 &&
      r(1).getDouble(6) == 4.0 / 7.0 && r(1).getDouble(7) == 0.5)
    // doc 3 (empty): every count 0, every fraction 0.0 (no NaN/null)
    assert(r(2).getInt(1) == 0 && r(2).getInt(5) == 0 &&
      (2 to 7).forall(i => !r(2).isNullAt(i)) &&
      Seq(2, 3, 4, 6, 7).forall(i => r(2).getDouble(i) == 0.0))
    // doc 4: no duplicates anywhere; top_2gram_frac floors at 1/n_2grams
    // (every bigram unique, max count 1 of 5)
    assert(Seq(2, 3, 4, 7).forall(i => r(3).getDouble(i) == 0.0))
    assert(r(3).getDouble(6) == 1.0 / 5.0)

    // keep-filter: the spammy doc is dropped, clean docs survive
    val kept = TextStats.repetitionKeep(d).select("doc_id")
      .as[Long].collect().toSet
    assert(!kept.contains(2L) && kept.contains(4L) && kept.contains(3L))
  }

  test("property: repetition signals == driver-side brute force (exact doubles)") {
    import org.scalacheck.{Gen, Prop, Test => SchkTest}
    import spark.implicits._
    def brute(text: String): Seq[Double] = {
      val lines = text.split("\n", -1).toSeq.filter(_.nonEmpty)
      val paras = text.split("\n\n", -1).toSeq.filter(_.nonEmpty)
      val words = text.toLowerCase.split("\\W+").toSeq.filter(_.nonEmpty)
      def frac(n: Long, d: Long) = if (d > 0) n.toDouble / d.toDouble else 0.0
      val g2 = if (words.size >= 2) words.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty[String]
      val g5 = if (words.size >= 5) words.sliding(5).map(_.mkString(" ")).toSeq else Seq.empty[String]
      val lc = lines.map(_.length.toLong).sum
      val lcd = lines.distinct.map(_.length.toLong).sum
      Seq(
        lines.size.toDouble,
        frac(lines.size - lines.distinct.size, lines.size),
        frac(lc - lcd, lc),
        frac(paras.size - paras.distinct.size, paras.size),
        g2.size.toDouble,
        frac(if (g2.isEmpty) 0L else g2.groupBy(identity).values.map(_.size).max.toLong, g2.size),
        frac(g5.size - g5.distinct.size, g5.size))
    }
    // tiny vocab + explicit newline tokens force collisions at every
    // granularity (lines, paragraphs, 2- and 5-grams)
    val token = Gen.oneOf("aa", "bb", "cc", "aa bb", "\n", "\n\n")
    val doc = Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, token)).map(_.mkString(" "))
    val prop = Prop.forAll(Gen.listOfN(6, doc)) { ds =>
      val df = ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = TextStats.withRepetitionSignals(df).orderBy("doc_id")
        .select(col("n_lines").cast("double"), col("dup_line_frac"),
          col("dup_line_char_frac"), col("dup_para_frac"),
          col("n_2grams").cast("double"), col("top_2gram_frac"),
          col("dup_5gram_frac"))
        .collect().map(r => (0 to 6).map(r.getDouble))
      got.toSeq.zip(ds.map(brute)).forall { case (g, b) => g == b }
    }
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("repetition signals plan: one projection, zero exchanges") {
    import org.apache.spark.sql.execution.exchange.Exchange
    // the fast single-pass path (what repetitionKeep runs)
    val q = TextStats.repetitionKeep(docs)
    q.count()
    val plan = q.queryExecution.executedPlan
    assert(plan.collect { case e: Exchange => e }.isEmpty,
      s"repetition keep-filter must not shuffle:\n$plan")
    // the Column-expression REFERENCE form stays UDF-free: higher-order
    // array expressions evaluate interpreted (no doGenCode) but are
    // native expressions — it is the executable spec the oracle replays
    val ref = TextStats.withRepetitionSignals(docs)
    ref.queryExecution.executedPlan
    assert(!ref.queryExecution.executedPlan.toString.contains("ScalaUDF"),
      "the reference signal form must be built-in expressions, not UDFs")
  }

  test("fast single-pass signals == Column-expression reference, bit-exact") {
    import org.scalacheck.{Gen, Prop, Test => SchkTest}
    import spark.implicits._
    val cols = Seq("n_lines", "dup_line_frac", "dup_line_char_frac",
      "dup_para_frac", "n_2grams", "top_2gram_frac", "dup_5gram_frac")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").selectExpr("doc_id" +: cols: _*)
        .collect().map(_.toSeq).toSeq
    // fixture corpus: the two paths must agree on every real document
    assert(rows(TextStats.withRepetitionSignalsFast(docs)) ==
      rows(TextStats.withRepetitionSignals(docs)))
    // random dup-heavy corpora: collisions at every granularity
    val token = Gen.oneOf("aa", "bb", "cc", "aa bb", "\n", "\n\n")
    val doc = Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, token)).map(_.mkString(" "))
    val prop = Prop.forAll(Gen.listOfN(6, doc)) { ds =>
      val df = ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      rows(TextStats.withRepetitionSignalsFast(df)) ==
        rows(TextStats.withRepetitionSignals(df))
    }
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("fingerprint is whitespace-normalization-stable, content-sensitive") {
    val a = TextStats.fingerprint64("The quick   brown\tfox")
    val b = TextStats.fingerprint64("the quick brown fox")
    val c = TextStats.fingerprint64("the quick brown cat")
    assert(a == b)
    assert(a != c)
  }

  test("JPEG decode is real too (JDK codec; lossy, so not used for fixtures)") {
    val img = Multimodal.genImage(7L, 32, 24)
    val jpeg = Multimodal.encodeImage(img, "jpg")
    val dec = Multimodal.decodeImage(jpeg).get
    assert(dec.getWidth == 32 && dec.getHeight == 24)
    val meta = Multimodal.decodeOne(Multimodal.MediaRow(7L, "image", jpeg, "u")).get
    assert(meta.format == "jpeg" && meta.width == 32 && meta.height == 24 &&
      meta.n_frames == 1)
  }

  test("AVI/MJPEG codec is real: container round-trip, frame decode, corrupt rejection") {
    val w = 24; val h = 16
    val frameImgs = (0 until 6).map(f => Multimodal.genImage(1000L + f, w, h))
    val frames = frameImgs.map(img => Multimodal.encodeImage(img, "jpeg"))
    val avi = Multimodal.encodeAviMjpeg(frames, w, h)
    // container walk recovers dims + counted frames
    val meta = Multimodal.decodeAvi(avi).get
    assert(meta.width == w && meta.height == h && meta.nFrames == 6)
    // every frame is a genuine JPEG that ImageIO decodes at stream dims,
    // and (JPEG being lossy but close) pixel content tracks the source
    (0 until 6).foreach { f =>
      val img = Multimodal.aviFrame(avi, meta, f).get
      assert(img.getWidth == w && img.getHeight == h)
      var err = 0L; var n = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val a = img.getRGB(x, y); val b = frameImgs(f).getRGB(x, y)
          err += math.abs(((a >> 16) & 0xff) - ((b >> 16) & 0xff)) +
            math.abs(((a >> 8) & 0xff) - ((b >> 8) & 0xff)) +
            math.abs((a & 0xff) - (b & 0xff))
          n += 3; x += 1
        }
        y += 1
      }
      assert(err.toDouble / n < 20.0, s"frame $f mean abs channel error ${err.toDouble / n}")
    }
    // a truncated movi body (header declares 6 frames, file carries 3)
    // is rejected, not under-reported
    val short3 = Multimodal.encodeAviMjpeg(frames.take(3), w, h)
    assert(Multimodal.decodeAvi(short3).isDefined)
    val lying = short3.clone()
    lying(48) = 6 // dwTotalFrames/strh mismatch vs counted chunks
    lying(140) = 6
    assert(Multimodal.decodeAvi(lying).isEmpty)
    // a corrupt chunk length rejects the file instead of throwing
    val corrupt = avi.clone()
    corrupt(228) = -1; corrupt(229) = -1; corrupt(230) = -1; corrupt(231) = 0x7f
    assert(Multimodal.decodeAvi(corrupt).isEmpty)
    // totality: EVERY prefix truncation (including mid-strh/strf/LIST
    // bodies, where a declared len promises bytes that don't exist)
    // returns None or a parse — never throws in the executor
    (0 until avi.length).foreach { n =>
      Multimodal.decodeAvi(java.util.Arrays.copyOf(avi, n))
    }
  }

  test("multimodal: real PNG/BMP/WAV/AVI codecs round-trip; resize; frame sampling") {
    import spark.implicits._
    val media = Multimodal.genMedia(spark, 200).cache()
    val decoded = Multimodal.decode(media).cache()
    assert(decoded.count() == 200) // all generated payloads are decodable

    // REAL image codec: ImageIO decode of the genuine PNG/BMP payloads
    // recovers every generated pixel exactly (lossless formats)
    val imgRows = media.filter(col("modality") === "image").limit(5).collect()
    assert(imgRows.nonEmpty)
    imgRows.foreach { m =>
      val img = Multimodal.decodeImage(m.payload).get
      val ref = Multimodal.genImage(m.media_id, img.getWidth, img.getHeight)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          assert((img.getRGB(x, y) & 0xffffff) == (ref.getRGB(x, y) & 0xffffff),
            s"pixel ($x,$y) of media ${m.media_id}")
          x += 1
        }
        y += 1
      }
    }

    // REAL wav codec: RIFF parse + PCM sample round-trip of the sine
    val wavRows = media.filter(col("modality") === "audio").limit(3).collect()
    assert(wavRows.nonEmpty)
    wavRows.foreach { m =>
      val wm = Multimodal.decodeWav(m.payload).get
      assert(wm.sampleRate == 8000 && wm.channels == 1)
      val got = Multimodal.wavSamples(m.payload, wm)
      val h = scala.util.hashing.MurmurHash3.stringHash(s"media:${m.media_id}", 99)
      val freq = 100 + math.abs(h / 11) % 900
      val exp = Array.tabulate[Short](wm.nSamples)(j =>
        (math.sin(2 * math.Pi * freq * j / 8000) * 12000).toShort)
      assert(got.sameElements(exp))
    }

    // malformed payload drops cleanly
    val bad = Seq(Multimodal.MediaRow(999L, "image", Array[Byte](1, 2, 3), "u")).toDS()
    assert(Multimodal.decode(bad).count() == 0)

    // features: fixed dim, L1-normalized over decoded content
    val feats = Multimodal.withFeatures(media)
    val f0 = feats.select("features").as[Array[Float]].first()
    assert(f0.length == 16)
    assert(math.abs(f0.map(_.toDouble).sum - 1.0) < 1e-3)

    // REAL resize: 8x8 PNG thumbnails for every image row, decodable
    val nImages = media.filter(col("modality") === "image").count()
    val thumbs = Multimodal.withThumbnails(media).filter(col("thumb_png").isNotNull).cache()
    assert(thumbs.count() == nImages)
    val tb = thumbs.select("thumb_png").as[Array[Byte]].first()
    val timg = Multimodal.decodeImage(tb).get
    assert(timg.getWidth == 8 && timg.getHeight == 8)

    // REAL video frame sampling: stride respected and every sampled
    // frame actually decoded (dims carried from the decoded JPEG)
    val frames = Multimodal.sampleFrames(media, everyK = 4).cache()
    val idx = frames.select("frame_idx").distinct().as[Int].collect()
    assert(idx.nonEmpty && idx.forall(_ % 4 == 0))
    assert(frames.filter(col("frame_w") <= 0 || col("frame_h") <= 0).count() == 0)
    // frame count per video = ceil(nFrames/4) per the decoded metadata
    val vidMeta = decoded.filter(col("modality") === "video")
      .select("media_id", "n_frames").as[(Long, Int)].collect().toMap
    val perVid = frames.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    vidMeta.foreach { case (id, nf) =>
      assert(perVid.getOrElse(id, 0L) == (nf + 3) / 4, s"media $id")
    }
  }
}
