package graft

import org.apache.spark.sql.functions._

import graft.io.Corpus
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** The multimodal decode path: payloads must be REAL BMPs (cross-checked
  * against the JDK's own ImageIO decoder) and the header parser must
  * read dimensions out of the bytes, not echo the inputs. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("generated payloads are valid BMPs per the JDK's ImageIO decoder") {
    val bytes = Multimodal.bmpBytes(7, 5, "hello".getBytes("UTF-8"))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not parse the generated BMP")
    assert(img.getWidth === 7 && img.getHeight === 5)
  }

  test("decodeBmp reads dimensions from the header bytes") {
    val f = Multimodal.decodeBmp(MediaRow(1L, Multimodal.bmpBytes(19, 10, Array(42)), "bmp"))
    assert(f.width === 19 && f.height === 10 && f.n_frames === 1)
    assert(f.n_bytes === 54L + 10 * ((3 * 19 + 3) / 4 * 4))
    // top-down BMPs store negative height; magnitude must come back
    val neg = Multimodal.bmpBytes(4, 3, Array.empty[Byte])
    java.nio.ByteBuffer.wrap(neg).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(22, -3)
    assert(Multimodal.decodeBmp(MediaRow(2L, neg, "bmp")).height === 3)
  }

  test("decodeBmp rejects non-BMP payloads instead of fabricating features") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmp(MediaRow(3L, "not an image".getBytes("UTF-8"), "bmp"))
    }
  }

  test("generated WAVs are valid per the JDK's own audio parser") {
    val bytes = Multimodal.wavBytes(8000, 120, "audio".getBytes("UTF-8"))
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    assert(in.getFormat.getSampleRate === 8000f)
    assert(in.getFormat.getSampleSizeInBits === 16)
    assert(in.getFrameLength === 120L)
  }

  test("decodeWav reads rate/bits/frames from the chunk list") {
    val f = Multimodal.decodeWav(MediaRow(1L, Multimodal.wavBytes(44100, 256, Array(7)), "wav"))
    assert(f.width === 44100 && f.height === 16 && f.n_frames === 256)
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(MediaRow(2L, "not audio at all, definitely".getBytes("UTF-8") ++ new Array[Byte](44), "wav"))
    }
  }

  test("audio table end-to-end: every corpus doc decodes to its frame count") {
    val docs = Corpus.documents(spark, sf0001)
    val feats = Multimodal.extractFeatures(Multimodal.toAudioTable(docs))
    assert(feats.count() === docs.count())
    assert(feats.filter(col("width") =!= 8000 || col("height") =!= 16).count() === 0)
    val expected = docs.select(col("doc_id"),
      (lit(32) + octet_length(col("text")) % 256).cast("int").as("exp_frames"))
    val bad = feats.join(expected, "doc_id").filter(col("n_frames") =!= col("exp_frames"))
    assert(bad.count() === 0, "frame count must round-trip through the WAV encode/decode")
  }

  test("video container: every sampled frame is a valid BMP per ImageIO, offsets walk exactly") {
    val docs = Corpus.documents(spark, sf0001).limit(20)
    val videos = Multimodal.toVideoTable(docs).collect()
    val frames = Multimodal.sampleFrames(Multimodal.toVideoTable(docs), every = 1)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3), r.getLong(4)))
    val byDoc = frames.groupBy(_._1)
    videos.foreach { v =>
      val id = v.getLong(0)
      val media = v.getAs[Array[Byte]](1)
      val fs = byDoc(id).sortBy(_._2)
      // offsets are a gapless walk ending exactly at the container's end
      assert(fs.head._3 === 8L)
      fs.sliding(2).foreach {
        case Array(a, b) => assert(b._3 === a._3 + a._4, s"doc $id frame walk gap")
        case _ => ()
      }
      assert(fs.last._3 + fs.last._4 === media.length.toLong, s"doc $id trailing bytes")
      // every extracted frame parses as a real image in the JDK decoder
      fs.foreach { case (_, _, off, size) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
          java.util.Arrays.copyOfRange(media, off.toInt, (off + size).toInt)))
        assert(img != null, s"doc $id: extracted frame at $off is not a valid BMP")
      }
    }
  }

  test("frame sampling stride keeps every k-th frame only") {
    val docs = Corpus.documents(spark, sf0001).limit(40)
    val all = Multimodal.sampleFrames(Multimodal.toVideoTable(docs), every = 1)
    val sampled = Multimodal.sampleFrames(Multimodal.toVideoTable(docs), every = 2)
    assert(sampled.filter(col("frame_idx") % 2 =!= 0).count() === 0)
    val expect = all.filter(col("frame_idx") % 2 === 0).count()
    assert(sampled.count() === expect)
  }

  test("resize halves dimensions and maps pixels nearest-neighbor, per ImageIO") {
    val docs = Corpus.documents(spark, sf0001).limit(15)
    val orig = Multimodal.toMediaTable(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val resized = Multimodal.resizeMedia(Multimodal.toMediaTable(docs), factor = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    def img(b: Array[Byte]) =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    resized.foreach { case (id, bytes) =>
      val small = img(bytes)
      val big = img(orig(id))
      assert(small != null, s"doc $id: resized payload is not a valid BMP")
      assert(small.getWidth === (big.getWidth + 1) / 2 &&
        small.getHeight === (big.getHeight + 1) / 2, s"doc $id dims")
      // nearest-neighbor: resized stored-row y2 samples stored-row 2·y2;
      // BMP rows store bottom-up, so flip both sides for ImageIO coords
      for (y2 <- 0 until small.getHeight; x2 <- 0 until small.getWidth) {
        val srcY = big.getHeight - 1 - (small.getHeight - 1 - y2) * 2
        assert(small.getRGB(x2, y2) === big.getRGB(x2 * 2, srcY),
          s"doc $id pixel ($x2,$y2)")
      }
    }
  }

  test("media table end-to-end: every corpus doc decodes to its own dimensions") {
    val docs = Corpus.documents(spark, sf0001)
    val feats = Multimodal.extractFeatures(Multimodal.toMediaTable(docs))
    val expected = docs.select(col("doc_id"),
      (lit(4) + col("doc_id") % 16).cast("int").as("width"),
      (lit(3) + octet_length(col("text")) % 8).cast("int").as("height"))
    val joined = feats.join(expected, "doc_id")
      .filter(feats("width") =!= expected("width") || feats("height") =!= expected("height"))
    assert(joined.count() === 0, "decoded dimensions must match the per-doc derivation")
    assert(feats.count() === docs.count())
  }

  test("audio clips: every clip is a valid standalone WAV and the PCM concatenates losslessly") {
    val source = Multimodal.wavBytes(8000, 110, "clip me into pieces".getBytes("UTF-8"))
    val clips = Multimodal.clipAudio(
        Seq(MediaRow(7L, source, "wav")).toDF(), clipSamples = 25)
      .orderBy(col("clip_idx"))
      .select("clip_idx", "n_clips", "n_samples", "media")
      .as[(Int, Int, Long, Array[Byte])].collect()
    assert(clips.map(_._2).toSet === Set(5), "110 samples / 25 → 5 clips")
    assert(clips.map(_._3).toSeq === Seq(25L, 25L, 25L, 25L, 10L),
      "full clips then the 10-sample remainder")
    for ((ci, _, frames, bytes) <- clips) {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      assert(in.getFormat.getSampleRate === 8000f, s"clip $ci keeps the source rate")
      assert(in.getFormat.getSampleSizeInBits === 16)
      assert(in.getFrameLength === frames, s"clip $ci frame count per its own header")
    }
    // lossless: clip PCM bytes, in order, reassemble the source data chunk
    val reassembled = clips.flatMap(_._4.drop(44))
    assert(reassembled.toSeq === source.drop(44).toSeq,
      "concatenated clip payloads must equal the source PCM exactly")
    // guards: clip size must be positive; non-WAV payloads fail loudly
    intercept[IllegalArgumentException](
      Multimodal.clipAudio(Seq(MediaRow(1L, source, "wav")).toDF(), 0))
    val bad = Multimodal.clipAudio(
      Seq(MediaRow(2L, "not a wav".getBytes("UTF-8") ++ new Array[Byte](44), "wav")).toDF(), 25)
    val e = intercept[org.apache.spark.SparkException](bad.count())
    assert(e.getMessage != null)
  }

  test("audio clips: stereo sources keep their channel count; non-PCM fails loudly") {
    // hand-build a stereo 16-bit PCM WAV (blockAlign 4) — wavBytes is mono
    def wav(format: Short, channels: Short, frames: Int): Array[Byte] = {
      val blockAlign = channels * 2
      val dataSize = frames * blockAlign
      val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(format).putShort(channels)
        .putInt(8000).putInt(8000 * blockAlign)
        .putShort(blockAlign.toShort).putShort(16)
      buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
      (0 until dataSize).foreach(i => buf.put((i % 251).toByte))
      buf.array()
    }
    val clips = Multimodal.clipAudio(
        Seq(MediaRow(9L, wav(1, 2, 60), "wav")).toDF(), clipSamples = 25)
      .orderBy(col("clip_idx"))
      .select("n_samples", "media").as[(Long, Array[Byte])].collect()
    assert(clips.map(_._1).toSeq === Seq(25L, 25L, 10L))
    for ((frames, bytes) <- clips) {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      assert(in.getFormat.getChannels === 2, "clips must carry the SOURCE channel count")
      assert(in.getFrameLength === frames, "frame count under stereo blockAlign")
    }
    // non-PCM (e.g. IEEE float, format 3): slicing assumptions don't hold
    val nonPcm = Multimodal.clipAudio(Seq(MediaRow(10L, wav(3, 1, 60), "wav")).toDF(), 25)
    val e2 = intercept[org.apache.spark.SparkException](nonPcm.count())
    assert(e2.getMessage.contains("not PCM"), e2.getMessage)
  }

  // ---- perceptual-hash dedup (m06) ----

  private def imageCorpus(n: Int) =
    Multimodal.toImageCorpus((0L until n.toLong).toDF("doc_id"))

  test("dHash is invariant under the brightness shift and flips few bits under perturbation") {
    val bands = Multimodal.dhashBands(imageCorpus(25))
      .as[(Long, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    def hamming(a: (Int, Int, Int, Int), b: (Int, Int, Int, Int)): Int =
      Integer.bitCount(a._1 ^ b._1) + Integer.bitCount(a._2 ^ b._2) +
        Integer.bitCount(a._3 ^ b._3) + Integer.bitCount(a._4 ^ b._4)
    // every bright copy (base % 7 == 0) collides EXACTLY — a +10 shift
    // preserves every grayscale comparison
    for (base <- 0 until 25 if base % 7 == 0)
      assert(bands(base) === bands(1000000L + base), s"bright copy of $base")
    // every perturbed copy (base % 11 == 0) is near, not identical-ish far
    for (base <- 0 until 25 if base % 11 == 0) {
      val d = hamming(bands(base), bands(2000000L + base))
      assert(d <= 10, s"perturbed copy of $base drifted to hamming $d")
    }
    // unrelated images are far apart (pseudo-random bits ⇒ ~32)
    val d01 = hamming(bands(1L), bands(2L))
    assert(d01 > 10, s"unrelated images at hamming $d01 — bits not balanced")
  }

  test("imageStats: exact brightness shift on mean; variance/sharpness bit-invariant") {
    val stats = Multimodal.imageStats(imageCorpus(25))
      .as[(Long, Int, Int, Long, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    // dims and pixel count follow the generator arithmetic
    for ((id, r) <- stats; base = id % 1000000L) {
      assert(r._2 === (9 + base % 8).toInt && r._3 === (8 + base % 5).toInt)
      assert(r._4 === r._2.toLong * r._3)
      // gray ∈ [0, 627] ⇒ population variance is bounded by (range/2)²
      assert(r._7 >= 0.0 && r._7 < 99000.0, s"variance out of range: $r")
    }
    // a +10/byte shift moves mean by 30 (3 channels) and leaves variance
    // and gradient energy invariant — sharpness exactly (integer), the
    // two float columns to within division-rounding ulps
    for (base <- 0 until 25 if base % 7 == 0) {
      val (b, s) = (stats(base.toLong), stats(1000000L + base))
      assert(math.abs(s._6 - b._6 - 30.0) < 1e-9, s"mean shift for $base: ${s._6} vs ${b._6}")
      assert(math.abs(s._7 - b._7) < 1e-9, s"shift must not move variance")
      assert(s._8 === b._8, s"shift must not move sharpness")
    }
    // perturbed copies genuinely differ
    for (base <- 0 until 25 if base % 11 == 0)
      assert(stats(2000000L + base)._6 !== stats(base.toLong)._6)
    // junk bytes fail loudly, not silently
    val junk = Seq((9L, Array[Byte](1, 2, 3))).toDF("image_id", "media")
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.imageStats(junk).count())
    assert(e.getMessage.contains("not a BMP"), e.getMessage)
  }

  test("dHash respects top-down (negative height) row order") {
    val corpus = imageCorpus(1)
    val bottomUp = corpus.select("media").as[Array[Byte]].head()
    // rewrite the same image as a top-down BMP: negate the height field
    // and reverse the stored row blocks — identical IMAGE, different layout
    val buf = java.nio.ByteBuffer.wrap(bottomUp.clone())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val w = buf.getInt(18); val h = buf.getInt(22); val off = buf.getInt(10)
    val rowSize = (3 * w + 3) / 4 * 4
    buf.putInt(22, -h)
    val topDown = buf.array()
    for (r <- 0 until h)
      System.arraycopy(bottomUp, off + (h - 1 - r) * rowSize,
        topDown, off + r * rowSize, rowSize)
    val two = Seq((0L, bottomUp, "bmp"), (1L, topDown, "bmp"))
      .toDF("image_id", "media", "format")
    val hashes = Multimodal.dhashBands(two)
      .as[(Long, Int, Int, Int, Int)].collect().map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(hashes(0L) === hashes(1L), "row order must not change the hash")
  }

  test("audio fingerprint is invariant under volume doubling; generated corpus WAVs are valid") {
    val corpus = Multimodal.toAudioCorpus((0L until 15L).toDF("doc_id"))
    // every generated payload parses with the JDK's own audio reader
    for (bytes <- corpus.select("media").as[Array[Byte]].collect()) {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      assert(in.getFormat.getSampleSizeInBits === 16)
      assert(in.getFrameLength >= 520)
    }
    val fps = Multimodal.audioFingerprint(corpus)
      .as[(Long, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    def hamming(a: (Int, Int, Int, Int), b: (Int, Int, Int, Int)): Int =
      Integer.bitCount(a._1 ^ b._1) + Integer.bitCount(a._2 ^ b._2) +
        Integer.bitCount(a._3 ^ b._3) + Integer.bitCount(a._4 ^ b._4)
    // |2s| = 2|s| exactly: the volume copy collides at hamming 0
    for (base <- 0 until 15 if base % 7 == 0)
      assert(fps(base) === fps(1000000L + base), s"volume copy of $base")
    // the perturbed copy (3 samples, 3 windows) flips at most 5 bits
    for (base <- 0 until 15 if base % 11 == 0) {
      val d = hamming(fps(base), fps(2000000L + base))
      assert(d <= 5, s"perturbed copy of $base at hamming $d")
    }
    // unrelated clips are far (pseudo-random bits)
    assert(hamming(fps(1L), fps(2L)) > 10)
  }

  test("audioDedup finds the planted audio pairs and rejects a truncated data chunk") {
    val corpus = Multimodal.toAudioCorpus((0L until 12L).toDF("doc_id"))
    val ids = Multimodal.audioDedup(corpus, maxHamming = 10)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2)).toSet
    for (base <- Seq(0L, 7L)) assert(ids.contains((base, 1000000L + base)))
    for (base <- Seq(0L, 11L)) assert(ids.contains((base, 2000000L + base)))
    for ((a, b) <- ids) assert(a % 1000000L === b % 1000000L, s"accidental pair ($a, $b)")
    // a WAV with fewer than 520 samples must fail loudly, not hash garbage
    val shortWav = Multimodal.wavBytes(8000, 100, Array.fill(200)(1.toByte))
    val bad = Multimodal.audioFingerprint(
      Seq((99L, shortWav, "wav")).toDF("audio_id", "media", "format"))
    val e = intercept[org.apache.spark.SparkException](bad.count())
    assert(e.getMessage.contains("520"), e.getMessage)
  }

  test("video dedup: brightness re-encodes match on every frame, truncated copies on all but one") {
    val corpus = Multimodal.toVideoCorpus((0L until 25L).toDF("doc_id"))
    // every frame of every container is a valid BMP per ImageIO
    for (bytes <- corpus.select("media").as[Array[Byte]].collect()) {
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = buf.getInt(4)
      var off = 8
      for (_ <- 0 until n) {
        val size = buf.getInt(off + 2)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
          java.util.Arrays.copyOfRange(bytes, off, off + size)))
        assert(img != null, "frame did not parse as BMP")
        off += size
      }
      assert(off === bytes.length, "container walk must consume exactly all bytes")
    }
    val pairs = Multimodal.videoDedup(corpus, maxHamming = 10, minMatchedFrames = 2)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2) -> p._3).toMap
    // bright copies: matched = full frame count
    for (base <- 0 until 25 if base % 7 == 0)
      assert(pairs((base.toLong, 1000000L + base)) === (2 + base % 4),
        s"bright copy of $base")
    // trunc copies (planted only when frames > 2): matched = count - 1
    for (base <- 0 until 25 if base % 11 == 0 && (2 + base % 4) > 2)
      assert(pairs((base.toLong, 2000000L + base)) === (1 + base % 4),
        s"trunc copy of $base")
    // nothing unplanted
    for (((a, b), _) <- pairs)
      assert(a % 1000000L === b % 1000000L, s"accidental pair ($a, $b)")
  }

  test("perceptualDedup finds exactly the planted duplicate pairs, at any partitioning") {
    val corpus = imageCorpus(30)
    val pairs = Multimodal.perceptualDedup(corpus, maxHamming = 10)
      .as[(Long, Long, Int)].collect().sortBy(p => (p._1, p._2))
    // planted: bright for 0,7,14,21,28; perturb for 0,11,22; id 0 has both
    val ids = pairs.map(p => (p._1, p._2)).toSet
    for (base <- Seq(0L, 7L, 14L, 21L, 28L))
      assert(ids.contains((base, 1000000L + base)), s"missing bright pair for $base")
    for (base <- Seq(0L, 11L, 22L))
      assert(ids.contains((base, 2000000L + base)), s"missing perturb pair for $base")
    assert(ids.contains((1000000L, 2000000L)), "bright×perturb of base 0")
    // nothing unplanted: every pair shares its base id
    for ((a, b) <- ids)
      assert(a % 1000000L === b % 1000000L, s"accidental pair ($a, $b)")
    // bright pairs verify at hamming 0
    assert(pairs.filter(p => p._2 === p._1 + 1000000L).forall(_._3 === 0))
    // partitioning cannot change the pair set
    val again = Multimodal.perceptualDedup(corpus.repartition(7), maxHamming = 10)
      .as[(Long, Long, Int)].collect().sortBy(p => (p._1, p._2))
    assert(again === pairs)
  }

  test("bandNearDups auto-picks the band scheme at the 32768-row crossover") {
    // planted near-pair at Hamming 6: band b0 untouched (narrow catches
    // it through the b0 bucket), but BOTH wide 32-bit bands touched
    // (b1 and b3 each differ), so the wide scheme misses it — the m13
    // recall gap in one pair. All filler rows carry globally unique
    // band values, so they can never collide with anything.
    def corpus(n: Int) = {
      val filler = (10 until n).map(i => (i.toLong, 4 * i, 4 * i + 1, 4 * i + 2, 4 * i + 3))
      val planted = Seq(
        (1L, 7, 11, 13, 17),
        (2L, 7, 11 ^ 0x07, 13, 17 ^ 0x38)) // 3 bits in b1, 3 in b3
      (planted ++ filler).toDF("image_id", "b0", "b1", "b2", "b3")
    }
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val small = corpus(1000)   // below the crossover -> narrow
    val big = corpus(40000)    // above the crossover -> wide
    // explicit overrides stay available either way
    assert(pairs(Multimodal.bandNearDups(small, 10, Some(false))) === Set((1L, 2L)))
    assert(pairs(Multimodal.bandNearDups(small, 10, Some(true))) === Set.empty[(Long, Long)])
    // auto: small corpus picks narrow (higher recall, candidates linear)
    assert(pairs(Multimodal.bandNearDups(small, 10)) === Set((1L, 2L)),
      "below 32768 rows the auto scheme must be narrow")
    // auto: large corpus picks wide (the 100x candidate-blowup fix) —
    // observable precisely as the near-threshold pair dropping out
    assert(pairs(Multimodal.bandNearDups(big, 10)) === Set.empty[(Long, Long)],
      "above 32768 rows the auto scheme must be wide")
  }

  test("shotBoundaries recovers exactly the planted cuts and nothing else") {
    val vids = Multimodal.toShotVideoCorpus((0L until 24L).toDF("doc_id"))
    val got = Multimodal.shotBoundaries(vids, threshold = 40.0)
      .select(col("video_id"), col("frame_idx"), col("delta"))
      .as[(Long, Int, Double)].collect()
    // planted truth: a cut exactly where a new shot starts
    val planted = (0L until 24L).flatMap { id =>
      val fps = (2 + id % 2).toInt
      val nf = (2 + id % 3).toInt * fps
      (1 until nf).filter(_ % fps == 0).map(f => (id, f))
    }.toSet
    assert(got.map(b => (b._1, b._2)).toSet === planted)
    // cut deltas dwarf the threshold (>= 3 channels x 81-level jump
    // minus jitter); within-shot deltas never fire at 40
    assert(got.forall(_._3 > 200.0), s"weak cut: ${got.minBy(_._3)}")
    // an absurd threshold finds nothing; a sub-jitter threshold fires
    // on within-shot frames too (the detector measures, not memorizes)
    assert(Multimodal.shotBoundaries(vids, threshold = 1e6).isEmpty)
    val loose = Multimodal.shotBoundaries(vids, threshold = 1e-9)
      .count()
    assert(loose > got.length, "jitter must be visible below the noise floor")
    // partitioning invariance
    val again = Multimodal.shotBoundaries(vids.repartition(5), threshold = 40.0)
      .select(col("video_id"), col("frame_idx"), col("delta"))
      .as[(Long, Int, Double)].collect()
    assert(again.sortBy(b => (b._1, b._2)).toSeq === got.sortBy(b => (b._1, b._2)).toSeq)
  }

  test("shotKeyframes picks the max-gradient frame of each planted shot") {
    val vids = Multimodal.toShotVideoCorpus((0L until 15L).toDF("doc_id"))
    val got = Multimodal.shotKeyframes(vids, threshold = 40.0)
      .as[(Long, Int, Int, Int, Int, Int, Long)].collect()
      .sortBy(k => (k._1, k._2))
    // shot structure identical to the planted one (and to m10's cuts)
    for (id <- 0L until 15L) {
      val shots = got.filter(_._1 == id)
      val fps = (2 + id % 2).toInt
      assert(shots.length === (2 + id % 3).toInt, s"video $id shot count")
      shots.foreach { s =>
        assert(s._3 % fps === 0 && s._5 === fps, s"video $id frame-aligned shot: $s")
        assert(s._6 >= s._3 && s._6 <= s._4)
      }
    }
    // independent recomputation: per-frame sharpness via the imageStats
    // decoder over the exploded frames must agree with the selection
    val frameStats = Multimodal.imageStats(
        Multimodal.videoFrameMedia(vids.select(col("video_id"), col("media"))))
      .select(col("image_id"), col("sharpness"))
      .as[(Long, Long)].collect()
      .map { case (cid, g) => (cid / 16, (cid % 16).toInt) -> g }.toMap
    got.foreach { s =>
      val inShot = (s._3 to s._4).map(f => f -> frameStats((s._1, f)))
      val best = inShot.maxBy { case (f, g) => (g, -f) }
      assert(best._1 === s._6 && best._2 === s._7,
        s"video ${s._1} shot ${s._2}: expected $best, got (${s._6}, ${s._7})")
    }
  }

  test("vadSegments recovers exactly the planted speech bursts") {
    val aud = Multimodal.toSpeechAudioCorpus((0L until 20L).toDF("doc_id"))
    val segs = Multimodal.vadSegments(aud, frameSamples = 40, silenceMeanAbs = 500)
      .as[(Long, Int, Int, Int, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for (id <- 0L until 20L) {
      val got = segs(id)
      assert(got.length === (2 + id % 3).toInt, s"audio $id segment count")
      // segments are separated by >= 2 silent frames (gap >= 80 samples)
      // and the first starts after the 2-frame leading silence
      assert(got.head._3 === 2, s"audio $id first segment after lead-in")
      got.sliding(2).foreach {
        case Array(a, b) => assert(b._3 - a._4 >= 3, s"audio $id gap")
        case _ =>
      }
      // frame bounds consistent and speech energy well above threshold
      got.foreach { s =>
        assert(s._5 === s._4 - s._3 + 1)
        assert(s._6 / s._5 > 40L * 2000, s"audio $id segment energy: $s")
      }
    }
    // a sky-high threshold silences everything; a zero-floor one merges
    // the whole signal into a single segment per audio
    assert(Multimodal.vadSegments(aud, 40, 1000000).isEmpty)
    val merged = Multimodal.vadSegments(aud, 40, 1)
      .groupBy(col("audio_id")).count().as[(Long, Long)].collect()
    assert(merged.forall(_._2 === 1L), "noise floor is nonzero everywhere")
    // partitioning invariance
    val again = Multimodal.vadSegments(aud.repartition(7), 40, 500)
      .as[(Long, Int, Int, Int, Int, Long)].collect()
      .sortBy(s => (s._1, s._2)).toSeq
    assert(again === segs.values.flatten.toSeq.sortBy(s => (s._1, s._2)))
  }

  test("perturbed video corpus lands pairs at near-threshold Hamming; wide bands never beat narrow") {
    val corpus = Multimodal.toPerturbedVideoCorpus((0L until 40L).toDF("doc_id"))
    val fps = Multimodal.dhashBands(Multimodal.videoFrameMedia(corpus))
      .as[(Long, Int, Int, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val pairs = fps.keys.filter(_ < 16000000L).toSeq.sorted.map { fid =>
      val (a0, a1, a2, a3) = fps(fid)
      val (c0, c1, c2, c3) = fps(fid + 16000000L)
      val hamming = Integer.bitCount(a0 ^ c0) + Integer.bitCount(a1 ^ c1) +
        Integer.bitCount(a2 ^ c2) + Integer.bitCount(a3 ^ c3)
      val narrow = a0 == c0 || a1 == c1 || a2 == c2 || a3 == c3
      val wide = (a0.toLong * 65536L + a1) == (c0.toLong * 65536L + c1) ||
        (a2.toLong * 65536L + a3) == (c2.toLong * 65536L + c3)
      (hamming, narrow, wide)
    }
    // every base frame has its perturbed sibling, and the perturbation
    // really moves hashes: the distribution must reach past Hamming 4
    assert(pairs.nonEmpty && pairs.exists(_._1 >= 5),
      s"perturbation too weak: max hamming ${pairs.map(_._1).max}")
    assert(pairs.exists(_._1 >= 1), "at least some pairs must differ")
    // wide-band hit implies narrow-band hit (a 32-bit band equal needs
    // both 16-bit halves equal) — the invariant behind recall_wide <=
    // recall_narrow in every m13 bucket
    pairs.foreach { case (h, narrow, wide) =>
      assert(!wide || narrow, s"wide hit without narrow hit at hamming $h")
    }
    // hamming 0 pairs are caught by both schemes
    pairs.filter(_._1 == 0).foreach { case (_, narrow, wide) =>
      assert(narrow && wide)
    }
  }
}
