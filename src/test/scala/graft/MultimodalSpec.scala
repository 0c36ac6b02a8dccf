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
}
