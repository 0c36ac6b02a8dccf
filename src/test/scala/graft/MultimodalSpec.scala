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
}
