package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted partition-wise.
  *
  * The pipeline shape is the production one — binary blobs + metadata
  * travel in columns, the decode runs inside `mapPartitions` so payloads
  * stay executor-local and never shuffle, and the downstream feature
  * table is columnar/compact. The codec itself is a REAL pure-JVM BMP
  * header parser ([[decodeBmp]]): [[toMediaTable]] emits genuine
  * BITMAPFILEHEADER/BITMAPINFOHEADER payloads (dimensions derived
  * deterministically from each document, pixels from its text bytes) and
  * the decoder reads the dimensions back out of the bytes — so the m01
  * oracle verifies an actual decode, not an echo. Formats without a
  * built-in parser fall through to [[decodeOpaque]], which derives
  * deterministic pseudo-features from the payload length (the slot where
  * a jpeg/png/audio library would plug in; none ship in this
  * environment).
  *
  * At 100 TB the mapPartitions boundary is the right interface: decode
  * batches stay executor-local, binary blobs never shuffle, and a real
  * image/audio codec changes only the per-row function.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], format: String)
  final case class MediaFeatures(
      doc_id: Long, format: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int)

  /** Builds a media table from documents: each doc becomes a small but
    * VALID 24-bit BMP whose dimensions derive from the doc (width from
    * doc_id, height from the text's UTF-8 byte length) and whose pixel
    * bytes cycle through the text — a deterministic stand-in for a real
    * image payload that still exercises a real decoder. */
  def toMediaTable(docs: DataFrame): DataFrame = {
    val ds = docs.select(col("doc_id"), col("text"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
    ds.map { case (id, text) =>
      val bytes = Option(text).map(_.getBytes(StandardCharsets.UTF_8)).getOrElse(Array.empty[Byte])
      val width = (4 + id % 16).toInt
      val height = 3 + bytes.length % 8
      MediaRow(id, bmpBytes(width, height, bytes), "bmp")
    }(Encoders.product[MediaRow]).toDF()
  }

  /** A minimal valid 24bpp BMP: 14-byte file header, 40-byte info
    * header, rows padded to 4 bytes, pixels cycled from `fill`. */
  private[graft] def bmpBytes(width: Int, height: Int, fill: Array[Byte]): Array[Byte] = {
    val rowSize = (3 * width + 3) / 4 * 4
    val imageSize = rowSize * height
    val fileSize = 54 + imageSize
    val buf = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel-data offset
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24) // color planes, bits per pixel
      .putInt(0).putInt(imageSize) // no compression
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, default palette
    var i = 0
    while (i < imageSize) {
      buf.put(if (fill.isEmpty) 0.toByte else fill(i % fill.length))
      i += 1
    }
    buf.array()
  }

  /** Real decode: validates the BM magic and reads width/height/bpp out
    * of the BITMAPINFOHEADER. Height is abs()'d — negative encodes
    * top-down row order, the magnitude is still the pixel height. */
  private[graft] def decodeBmp(m: MediaRow): MediaFeatures = {
    val buf = ByteBuffer.wrap(m.media).order(ByteOrder.LITTLE_ENDIAN)
    require(m.media.length >= 54 && buf.get(0) == 'B'.toByte && buf.get(1) == 'M'.toByte,
      s"doc ${m.doc_id}: not a BMP payload")
    MediaFeatures(
      doc_id = m.doc_id,
      format = m.format,
      n_bytes = m.media.length.toLong,
      width = buf.getInt(18),
      height = math.abs(buf.getInt(22)),
      n_frames = 1)
  }

  /** Builds an audio table from documents: each doc becomes a valid
    * 16-bit mono PCM WAV whose sample count derives from the text length
    * and whose samples cycle through the text bytes — the audio-modality
    * counterpart of [[toMediaTable]]. */
  def toAudioTable(docs: DataFrame, sampleRate: Int = 8000): DataFrame = {
    val ds = docs.select(col("doc_id"), col("text"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
    ds.map { case (id, text) =>
      val bytes = Option(text).map(_.getBytes(StandardCharsets.UTF_8)).getOrElse(Array.empty[Byte])
      MediaRow(id, wavBytes(sampleRate, 32 + bytes.length % 256, bytes), "wav")
    }(Encoders.product[MediaRow]).toDF()
  }

  /** A minimal valid RIFF/WAVE: PCM fmt chunk (mono, 16-bit) + data
    * chunk with `numSamples` frames cycled from `fill`. */
  private[graft] def wavBytes(sampleRate: Int, numSamples: Int, fill: Array[Byte]): Array[Byte] = {
    val dataSize = numSamples * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataSize)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate = rate × block align
      .putShort(2).putShort(16) // block align, bits per sample
    buf.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataSize)
    var i = 0
    while (i < dataSize) {
      buf.put(if (fill.isEmpty) 0.toByte else fill(i % fill.length))
      i += 1
    }
    buf.array()
  }

  /** Real decode: validates RIFF/WAVE magic, walks the chunk list to the
    * fmt and data chunks. Features: width = sample rate, height = bits
    * per sample, n_frames = frame count (data bytes / block align) — the
    * audio meaning of a frame. */
  private[graft] def decodeWav(m: MediaRow): MediaFeatures = {
    val buf = ByteBuffer.wrap(m.media).order(ByteOrder.LITTLE_ENDIAN)
    require(m.media.length >= 44 &&
      buf.getInt(0) == 0x46464952 && buf.getInt(8) == 0x45564157, // "RIFF", "WAVE"
      s"doc ${m.doc_id}: not a WAV payload")
    var pos = 12
    var sampleRate = 0; var bits = 0; var blockAlign = 0; var dataSize = -1
    while (pos + 8 <= m.media.length && (sampleRate == 0 || dataSize < 0)) {
      val id = buf.getInt(pos); val size = buf.getInt(pos + 4)
      require(size >= 0, s"doc ${m.doc_id}: corrupt WAV chunk size $size")
      if (id == 0x20746d66) { // "fmt "
        sampleRate = buf.getInt(pos + 12)
        blockAlign = buf.getShort(pos + 20).toInt
        bits = buf.getShort(pos + 22).toInt
      } else if (id == 0x61746164) dataSize = size // "data"
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && dataSize >= 0 && blockAlign > 0,
      s"doc ${m.doc_id}: WAV missing fmt/data chunks")
    MediaFeatures(m.doc_id, m.format, m.media.length.toLong,
      width = sampleRate, height = bits, n_frames = dataSize / blockAlign)
  }

  /** Fallback for formats with no built-in parser: deterministic
    * pseudo-metadata from the payload length. This is the honest stub
    * slot where an external codec library would plug in. */
  private[graft] def decodeOpaque(m: MediaRow): MediaFeatures = {
    val n = m.media.length.toLong
    MediaFeatures(m.doc_id, m.format, n,
      width = (64 + n % 512).toInt,
      height = (64 + (n * 7) % 512).toInt,
      n_frames = (1 + n % 16).toInt)
  }

  private def decode(m: MediaRow): MediaFeatures =
    m.format match {
      case "bmp" => decodeBmp(m)
      case "wav" => decodeWav(m)
      case _ => decodeOpaque(m)
    }

  /** Partition-wise decode: binary in, typed features out. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val ds: Dataset[MediaRow] = media.as(Encoders.product[MediaRow])
    ds.mapPartitions(_.map(decode))(Encoders.product[MediaFeatures]).toDF()
  }

  /** Nearest-neighbor BMP downscale by an integer factor — the RESIZE op
    * of the multimodal mandate, as a partition-wise binary→binary
    * transform: real pixel resampling in pure JVM, blobs stay
    * executor-local, and a libjpeg-style codec would slot into the same
    * per-row function. Output dimensions are ceil(w/f) × ceil(h/f);
    * output pixel (x, y) copies source pixel (x·f, y·f) — verified
    * against ImageIO's view of both payloads in MultimodalSpec. */
  def resizeMedia(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val ds: Dataset[MediaRow] = media.as(Encoders.product[MediaRow])
    ds.map { m =>
      val buf = ByteBuffer.wrap(m.media).order(ByteOrder.LITTLE_ENDIAN)
      require(m.media.length >= 54 && buf.get(0) == 'B'.toByte && buf.get(1) == 'M'.toByte,
        s"doc ${m.doc_id}: resize expects a BMP payload")
      // the row-stride arithmetic below is 24bpp-uncompressed-specific: a
      // 32bpp or RLE-compressed BMP would resize into silently corrupted
      // pixels instead of erroring
      require(buf.getShort(28) == 24 && buf.getInt(30) == 0,
        s"doc ${m.doc_id}: resize supports uncompressed 24bpp BMP only " +
          s"(got ${buf.getShort(28)}bpp, compression ${buf.getInt(30)})")
      val w = buf.getInt(18)
      val rawH = buf.getInt(22) // negative = top-down row order
      val h = math.abs(rawH)
      val pixelOff = buf.getInt(10)
      val srcRow = (3 * w + 3) / 4 * 4
      require(m.media.length >= pixelOff + srcRow.toLong * h,
        s"doc ${m.doc_id}: BMP header claims ${srcRow.toLong * h} pixel bytes " +
          s"at offset $pixelOff but payload has ${m.media.length}")
      val w2 = (w + factor - 1) / factor; val h2 = (h + factor - 1) / factor
      val dstRow = (3 * w2 + 3) / 4 * 4
      val out = ByteBuffer.allocate(54 + dstRow * h2).order(ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(54 + dstRow * h2)
        .putShort(0).putShort(0).putInt(54)
      // rows copy in STORED order, so the output must keep the source's
      // row direction — flipping the sign would mirror the image
      out.putInt(40).putInt(w2).putInt(if (rawH < 0) -h2 else h2).putShort(1).putShort(24)
        .putInt(0).putInt(dstRow * h2).putInt(2835).putInt(2835).putInt(0).putInt(0)
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) {
          val src = pixelOff + (y * factor) * srcRow + (x * factor) * 3
          val dst = 54 + y * dstRow + x * 3
          out.put(dst, m.media(src)); out.put(dst + 1, m.media(src + 1))
          out.put(dst + 2, m.media(src + 2))
          x += 1
        }
        y += 1
      }
      MediaRow(m.doc_id, out.array(), m.format)
    }(Encoders.product[MediaRow]).toDF()
  }

  final case class FrameRow(doc_id: Long, n_frames: Int, frame_idx: Int,
      frame_offset: Long, frame_size: Long, width: Int, height: Int)

  /** Builds a "video" table: each doc becomes a deterministic multi-frame
    * container — an 8-byte header (magic `GVID` + LE frame count)
    * followed by `2 + doc_id % 4` concatenated BMP frames. Frames share
    * the doc's dimensions; frame f's pixels cycle the text bytes rotated
    * by f, so frames genuinely differ. A stand-in for a real video file
    * with the structural property that matters: opaque bytes a decoder
    * must WALK frame by frame, not index. */
  def toVideoTable(docs: DataFrame): DataFrame = {
    val ds = docs.select(col("doc_id"), col("text"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
    ds.map { case (id, text) =>
      val bytes = Option(text).map(_.getBytes(StandardCharsets.UTF_8)).getOrElse(Array.empty[Byte])
      val width = (4 + id % 16).toInt
      val height = 3 + bytes.length % 8
      val nFrames = (2 + id % 4).toInt
      val frames = (0 until nFrames).map { f =>
        val r = if (bytes.isEmpty) 0 else f % bytes.length
        bmpBytes(width, height, bytes.drop(r) ++ bytes.take(r))
      }
      val buf = ByteBuffer.allocate(8 + frames.map(_.length).sum).order(ByteOrder.LITTLE_ENDIAN)
      buf.put('G'.toByte).put('V'.toByte).put('I'.toByte).put('D'.toByte).putInt(nFrames)
      frames.foreach(buf.put)
      MediaRow(id, buf.array(), "gvid")
    }(Encoders.product[MediaRow]).toDF()
  }

  final case class ClipRow(doc_id: Long, clip_idx: Int, n_clips: Int,
      n_samples: Long, n_bytes: Long, media: Array[Byte], format: String)

  /** Audio clip windowing — the audio-modality pipeline op (the analog of
    * [[sampleFrames]] for video): each WAV slices into consecutive
    * `clipSamples`-frame clips, and every clip is re-wrapped as a
    * standalone VALID RIFF/WAVE (fresh 44-byte header carrying the
    * source's sample rate/block align/bit depth + the sliced PCM bytes),
    * so downstream feature extraction treats clips exactly like source
    * files — the chunk-long-audio-into-model-windows step of a speech
    * training pipeline. The final clip keeps the remainder (shorter).
    * `mapPartitions`: blobs stay executor-local, never shuffle. */
  def clipAudio(audio: DataFrame, clipSamples: Int): DataFrame = {
    require(clipSamples > 0, s"clipSamples must be positive, got $clipSamples")
    val ds: Dataset[MediaRow] = audio.as(Encoders.product[MediaRow])
    ds.mapPartitions(_.flatMap { m =>
      val buf = ByteBuffer.wrap(m.media).order(ByteOrder.LITTLE_ENDIAN)
      require(m.media.length >= 44 &&
        buf.getInt(0) == 0x46464952 && buf.getInt(8) == 0x45564157, // "RIFF", "WAVE"
        s"doc ${m.doc_id}: not a WAV payload")
      var pos = 12
      var sampleRate = 0; var bits = 0; var blockAlign = 0
      var audioFormat = 0; var channels = 0
      var dataPos = -1; var dataSize = -1
      while (pos + 8 <= m.media.length && (sampleRate == 0 || dataPos < 0)) {
        val id = buf.getInt(pos); val size = buf.getInt(pos + 4)
        require(size >= 0, s"doc ${m.doc_id}: corrupt WAV chunk size $size")
        if (id == 0x20746d66) { // "fmt "
          audioFormat = buf.getShort(pos + 8).toInt
          channels = buf.getShort(pos + 10).toInt
          sampleRate = buf.getInt(pos + 12)
          blockAlign = buf.getShort(pos + 20).toInt
          bits = buf.getShort(pos + 22).toInt
        } else if (id == 0x61746164) { dataPos = pos + 8; dataSize = size } // "data"
        pos += 8 + size + (size & 1)
      }
      require(sampleRate > 0 && dataPos >= 0 && blockAlign > 0 &&
        dataPos + dataSize <= m.media.length,
        s"doc ${m.doc_id}: WAV missing or truncated fmt/data chunks")
      // re-wrapping slices assumes fixed-size PCM frames; a compressed
      // format would make frame = blockAlign false and the clip headers
      // lies. Copy the SOURCE's channel count (a stereo input re-labeled
      // mono would carry a self-inconsistent channels/blockAlign pair).
      require(audioFormat == 1, s"doc ${m.doc_id}: WAV audioFormat " +
        s"$audioFormat is not PCM — clips can only slice uncompressed frames")
      require(channels > 0 && blockAlign == channels * ((bits + 7) / 8),
        s"doc ${m.doc_id}: inconsistent fmt chunk (channels=$channels, " +
          s"bits=$bits, blockAlign=$blockAlign)")
      val nFrames = dataSize / blockAlign
      val nClips = (nFrames + clipSamples - 1) / clipSamples
      (0 until nClips).iterator.map { c =>
        val startFrame = c * clipSamples
        val frames = math.min(clipSamples, nFrames - startFrame)
        val dsz = frames * blockAlign
        val out = ByteBuffer.allocate(44 + dsz).order(ByteOrder.LITTLE_ENDIAN)
        out.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dsz)
          .put("WAVE".getBytes(StandardCharsets.US_ASCII))
        out.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
          .putShort(1).putShort(channels.toShort) // PCM, source channel count
          .putInt(sampleRate).putInt(sampleRate * blockAlign)
          .putShort(blockAlign.toShort).putShort(bits.toShort)
        out.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dsz)
          .put(m.media, dataPos + startFrame * blockAlign, dsz)
        ClipRow(m.doc_id, c, nClips, frames.toLong, (44L + dsz),
          out.array(), "wav")
      }
    })(Encoders.product[ClipRow]).toDF()
  }

  final case class ImageRow(image_id: Long, base_id: Long, variant: String,
      media: Array[Byte], format: String)

  /** Deterministic image corpus with PLANTED near-duplicates — the
    * fixture for perceptual-hash dedup (m06): every doc becomes a base
    * BMP whose pixel bytes derive from the portable fold (pseudo-random,
    * so dHash bits are balanced and band buckets stay small); docs with
    * `doc_id % 7 == 0` also get a BRIGHTNESS-SHIFTED copy (+10 on every
    * byte — order-preserving, so a correct dHash is IDENTICAL: the
    * invariance a perceptual hash exists to provide) and docs with
    * `doc_id % 11 == 0` a PERTURBED copy (every 97th byte rewritten —
    * a few sampled cells change, so the dHash lands within a small
    * Hamming distance, the LAION-style near-dup case). Base bytes stay
    * < 200 so the +10 shift never clamps. All arithmetic is replayed by
    * the m06 oracle, the m01 prediction discipline.
    *
    * Pixel bytes come from a DOUBLE Knuth remix of the portable fold —
    * the HLL lesson verbatim: one fold (or one multiply) of consecutive
    * offsets is low-discrepancy, which here made grayscale rows
    * MONOTONE and collapsed whole dHash bands to 0xFFFF (65 of ~660
    * images shared an all-ones band when first measured); the
    * digit-decomposition between the two mixes restores random bit
    * statistics while staying SQL-replayable. */
  def toImageCorpus(docs: DataFrame): DataFrame = {
    val ids = docs.select(col("doc_id")).as(Encoders.scalaLong)
    ids.flatMap { base =>
      val w = (9 + base % 8).toInt
      val h = (8 + base % 5).toInt
      val rowSize = (3 * w + 3) / 4 * 4
      val n = rowSize * h
      def baseByte(i: Int): Int =
        (doubleMix("img:", s"img:$base:$i") % 200L).toInt
      val fill = Array.tabulate(n)(i => baseByte(i).toByte)
      val out = Seq.newBuilder[ImageRow]
      out += ImageRow(base, base, "base", bmpBytes(w, h, fill), "bmp")
      if (base % 7 == 0)
        out += ImageRow(1000000L + base, base, "bright",
          bmpBytes(w, h, fill.map(b => ((b & 0xff) + 10).toByte)), "bmp")
      if (base % 11 == 0)
        out += ImageRow(2000000L + base, base, "perturb",
          bmpBytes(w, h, Array.tabulate(n)(i =>
            (if (i % 97 == 0) (baseByte(i) + 100) % 200 else baseByte(i)).toByte)), "bmp")
      out.result()
    }(Encoders.product[ImageRow]).toDF()
  }

  final case class DhashRow(image_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** dHash (difference hash — the standard perceptual image fingerprint:
    * 9×8 nearest-neighbor grayscale grid, each bit = "is the right
    * neighbor brighter") over a REAL decode of the BMP bytes, emitted as
    * FOUR 16-bit bands (two grid rows each) rather than one packed
    * 64-bit word: the bands are simultaneously the LSH blocking keys for
    * [[perceptualDedup]] and sidestep signed-overflow asymmetries in the
    * SQL mirror. Brightness/contrast shifts preserve every comparison,
    * so true re-encodes collide exactly; small edits flip only the bits
    * whose sampled cells they touch. `mapPartitions`: blobs stay
    * executor-local, only 4 ints per image leave the scan. */
  def dhashBands(images: DataFrame): DataFrame = {
    val ds = images.select(col("image_id"), col("media"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions(_.map { case (id, media) =>
      val buf = ByteBuffer.wrap(media).order(ByteOrder.LITTLE_ENDIAN)
      require(media.length >= 54 && buf.get(0) == 'B'.toByte && buf.get(1) == 'M'.toByte,
        s"image $id: not a BMP payload")
      require(buf.getShort(28) == 24 && buf.getInt(30) == 0,
        s"image $id: dHash supports uncompressed 24bpp BMP only " +
          s"(got ${buf.getShort(28)}bpp, compression ${buf.getInt(30)})")
      val w = buf.getInt(18)
      val rawH = buf.getInt(22) // negative = top-down row order
      val h = math.abs(rawH)
      val pixelOff = buf.getInt(10)
      val rowSize = (3 * w + 3) / 4 * 4
      require(media.length >= pixelOff + rowSize.toLong * h,
        s"image $id: BMP header claims ${rowSize.toLong * h} pixel bytes " +
          s"at offset $pixelOff but payload has ${media.length}")
      // gray(gy)(gx): 9×8 grid, gy from the TOP of the image — stored
      // bottom-up unless the height is negative
      val gray = Array.ofDim[Int](8, 9)
      var gy = 0
      while (gy < 8) {
        val sy = gy * h / 8
        val srcRow = if (rawH < 0) sy else h - 1 - sy
        var gx = 0
        while (gx < 9) {
          val sx = gx * w / 9
          val o = pixelOff + srcRow * rowSize + 3 * sx
          gray(gy)(gx) = (media(o) & 0xff) + (media(o + 1) & 0xff) + (media(o + 2) & 0xff)
          gx += 1
        }
        gy += 1
      }
      val bands = new Array[Int](4)
      gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          if (gray(gy)(gx + 1) > gray(gy)(gx))
            bands(gy / 2) |= 1 << ((gy % 2) * 8 + gx)
          gx += 1
        }
        gy += 1
      }
      DhashRow(id, bands(0), bands(1), bands(2), bands(3))
    })(Encoders.product[DhashRow]).toDF()
  }

  /** Perceptual-hash image near-dup pairs — the multimodal counterpart
    * of the text family's SimHash dedup, via the same band-blocking
    * discipline (`operators/Dedup.scala`): images sharing ANY of the 4
    * dHash bands become candidates through an equi-join on
    * (band_idx, band_val) — never an all-pairs compare — then the exact
    * 64-bit Hamming distance verifies each candidate. A 16-bit band
    * match is the standard LSH bet: true near-dups (few flipped bits)
    * almost surely leave one band untouched, while unrelated images
    * (~32 differing bits) rarely collide. Bucket sizes are bounded by
    * duplicate-cluster sizes at any corpus scale. Output: (id_a, id_b,
    * hamming), id_a < id_b. */
  def perceptualDedup(images: DataFrame, maxHamming: Int): DataFrame =
    bandNearDups(dhashBands(images), maxHamming)

  /** The modality-agnostic half of perceptual dedup: takes any
    * (id, b0, b1, b2, b3) fingerprint frame — dHash bands for images
    * ([[dhashBands]]), energy-delta bands for audio
    * ([[audioFingerprint]]) — and returns verified near-dup pairs via
    * the band equi-join + exact 64-bit Hamming verify.
    *
    * Band width is an LSH parameter that must SCALE with corpus size:
    * b-bit bands keep expected random candidates at
    * `(#bands)·n²/2^(b+1)`, so b must stay ≥ ~2·log2(n). The 100×
    * measurement caught exactly this — 1.75M video frames over 16-bit
    * bands produced ~93M random candidates and a super-linear slope —
    * hence wide bands: concatenate the four 16-bit bands into two
    * 32-bit bands. The recall bet narrows with width — m13 measured it
    * as gated data: at near-threshold frame Hamming 3–10, narrow reads
    * recall 1.0→0.31 per bucket where wide reads 0.38→0.02 (Hamming-0
    * invariance classes — re-encodes, volume/brightness shifts,
    * byte-identical frames — are caught by ANY scheme).
    *
    * So the choice is a measured function of n, not a fixed flag:
    * `wideBands = None` (the default) picks the scheme from the
    * fingerprint count against the candidate-blowup bound — narrow
    * keeps expected random candidates ≤ n (linear) while
    * 4·n²/2^17 ≤ n ⇔ n ≤ 2^15 = 32768, the crossover; past it the
    * narrow shuffle grows quadratically (the 93M-candidate slope) and
    * wide takes over (linear to n ≈ 2^32). Below the crossover narrow
    * is strictly better — every wide candidate is also a narrow
    * candidate, and m13's table is the recall gap. Callers with
    * external knowledge (planted Hamming-0-only corpora, recall SLAs)
    * can override with `Some(...)`. */
  private[graft] val NarrowBandMaxRows = 32768L

  private[graft] def bandNearDups(fingerprints: DataFrame, maxHamming: Int,
      wideBands: Option[Boolean] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64,
      s"maxHamming must be in [0, 64], got $maxHamming")
    // tiny frame (4 ints/row): materialize once so the candidate
    // self-join and both verify sides reuse ONE decode pass of the blobs
    val idCol = fingerprints.columns.head
    val bands = fingerprints
      .select(col(idCol).as("_id"), col("b0"), col("b1"), col("b2"), col("b3"))
      .localCheckpoint()
    // the count rides the already-materialized checkpoint — no extra
    // pass over the blobs, one cheap job over 4-int rows
    val wide = wideBands.getOrElse(bands.count() > NarrowBandMaxRows)
    val bandCols =
      if (wide) Seq(
        col("b0").cast("long") * 65536L + col("b1"),
        col("b2").cast("long") * 65536L + col("b3"))
      else Seq(col("b0"), col("b1"), col("b2"), col("b3"))
    val exploded = bands.select(col("_id"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
    val cand = exploded.as("a").join(exploded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .distinct()
    cand
      .join(bands.toDF("id_a", "a0", "a1", "a2", "a3"), "id_a")
      .join(bands.toDF("id_b", "c0", "c1", "c2", "c3"), "id_b")
      .withColumn("hamming", expr(
        "bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + bit_count(a2 ^ c2) + bit_count(a3 ^ c3)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  final case class AudioRow(audio_id: Long, base_id: Long, variant: String,
      media: Array[Byte], format: String)

  /** Deterministic audio corpus with planted near-duplicates — the
    * audio sibling of [[toImageCorpus]]: every doc becomes a mono
    * 16-bit PCM WAV whose samples derive from the double-remixed
    * portable fold (range ±10000, so the ×2 volume variant never
    * clips); docs with `doc_id % 7 == 0` also get a VOLUME-DOUBLED copy
    * (|2s| = 2|s| exactly in integers, so every window-energy
    * comparison is preserved and a correct fingerprint is IDENTICAL —
    * the invariance an audio fingerprint exists for) and docs with
    * `doc_id % 11 == 0` a PERTURBED copy (samples 0/251/502 rewritten —
    * three windows shift, ≤ 5 comparison bits flip). */
  def toAudioCorpus(docs: DataFrame, sampleRate: Int = 8000): DataFrame = {
    val ids = docs.select(col("doc_id")).as(Encoders.scalaLong)
    ids.flatMap { base =>
      val n = (520 + base % 128).toInt
      def sampleAt(salt: String, i: Int): Int =
        (doubleMix(salt + ":", s"$salt:$base:$i") % 20000L).toInt - 10000
      def wav(f: Int => Int): Array[Byte] = {
        val bytes = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = f(i)
          bytes(2 * i) = (s & 0xff).toByte
          bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        wavBytes(sampleRate, n, bytes)
      }
      val out = Seq.newBuilder[AudioRow]
      out += AudioRow(base, base, "base", wav(i => sampleAt("aud", i)), "wav")
      if (base % 7 == 0)
        out += AudioRow(1000000L + base, base, "volume",
          wav(i => 2 * sampleAt("aud", i)), "wav")
      if (base % 11 == 0)
        out += AudioRow(2000000L + base, base, "perturb",
          wav(i => if (i % 251 == 0) sampleAt("aud2", i) else sampleAt("aud", i)), "wav")
      out.result()
    }(Encoders.product[AudioRow]).toDF()
  }

  final case class AudioHashRow(audio_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** Energy-delta audio fingerprint over a REAL WAV decode — the audio
    * analog of [[dhashBands]]: the first 520 PCM samples split into 65
    * windows of 8, window energy = Σ|sample| (exact integers), and each
    * of the 64 bits asks "is the next window louder". Volume scaling
    * preserves every comparison (the perceptual-hash invariance); local
    * edits flip only the bits whose windows they touch. Emitted as four
    * 16-bit bands — the LSH blocking keys for [[bandNearDups]]. */
  def audioFingerprint(audio: DataFrame): DataFrame = {
    val ds = audio.select(col("audio_id"), col("media"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions(_.map { case (id, media) =>
      val buf = ByteBuffer.wrap(media).order(ByteOrder.LITTLE_ENDIAN)
      require(media.length >= 44 &&
        buf.getInt(0) == 0x46464952 && buf.getInt(8) == 0x45564157, // "RIFF", "WAVE"
        s"audio $id: not a WAV payload")
      var pos = 12
      var audioFormat = 0; var bits = 0; var blockAlign = 0
      var dataPos = -1; var dataSize = -1
      while (pos + 8 <= media.length && (audioFormat == 0 || dataPos < 0)) {
        val cid = buf.getInt(pos); val size = buf.getInt(pos + 4)
        require(size >= 0, s"audio $id: corrupt WAV chunk size $size")
        if (cid == 0x20746d66) { // "fmt "
          audioFormat = buf.getShort(pos + 8).toInt
          blockAlign = buf.getShort(pos + 20).toInt
          bits = buf.getShort(pos + 22).toInt
        } else if (cid == 0x61746164) { dataPos = pos + 8; dataSize = size } // "data"
        pos += 8 + size + (size & 1)
      }
      require(audioFormat == 1 && bits == 16 && blockAlign == 2,
        s"audio $id: fingerprint expects mono 16-bit PCM " +
          s"(format=$audioFormat, bits=$bits, blockAlign=$blockAlign)")
      require(dataPos >= 0 && dataSize >= 520 * 2 && dataPos + dataSize <= media.length,
        s"audio $id: need >= 520 samples, data chunk has ${dataSize / 2}")
      val energy = new Array[Long](65)
      var w = 0
      while (w < 65) {
        var e = 0L
        var j = 0
        while (j < 8) {
          e += math.abs(buf.getShort(dataPos + 2 * (w * 8 + j)).toLong)
          j += 1
        }
        energy(w) = e
        w += 1
      }
      val bands = new Array[Int](4)
      var b = 0
      while (b < 64) {
        if (energy(b + 1) > energy(b)) bands(b / 16) |= 1 << (b % 16)
        b += 1
      }
      AudioHashRow(id, bands(0), bands(1), bands(2), bands(3))
    })(Encoders.product[AudioHashRow]).toDF()
  }

  /** Perceptual audio near-dup pairs: [[audioFingerprint]] +
    * [[bandNearDups]] — image and audio dedup share one blocking/verify
    * engine. */
  def audioDedup(audio: DataFrame, maxHamming: Int): DataFrame =
    bandNearDups(audioFingerprint(audio), maxHamming)

  /** The double Knuth remix of the portable fold shared by the planted
    * fixture generators — one mix of consecutive offsets is
    * low-discrepancy (the HLL lesson; see [[toImageCorpus]]), the
    * digit decomposition between two folds restores random statistics
    * while staying SQL-replayable. */
  final case class ImageStatsRow(image_id: Long, width: Int, height: Int,
      n_pixels: Long, sum_gray: Long, mean_gray: Double, variance: Double,
      sharpness: Long)

  /** Per-image no-reference quality statistics over a REAL BMP decode:
    * per-pixel luminance `gray = B + G + R` (0..765 — an integer, so
    * sums and sums of squares accumulate as EXACT BIGINTs in any order;
    * no decimal detour needed), with `mean`/`variance` going double
    * only in the final two expressions, and `sharpness` =
    * Σ|gray(x+1,y) − gray(x,y)| — horizontal gradient energy, the
    * standard blur proxy. Both variance and sharpness are invariant
    * under a global brightness shift (the shift cancels in the
    * differences), which is exactly what the planted "bright" variants
    * pin in the spec; mean moves by precisely 3×shift.
    *
    * Row order is the STORAGE order (BMP bottom-up) — irrelevant to
    * every emitted statistic: sums are row-order free and the gradient
    * stays within a storage row, which IS an image row. mapPartitions:
    * blobs stay executor-local, 8 numbers per image leave the scan. */
  def imageStats(images: DataFrame): DataFrame = {
    val ds = images.select(col("image_id"), col("media"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions(_.map { case (id, media) =>
      val buf = ByteBuffer.wrap(media).order(ByteOrder.LITTLE_ENDIAN)
      require(media.length >= 54 && buf.get(0) == 'B'.toByte && buf.get(1) == 'M'.toByte,
        s"image $id: not a BMP payload")
      val dataPos = buf.getInt(10)
      val w = buf.getInt(18)
      val h = math.abs(buf.getInt(22))
      val rowSize = (3 * w + 3) / 4 * 4
      require(media.length >= dataPos + rowSize * h,
        s"image $id: truncated pixel data")
      var sum = 0L
      var sumSq = 0L
      var grad = 0L
      var y = 0
      while (y < h) {
        var x = 0
        var prev = -1
        while (x < w) {
          val o = dataPos + y * rowSize + 3 * x
          val g = (media(o) & 0xff) + (media(o + 1) & 0xff) + (media(o + 2) & 0xff)
          sum += g
          sumSq += g.toLong * g
          if (prev >= 0) grad += math.abs(g - prev)
          prev = g
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val mean = sum.toDouble / n.toDouble
      ImageStatsRow(id, w, h, n, sum, mean,
        sumSq.toDouble / n.toDouble - mean * mean, grad)
    })(Encoders.product[ImageStatsRow]).toDF()
  }

  private def doubleMix(outerSalt: String, inner: String): Long = {
    def mix(s: String): Long =
      (graft.functions.Fold31.fold(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) * 2654435761L) % 2147483647L
    mix(outerSalt + java.lang.Long.toString(mix(inner)))
  }

  final case class VideoRow(video_id: Long, base_id: Long, variant: String,
      media: Array[Byte], format: String)

  /** Deterministic video corpus with planted near-duplicates — the
    * third modality of the family: every doc becomes a GVID container
    * of `2 + doc_id % 4` fold-pixel BMP frames; docs with
    * `doc_id % 7 == 0` get a BRIGHTNESS-shifted re-encode (every frame
    * +10 — all per-frame hashes must collide) and docs with
    * `doc_id % 11 == 0` whose frame count exceeds 2 get a TRUNCATED
    * copy (last frame dropped — the re-encode-that-loses-the-tail
    * case; the surviving frames are byte-identical, so ≥ 2 frames
    * still match and the clip pair is recoverable). */
  def toVideoCorpus(docs: DataFrame): DataFrame = {
    val ids = docs.select(col("doc_id")).as(Encoders.scalaLong)
    ids.flatMap { base =>
      val w = (9 + base % 8).toInt
      val h = (8 + base % 5).toInt
      val rowSize = (3 * w + 3) / 4 * 4
      val n = rowSize * h
      val nFrames = (2 + base % 4).toInt
      def frame(f: Int, lift: Int): Array[Byte] =
        bmpBytes(w, h, Array.tabulate(n)(i =>
          ((doubleMix("vid:", s"vid:$base:$f:$i") % 200L).toInt + lift).toByte))
      def container(frames: Seq[Array[Byte]]): Array[Byte] = {
        val buf = ByteBuffer.allocate(8 + frames.map(_.length).sum)
          .order(ByteOrder.LITTLE_ENDIAN)
        buf.put('G'.toByte).put('V'.toByte).put('I'.toByte).put('D'.toByte)
          .putInt(frames.size)
        frames.foreach(buf.put)
        buf.array()
      }
      val baseFrames = (0 until nFrames).map(f => frame(f, 0))
      val out = Seq.newBuilder[VideoRow]
      out += VideoRow(base, base, "base", container(baseFrames), "gvid")
      if (base % 7 == 0)
        out += VideoRow(1000000L + base, base, "bright",
          container((0 until nFrames).map(f => frame(f, 10))), "gvid")
      if (base % 11 == 0 && nFrames > 2)
        out += VideoRow(2000000L + base, base, "trunc",
          container(baseFrames.dropRight(1)), "gvid")
      out.result()
    }(Encoders.product[VideoRow]).toDF()
  }

  /** Deterministic video corpus with NEAR-THRESHOLD planted duplicates
    * — the recall fixture for [[bandNearDups]]'s `wideBands` bet (the
    * m06/m07/m08 corpora plant only Hamming-0 invariance classes, for
    * which any band scheme has recall 1 by construction): every doc
    * gets a PERTURBED copy (video_id + 1,000,000) whose frames have
    * `3 + doc_id % 8` dHash grid cells overwritten with saturated
    * white (765 gray) at exactly the pixels [[dhashBands]] samples —
    * each hit cell flips 0–2 of the 64 hash bits, landing the pair at
    * a data-dependent frame Hamming distance in the near-threshold
    * 2–12 range where the narrow-vs-wide band recall difference
    * actually lives. Cell choice derives from the double-remixed fold,
    * so an oracle replays the exact perturbation, hash, and every
    * band-collision verdict. */
  def toPerturbedVideoCorpus(docs: DataFrame): DataFrame = {
    val ids = docs.select(col("doc_id")).as(Encoders.scalaLong)
    ids.flatMap { base =>
      val w = (9 + base % 8).toInt
      val h = (8 + base % 5).toInt
      val rowSize = (3 * w + 3) / 4 * 4
      val n = rowSize * h
      val nFrames = (2 + base % 4).toInt
      def pixels(f: Int): Array[Byte] =
        Array.tabulate(n)(i =>
          (doubleMix("vid:", s"vid:$base:$f:$i") % 200L).toByte)
      def container(frames: Seq[Array[Byte]]): Array[Byte] = {
        val buf = ByteBuffer.allocate(8 + frames.map(_.length).sum)
          .order(ByteOrder.LITTLE_ENDIAN)
        buf.put('G'.toByte).put('V'.toByte).put('I'.toByte).put('D'.toByte)
          .putInt(frames.size)
        frames.foreach(buf.put)
        buf.array()
      }
      val baseFrames = (0 until nFrames).map(f => bmpBytes(w, h, pixels(f)))
      val k = (3 + base % 8).toInt
      val pertFrames = (0 until nFrames).map { f =>
        val data = pixels(f)
        (0 until k).foreach { j =>
          val c = (doubleMix("pert:", s"pert:$base:$f:$j") % 72L).toInt
          val gy = c / 9
          val gx = c % 9
          // the exact byte dhashBands samples for grid cell (gy, gx):
          // bottom-up row order, same integer grid walk
          val o = (h - 1 - gy * h / 8) * rowSize + 3 * (gx * w / 9)
          data(o) = 0xff.toByte
          data(o + 1) = 0xff.toByte
          data(o + 2) = 0xff.toByte
        }
        bmpBytes(w, h, data)
      }
      Seq(
        VideoRow(base, base, "base", container(baseFrames), "gvid"),
        VideoRow(1000000L + base, base, "perturb", container(pertFrames), "gvid"))
    }(Encoders.product[VideoRow]).toDF()
  }

  /** Walks each GVID container and emits every frame as a standalone
    * BMP media row with the composite id `video_id * 16 + frame_idx`
    * (frame counts are < 16 by construction, enforced) — the adapter
    * that lets the per-frame dHash ride [[dhashBands]] unchanged.
    * `mapPartitions`: containers stay executor-local, frames leave as
    * rows for the hashing scan. */
  def videoFrameMedia(videos: DataFrame): DataFrame = {
    val ds = videos.select(col("video_id"), col("media"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions(_.flatMap { case (id, media) =>
      val buf = ByteBuffer.wrap(media).order(ByteOrder.LITTLE_ENDIAN)
      require(media.length >= 8 && buf.get(0) == 'G'.toByte && buf.get(1) == 'V'.toByte &&
        buf.get(2) == 'I'.toByte && buf.get(3) == 'D'.toByte,
        s"video $id: not a GVID container")
      val n = buf.getInt(4)
      require(n > 0 && n < 16, s"video $id: composite frame ids need 0 < frames < 16, got $n")
      var offset = 8
      (0 until n).iterator.map { f =>
        require(media.length >= offset + 54 &&
          buf.get(offset) == 'B'.toByte && buf.get(offset + 1) == 'M'.toByte,
          s"video $id: frame $f is not a BMP at offset $offset")
        val size = buf.getInt(offset + 2)
        val slice = java.util.Arrays.copyOfRange(media, offset, offset + size)
        offset += size
        (id * 16 + f, slice)
      }
    })(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("image_id", "media")
  }

  /** Perceptual video near-dup pairs — frame-level shot matching: every
    * frame dHashes through the SAME band-blocking engine as m06, frame
    * matches (Hamming ≤ maxHamming) aggregate to clip pairs, and a
    * pair survives when ≥ `minMatchedFrames` distinct frame matches
    * connect the two clips — the truncated/re-encoded-copy detection a
    * video pipeline runs, with frame blobs never shuffled (only 4-int
    * hashes leave the decode). Output: (id_a, id_b, matched_frames),
    * id_a < id_b. */
  def videoDedup(videos: DataFrame, maxHamming: Int,
      minMatchedFrames: Int): DataFrame = {
    require(minMatchedFrames >= 1,
      s"minMatchedFrames must be positive, got $minMatchedFrames")
    // frames are the family's largest n (frame count × corpus): the
    // band scheme is auto-picked from the frame count (bandNearDups) —
    // at the measured 100× point (1.75M frames) that selects wide
    // 32-bit bands, cutting the candidate blowup from ~93M random
    // pairs to ~700k; below the 32768-frame crossover it selects
    // narrow, whose near-threshold recall m13 measured 3–15× higher
    bandNearDups(dhashBands(videoFrameMedia(videos)), maxHamming)
      .select(expr("id_a DIV 16").as("id_a"), expr("id_b DIV 16").as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).cast("int").as("matched_frames"))
      .filter(col("matched_frames") >= minMatchedFrames)
  }

  /** Frame sampling — the video-modality pipeline op: walks each
    * container (validating the GVID magic and every frame's BMP header),
    * emits every `every`-th frame's metadata. `mapPartitions` like the
    * other decoders: blobs stay executor-local, only small typed frame
    * rows leave the scan — at 100 TB this is what makes video feature
    * extraction shuffle-free. */
  def sampleFrames(videos: DataFrame, every: Int): DataFrame = {
    require(every > 0, s"every must be positive, got $every")
    val ds: Dataset[MediaRow] = videos.as(Encoders.product[MediaRow])
    ds.mapPartitions(_.flatMap { m =>
      val buf = ByteBuffer.wrap(m.media).order(ByteOrder.LITTLE_ENDIAN)
      require(m.media.length >= 8 && buf.get(0) == 'G'.toByte && buf.get(1) == 'V'.toByte &&
        buf.get(2) == 'I'.toByte && buf.get(3) == 'D'.toByte,
        s"doc ${m.doc_id}: not a GVID container")
      val n = buf.getInt(4)
      var offset = 8
      (0 until n).iterator.map { f =>
        require(m.media.length >= offset + 54 &&
          buf.get(offset) == 'B'.toByte && buf.get(offset + 1) == 'M'.toByte,
          s"doc ${m.doc_id}: frame $f is not a BMP at offset $offset")
        val size = buf.getInt(offset + 2)
        val row = FrameRow(m.doc_id, n, f, offset.toLong, size.toLong,
          buf.getInt(offset + 18), math.abs(buf.getInt(offset + 22)))
        offset += size
        row
      }.filter(_.frame_idx % every == 0)
    })(Encoders.product[FrameRow]).toDF()
  }

  final case class ShotVideoRow(video_id: Long, n_shots: Int,
      frames_per_shot: Int, media: Array[Byte], format: String)

  /** Deterministic video corpus with PLANTED SHOT STRUCTURE — the
    * fixture for [[shotBoundaries]]: each doc becomes a GVID container
    * of `2 + id % 3` shots × `2 + id % 2` frames. Every shot holds a
    * luminance plateau (alternating dark ~20–29 / bright ~110–119
    * levels, per-shot wiggle from the doubled fold), every frame adds
    * per-pixel jitter < 5, all three channels equal — so within-shot
    * frame-mean deltas stay < ~2 gray levels while cut deltas exceed
    * ~240 (3 channels × ≥81 levels), a separation the detector's
    * threshold sits inside with an order of magnitude to spare on each
    * side. The planted truth is derivable: frame f starts a shot iff
    * f % frames_per_shot == 0. */
  def toShotVideoCorpus(docs: DataFrame): DataFrame = {
    val ids = docs.select(col("doc_id")).as(Encoders.scalaLong)
    ids.map { base =>
      val w = (8 + base % 5).toInt
      val h = (6 + base % 4).toInt
      val rowSize = (3 * w + 3) / 4 * 4
      val nShots = (2 + base % 3).toInt
      val fps = (2 + base % 2).toInt
      def level(s: Int): Int =
        (20L + doubleMix("shot:", s"shot:$base:$s") % 10L
          + (if (s % 2 == 1) 90L else 0L)).toInt
      val frames = (0 until nShots * fps).map { f =>
        val lv = level(f / fps)
        val fill = new Array[Byte](rowSize * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val b = (lv + doubleMix("jit:", s"jit:$base:$f:${y * w + x}") % 5L).toByte
            val o = y * rowSize + 3 * x
            fill(o) = b; fill(o + 1) = b; fill(o + 2) = b
            x += 1
          }
          y += 1
        }
        bmpBytes(w, h, fill)
      }
      val buf = ByteBuffer.allocate(8 + frames.map(_.length).sum)
        .order(ByteOrder.LITTLE_ENDIAN)
      buf.put('G'.toByte).put('V'.toByte).put('I'.toByte).put('D'.toByte)
        .putInt(frames.length)
      frames.foreach(buf.put)
      ShotVideoRow(base, nShots, fps, buf.array(), "gvid")
    }(Encoders.product[ShotVideoRow]).toDF()
  }

  final case class SpeechAudioRow(audio_id: Long, n_speech: Int,
      media: Array[Byte], format: String)

  /** Deterministic audio corpus with PLANTED SPEECH/SILENCE structure —
    * the fixture for [[vadSegments]]: each doc becomes a mono 16-bit
    * WAV laid out as 80 samples of leading silence, then `2 + id % 3`
    * speech bursts separated by silence gaps, ending in speech (so
    * detection is exercised at both signal edges). Speech samples draw
    * |s| up to 8000 from the doubled fold, silence keeps a realistic
    * noise floor of |s| ≤ 30 — two orders of magnitude apart, with the
    * detector threshold in between. Every region length is a multiple
    * of the 40-sample analysis frame, so each frame is purely one kind
    * and the planted truth is derivable sample-by-sample. */
  def toSpeechAudioCorpus(docs: DataFrame, sampleRate: Int = 8000): DataFrame = {
    val ids = docs.select(col("doc_id")).as(Encoders.scalaLong)
    ids.map { base =>
      val nSeg = (2 + base % 3).toInt
      def speechLen(k: Int): Int =
        40 * (3 + doubleMix("len:", s"len:$base:$k") % 2L).toInt
      def gapLen(k: Int): Int =
        40 * (2 + doubleMix("gap:", s"gap:$base:$k") % 2L).toInt
      // region list: (isSpeech, length)
      val regions = (false, 80) +: (0 until nSeg).flatMap { k =>
        val sp = (true, speechLen(k))
        if (k < nSeg - 1) Seq(sp, (false, gapLen(k))) else Seq(sp)
      }
      val n = regions.map(_._2).sum
      val bytes = new Array[Byte](n * 2)
      var i = 0
      regions.foreach { case (isSpeech, len) =>
        var j = 0
        while (j < len) {
          val s =
            if (isSpeech) (doubleMix("sp:", s"sp:$base:$i") % 16000L - 8000L).toInt
            else (doubleMix("sil:", s"sil:$base:$i") % 60L - 30L).toInt
          bytes(2 * i) = (s & 0xff).toByte
          bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1; j += 1
        }
      }
      SpeechAudioRow(base, nSeg, wavBytes(sampleRate, n, bytes), "wav")
    }(Encoders.product[SpeechAudioRow]).toDF()
  }

  final case class VadSegmentRow(audio_id: Long, seg_idx: Int,
      start_frame: Int, end_frame: Int, n_frames: Int, sum_abs: Long)

  /** Energy-threshold voice-activity detection / silence segmentation —
    * the split-long-audio-on-silence pass a speech training pipeline
    * runs before windowing clips (the energy detector of Rabiner &
    * Sambur, Bell Syst. Tech. J. 1975). Walks each WAV's chunk list to
    * the PCM, classifies consecutive `frameSamples`-sample frames as
    * silent iff Σ|s| < silenceMeanAbs·frameSamples (exact integer
    * arithmetic end to end — the verdicts replay bit-identically), and
    * emits one row per maximal run of non-silent frames with its frame
    * bounds and total absolute energy. A trailing partial frame is
    * ignored. `mapPartitions`: blobs stay executor-local, only
    * segment rows — a handful of integers each — leave the scan. */
  def vadSegments(audio: DataFrame, frameSamples: Int,
      silenceMeanAbs: Int): DataFrame = {
    require(frameSamples > 0, s"frameSamples must be positive, got $frameSamples")
    require(silenceMeanAbs > 0, s"silenceMeanAbs must be positive, got $silenceMeanAbs")
    val ds = audio.select(col("audio_id"), col("media"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions(_.flatMap { case (id, media) =>
      val buf = ByteBuffer.wrap(media).order(ByteOrder.LITTLE_ENDIAN)
      require(media.length >= 44 &&
        buf.getInt(0) == 0x46464952 && buf.getInt(8) == 0x45564157,
        s"audio $id: not a WAV payload")
      var pos = 12
      var dataPos = -1; var dataSize = -1
      while (pos + 8 <= media.length && dataSize < 0) {
        val cid = buf.getInt(pos); val size = buf.getInt(pos + 4)
        require(size >= 0, s"audio $id: corrupt WAV chunk size $size")
        if (cid == 0x61746164) { dataPos = pos + 8; dataSize = size } // "data"
        pos += 8 + size + (size & 1)
      }
      require(dataPos >= 0 && media.length >= dataPos + dataSize,
        s"audio $id: WAV missing or truncated data chunk")
      val nFrames = dataSize / 2 / frameSamples
      val out = Seq.newBuilder[VadSegmentRow]
      var segStart = -1
      var segSum = 0L
      var segIdx = 0
      var f = 0
      while (f < nFrames) {
        var sum = 0L
        var j = 0
        while (j < frameSamples) {
          sum += math.abs(buf.getShort(dataPos + 2 * (f * frameSamples + j)).toLong)
          j += 1
        }
        val silent = sum < silenceMeanAbs.toLong * frameSamples
        if (!silent) {
          if (segStart < 0) { segStart = f; segSum = 0L }
          segSum += sum
        } else if (segStart >= 0) {
          out += VadSegmentRow(id, segIdx, segStart, f - 1, f - segStart, segSum)
          segIdx += 1; segStart = -1
        }
        f += 1
      }
      if (segStart >= 0)
        out += VadSegmentRow(id, segIdx, segStart, nFrames - 1,
          nFrames - segStart, segSum)
      out.result()
    })(Encoders.product[VadSegmentRow]).toDF()
  }

  final case class KeyframeRow(video_id: Long, shot_idx: Int,
      start_frame: Int, end_frame: Int, n_frames: Int, keyframe: Int,
      key_sharpness: Long)

  /** Per-shot keyframe selection — the segmentation-then-sampling pass
    * that turns raw video into training frames: segment each GVID
    * container at mean-luminance cuts (the [[shotBoundaries]] detector)
    * and pick, per shot, the SHARPEST frame (max horizontal gradient
    * energy, the [[imageStats]] blur proxy; ties to the earliest
    * frame) — one representative image per shot instead of
    * all-frames-equal sampling. One container walk computes both the
    * frame means (for cuts) and gradients (for selection); only
    * shot-count rows leave the scan. Exact integer sums end to end —
    * segmentation and selection replay bit-identically. */
  def shotKeyframes(videos: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val ds = videos.select(col("video_id"), col("media"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions(_.flatMap { case (id, media) =>
      val buf = ByteBuffer.wrap(media).order(ByteOrder.LITTLE_ENDIAN)
      require(media.length >= 8 && buf.get(0) == 'G'.toByte && buf.get(1) == 'V'.toByte &&
        buf.get(2) == 'I'.toByte && buf.get(3) == 'D'.toByte,
        s"video $id: not a GVID container")
      val n = buf.getInt(4)
      var offset = 8
      val means = new Array[Double](n)
      val grads = new Array[Long](n)
      var f = 0
      while (f < n) {
        require(media.length >= offset + 54 &&
          buf.get(offset) == 'B'.toByte && buf.get(offset + 1) == 'M'.toByte,
          s"video $id: frame $f is not a BMP at offset $offset")
        val size = buf.getInt(offset + 2)
        val dataPos = buf.getInt(offset + 10)
        val w = buf.getInt(offset + 18)
        val h = math.abs(buf.getInt(offset + 22))
        val rowSize = (3 * w + 3) / 4 * 4
        require(media.length >= offset + dataPos + rowSize * h,
          s"video $id: frame $f truncated")
        var sum = 0L
        var grad = 0L
        var y = 0
        while (y < h) {
          var x = 0
          var prev = -1
          while (x < w) {
            val o = offset + dataPos + y * rowSize + 3 * x
            val g = (media(o) & 0xff) + (media(o + 1) & 0xff) + (media(o + 2) & 0xff)
            sum += g
            if (prev >= 0) grad += math.abs(g - prev)
            prev = g
            x += 1
          }
          y += 1
        }
        means(f) = sum.toDouble / (w.toLong * h).toDouble
        grads(f) = grad
        offset += size
        f += 1
      }
      val out = Seq.newBuilder[KeyframeRow]
      var shotStart = 0
      var shotIdx = 0
      def close(endExclusive: Int): Unit = {
        var best = shotStart
        var bf = shotStart + 1
        while (bf < endExclusive) {
          if (grads(bf) > grads(best)) best = bf
          bf += 1
        }
        out += KeyframeRow(id, shotIdx, shotStart, endExclusive - 1,
          endExclusive - shotStart, best, grads(best))
        shotIdx += 1
        shotStart = endExclusive
      }
      var i = 1
      while (i < n) {
        if (math.abs(means(i) - means(i - 1)) > threshold) close(i)
        i += 1
      }
      if (n > 0) close(n)
      out.result()
    })(Encoders.product[KeyframeRow]).toDF()
  }

  final case class ShotBoundaryRow(video_id: Long, n_frames: Int,
      frame_idx: Int, prev_mean: Double, cur_mean: Double, delta: Double)

  /** Shot-boundary detection by frame-mean luminance delta — the
    * standard hard-cut detector (threshold on successive-frame
    * intensity difference; Boreczky & Rowe, "Comparison of video shot
    * boundary detection techniques", SPIE 1996) and the segmentation
    * pass a video training pipeline runs before picking one keyframe
    * per shot. Walks each GVID container ONCE (validating magic and
    * every frame's BMP header), accumulates each frame's exact BIGINT
    * gray sum (r+g+b per pixel, the [[imageStats]] space), and emits a
    * row per frame whose mean jumps more than `threshold` from its
    * predecessor. `mapPartitions`: blobs stay executor-local; only the
    * boundary rows — a handful of doubles each — leave the scan, which
    * is what keeps the operator shuffle-free at 100 TB. Integer sums in
    * any order + one double division per frame keep the means (and so
    * the verdicts) bit-deterministic. */
  def shotBoundaries(videos: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val ds = videos.select(col("video_id"), col("media"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions(_.flatMap { case (id, media) =>
      val buf = ByteBuffer.wrap(media).order(ByteOrder.LITTLE_ENDIAN)
      require(media.length >= 8 && buf.get(0) == 'G'.toByte && buf.get(1) == 'V'.toByte &&
        buf.get(2) == 'I'.toByte && buf.get(3) == 'D'.toByte,
        s"video $id: not a GVID container")
      val n = buf.getInt(4)
      var offset = 8
      val means = new Array[Double](n)
      var f = 0
      while (f < n) {
        require(media.length >= offset + 54 &&
          buf.get(offset) == 'B'.toByte && buf.get(offset + 1) == 'M'.toByte,
          s"video $id: frame $f is not a BMP at offset $offset")
        val size = buf.getInt(offset + 2)
        val dataPos = buf.getInt(offset + 10)
        val w = buf.getInt(offset + 18)
        val h = math.abs(buf.getInt(offset + 22))
        val rowSize = (3 * w + 3) / 4 * 4
        require(media.length >= offset + dataPos + rowSize * h,
          s"video $id: frame $f truncated")
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val o = offset + dataPos + y * rowSize + 3 * x
            sum += (media(o) & 0xff) + (media(o + 1) & 0xff) + (media(o + 2) & 0xff)
            x += 1
          }
          y += 1
        }
        means(f) = sum.toDouble / (w.toLong * h).toDouble
        offset += size
        f += 1
      }
      (1 until n).iterator
        .map(i => ShotBoundaryRow(id, n, i, means(i - 1), means(i),
          math.abs(means(i) - means(i - 1))))
        .filter(_.delta > threshold)
    })(Encoders.product[ShotBoundaryRow]).toDF()
  }
}
