package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: images /
  * audio / video ride through the engine as opaque `binary` columns
  * plus typed metadata structs; per-batch transforms (decode, feature
  * extraction, resize, frame sampling) run as `mapPartitions` stages
  * over the binary column — the Scala analogue of `mapInPandas`
  * batch UDFs.
  *
  * Two codecs back the same plumbing:
  *
  *  - `FakeCodec` — a deterministic, ANSI-SQL-expressible fake used by
  *    the oracle-checked queries (q26/q50): DuckDB cannot decode JPEG,
  *    so the oracle face must be arithmetic over the raw bytes.
  *  - `ImageCodec` — a REAL decoder built on `javax.imageio` (shipped
  *    with every JDK, offline-safe): JPEG + PNG header metadata
  *    (width/height/channels without a full pixel decode) and
  *    per-channel mean/std pixel features from the decoded raster.
  *    Exposed via `withDecodedImageMeta` / `decodedImageFeatures`;
  *    undecodable bytes yield a null struct/array rather than failing
  *    the task (corpus-scale media is always partly corrupt).
  *
  * `AudioCodec` — a REAL audio decoder built on `javax.sound.sampled`
  * (also JDK-shipped): WAV/AIFF/AU header metadata and per-channel
  * mean/RMS/peak sample features for 8/16-bit PCM. Video remains
  * stub-only (no ffmpeg in a bare JVM); the frame sampler operates on
  * the byte stream.
  *
  * Scale notes: every operator here is narrow (no shuffle); content
  * bytes stay within their partition. Decoded features are small fixed
  * vectors, so downstream shuffles (dedup/ANN on features) never carry
  * the raw media bytes.
  */
object MultiModal {

  val ImageMetaType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** STUB decoder — deterministic fake derived from the bytes.
    * Replace with a real codec; the signature is the contract.
    */
  private[ops] object FakeCodec {
    def sniffFormat(b: Array[Byte]): String =
      if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P') "png"
      else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
      else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "gif"
      else if (b.length >= 14 && b(0) == 'B' && b(1) == 'M') "bmp"
      else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') "wav"
      else "raw"

    /** Fake dimensions: stable function of content length + first bytes
      * (sum of the first <=16 unsigned byte values — deliberately
      * ANSI-SQL-expressible so the stub's plumbing is oracle-checkable).
      */
    def dims(b: Array[Byte]): (Int, Int, Int) = {
      var s = 0
      var i = 0
      val n = math.min(b.length, 16)
      while (i < n) { s += b(i) & 0xff; i += 1 }
      val w = 16 + s % 241
      val h = 16 + (b.length % 241)
      (w, h, 3)
    }

    /** Fake per-channel mean "pixel" stats over the raw bytes. */
    def channelMeans(b: Array[Byte], channels: Int): Array[Double] = {
      val sums = new Array[Long](channels)
      val counts = new Array[Long](channels)
      var i = 0
      while (i < b.length) {
        sums(i % channels) += (b(i) & 0xff)
        counts(i % channels) += 1
        i += 1
      }
      Array.tabulate(channels)(c => if (counts(c) == 0) 0.0 else sums(c).toDouble / counts(c))
    }
  }

  /** REAL image codec on `javax.imageio` (JDK-shipped; no external
    * deps, works headless). Decodes any format an installed ImageIO
    * plugin handles — JPEG, PNG, GIF, BMP on a stock JDK 17.
    *
    * Executor notes: the file-backed ImageIO cache is disabled (pure
    * in-memory streams); readers are created per call (ImageIO reader
    * instances are not thread-safe) and always disposed.
    */
  private[graft] object ImageCodec {
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO
    import scala.util.control.NonFatal

    ImageIO.setUseCache(false)

    final case class Meta(format: String, width: Int, height: Int, channels: Int)

    /** Header-only metadata: width/height come from the image header
      * via `ImageReader.getWidth/getHeight` — no pixel decode, so this
      * is cheap even for large images. Returns None for bytes no
      * installed reader claims.
      */
    def decodeMeta(b: Array[Byte]): Option[Meta] = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(b))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            val w = r.getWidth(0)
            val h = r.getHeight(0)
            val fmt = r.getFormatName.toLowerCase(java.util.Locale.ROOT)
            val ch = {
              val raw = r.getRawImageType(0) // may be null (some JPEGs)
              if (raw != null) raw.getNumComponents
              else {
                val it = r.getImageTypes(0)
                if (it.hasNext) it.next().getNumComponents else 3
              }
            }
            Some(Meta(fmt, w, h, ch))
          } finally r.dispose()
        }
      } catch { case NonFatal(_) => None } finally iis.close()
    }

    /** Full decode: metadata + per-band mean and population std over
      * every pixel sample. One pass through the raster; the feature
      * vector is O(channels), never the pixels themselves.
      */
    def decodeStats(b: Array[Byte]): Option[(Meta, Array[Double], Array[Double])] = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(b))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            val fmt = r.getFormatName.toLowerCase(java.util.Locale.ROOT)
            val img = r.read(0)
            val raster = img.getRaster
            val bands = raster.getNumBands
            val w = img.getWidth
            val h = img.getHeight
            val sum = new Array[Double](bands)
            val sumSq = new Array[Double](bands)
            val line = new Array[Int](w)
            var band = 0
            while (band < bands) {
              var y = 0
              while (y < h) {
                raster.getSamples(0, y, w, 1, band, line)
                var x = 0
                while (x < w) {
                  val v = line(x).toDouble
                  sum(band) += v
                  sumSq(band) += v * v
                  x += 1
                }
                y += 1
              }
              band += 1
            }
            val n = w.toDouble * h
            val means = Array.tabulate(bands)(c => sum(c) / n)
            val stds = Array.tabulate(bands) { c =>
              val m = means(c)
              math.sqrt(math.max(sumSq(c) / n - m * m, 0.0))
            }
            Some((Meta(fmt, w, h, bands), means, stds))
          } finally r.dispose()
        }
      } catch { case NonFatal(_) => None } finally iis.close()
    }
  }

  val AudioMetaType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("frames", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  private[graft] object AudioCodec {
    import java.io.ByteArrayInputStream
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    import scala.util.control.NonFatal

    final case class Meta(format: String, channels: Int, sampleRate: Int,
        bits: Int, frames: Long)

    /** Header-only metadata via `AudioSystem.getAudioFileFormat` — no
      * sample decode. None for bytes no installed provider claims
      * (JDK providers: wave, aiff, au).
      */
    def decodeMeta(b: Array[Byte]): Option[Meta] =
      try {
        val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(b))
        val f = aff.getFormat
        Some(Meta(aff.getType.getExtension.toLowerCase(java.util.Locale.ROOT),
          f.getChannels, f.getSampleRate.toInt, f.getSampleSizeInBits,
          aff.getFrameLength.toLong))
      } catch { case NonFatal(_) => None }

    /** Full sample decode for 8/16-bit PCM: per-channel mean, RMS
      * (loudness) and absolute peak over the raw sample domain
      * (8-bit unsigned: 0..255; 16-bit signed: -32768..32767). One
      * pass over the frames; feature size is O(channels), never the
      * samples. None for non-PCM or unclaimed bytes.
      */
    def decodeStats(b: Array[Byte]): Option[(Meta, Array[Double], Array[Double], Array[Double])] =
      try {
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(b))
        try {
          val f = ais.getFormat
          val enc = f.getEncoding
          val bits = f.getSampleSizeInBits
          val ch = f.getChannels
          val pcm = enc == AudioFormat.Encoding.PCM_SIGNED ||
            enc == AudioFormat.Encoding.PCM_UNSIGNED
          if (!pcm || (bits != 8 && bits != 16) || ch <= 0) None
          else {
            val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
            val big = f.isBigEndian
            val bytesPerSample = bits / 8
            val frameSize = bytesPerSample * ch
            val sum = new Array[Double](ch)
            val sumSq = new Array[Double](ch)
            val peak = new Array[Double](ch)
            var frames = 0L
            val buf = new Array[Byte](frameSize * 1024)
            var read = ais.read(buf)
            var carry = 0 // partial frame bytes carried between reads
            while (read > 0) {
              val avail = carry + read
              val nFrames = avail / frameSize
              var fi = 0
              while (fi < nFrames) {
                var c = 0
                while (c < ch) {
                  val off = fi * frameSize + c * bytesPerSample
                  val v: Double =
                    if (bits == 8) {
                      if (unsigned) (buf(off) & 0xFF).toDouble
                      else buf(off).toDouble
                    } else {
                      val b0 = buf(off) & 0xFF
                      val b1 = buf(off + 1) & 0xFF
                      val s = if (big) (b0 << 8) | b1 else (b1 << 8) | b0
                      (if (unsigned) s - 32768 else s.toShort.toInt).toDouble
                    }
                  sum(c) += v
                  sumSq(c) += v * v
                  if (math.abs(v) > peak(c)) peak(c) = math.abs(v)
                  c += 1
                }
                fi += 1
              }
              frames += nFrames
              carry = avail - nFrames * frameSize
              if (carry > 0)
                System.arraycopy(buf, nFrames * frameSize, buf, 0, carry)
              read = ais.read(buf, carry, buf.length - carry)
            }
            if (frames == 0) None
            else {
              val n = frames.toDouble
              val means = Array.tabulate(ch)(c => sum(c) / n)
              val rms = Array.tabulate(ch)(c => math.sqrt(sumSq(c) / n))
              val fmt =
                try AudioSystem.getAudioFileFormat(new ByteArrayInputStream(b))
                  .getType.getExtension.toLowerCase(java.util.Locale.ROOT)
                catch { case NonFatal(_) => "pcm" }
              Some((Meta(fmt, ch, f.getSampleRate.toInt, bits, frames),
                means, rms, peak))
            }
          }
        } finally ais.close()
      } catch { case NonFatal(_) => None }
  }

  /** Minimal canonical-header WAV encoder (PCM) for fixtures and the
    * oracle-checked audio query: 8-bit samples live in the WAV
    * unsigned 0..255 domain, 16-bit samples are signed little-endian;
    * `samples` is channel-interleaved frame order.
    */
  private[graft] def wavPcm(channels: Int, sampleRate: Int, bits: Int,
      samples: Array[Int]): Array[Byte] = {
    require(bits == 8 || bits == 16, "wavPcm supports 8/16-bit PCM")
    val bytesPerSample = bits / 8
    val dataLen = samples.length * bytesPerSample
    val blockAlign = channels * bytesPerSample
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign)
      .putShort(blockAlign.toShort)
      .putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach { v =>
      if (bits == 8) out.put((v & 0xFF).toByte)
      else out.putShort(v.toShort)
    }
    out.array()
  }

  /** Hand-rolled 24-bit uncompressed BMP (BITMAPINFOHEADER, BI_RGB,
    * bottom-up rows, 4-byte row padding) — the image sibling of
    * [[wavPcm]]: fixture bytes built from spec arithmetic with NO
    * encoder in the loop, so a real `javax.imageio` decode of them is
    * checkable against independently restated pixel sums (q110's
    * analytic-exactness rule). `rgb(x, y)` returns packed `0xRRGGBB`
    * for the TOP-DOWN logical pixel (x, y).
    */
  private[graft] def bmp24(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataLen = (rowBytes + pad) * h
    val out = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54)
      .putInt(40).putInt(w).putInt(h) // positive height: bottom-up rows
      .putShort(1).putShort(24).putInt(0).putInt(dataLen)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var j = 0
    while (j < h) {
      val y = h - 1 - j // file stores the bottom row first
      var x = 0
      while (x < w) {
        val p = rgb(x, y)
        out.put((p & 0xFF).toByte)         // B
        out.put(((p >> 8) & 0xFF).toByte)  // G
        out.put(((p >> 16) & 0xFF).toByte) // R
        x += 1
      }
      var k = 0
      while (k < pad) { out.put(0.toByte); k += 1 }
      j += 1
    }
    out.array()
  }

  /** Hand-rolled GIF89a with a 256-entry grayscale global palette and
    * the classic "uncompressed LZW" emission: 9-bit literal codes with
    * a Clear every 250 so the decoder's next-free code never reaches
    * 512 and the code width never grows. The decoded raster carries
    * exactly `idx(x, y)` as its palette indices, so pixel stats are
    * spec arithmetic while the REAL LZW decoder stays load-bearing.
    */
  private[graft] def gifGray(w: Int, h: Int, idx: (Int, Int) => Int): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(w * h * 2 + 800)
    def le16(v: Int): Unit = { bo.write(v & 0xFF); bo.write((v >> 8) & 0xFF) }
    bo.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    bo.write(0xF7) // global color table, 8-bit color res, 256 entries
    bo.write(0); bo.write(0)
    var i = 0
    while (i < 256) { bo.write(i); bo.write(i); bo.write(i); i += 1 }
    bo.write(0x2C); le16(0); le16(0); le16(w); le16(h); bo.write(0)
    bo.write(8) // LZW minimum code size: clear=256, eoi=257, 9-bit codes
    val codes = new scala.collection.mutable.ArrayBuffer[Int](w * h + w * h / 250 + 3)
    codes += 256
    var n = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (n == 250) { codes += 256; n = 0 }
        codes += (idx(x, y) & 0xFF)
        n += 1
        x += 1
      }
      y += 1
    }
    codes += 257
    // pack 9-bit codes LSB-first, then 255-byte sub-blocks
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nb = 0
    codes.foreach { c =>
      acc |= c.toLong << nb; nb += 9
      while (nb >= 8) { bits.write((acc & 0xFF).toInt); acc >>= 8; nb -= 8 }
    }
    if (nb > 0) bits.write((acc & 0xFF).toInt)
    val data = bits.toByteArray
    var off = 0
    while (off < data.length) {
      val len = math.min(255, data.length - off)
      bo.write(len); bo.write(data, off, len)
      off += len
    }
    bo.write(0)    // block terminator
    bo.write(0x3B) // trailer
    bo.toByteArray
  }

  /** Attach a REAL audio-metadata struct (javax.sound header decode:
    * WAV/AIFF/AU) from `bytesCol`; null struct for undecodable bytes.
    * Narrow map — the image plumbing, audio codec.
    */
  def withDecodedAudioMeta(df: DataFrame, bytesCol: String, metaCol: String = "meta"): DataFrame = {
    val metaType = StructType(AudioMetaType.fields.map(_.copy(nullable = false)))
    val schema = StructType(df.schema.fields :+ StructField(metaCol, metaType, nullable = true))
    val idx = df.schema.fieldIndex(bytesCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val b = r.getAs[Array[Byte]](idx)
        val meta = AudioCodec.decodeMeta(b)
          .map(m => Row(m.format, m.channels, m.sampleRate, m.bits, m.frames,
            b.length.toLong))
          .orNull
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** REAL per-channel audio features: mean, RMS and peak per channel
    * plus log1p(byte length) — `3*channels + 1` doubles per clip from
    * the decoded PCM samples. Null array for undecodable/non-PCM
    * bytes.
    */
  def decodedAudioFeatures(df: DataFrame, bytesCol: String, featCol: String = "features"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(featCol, ArrayType(DoubleType, containsNull = false), nullable = true))
    val idx = df.schema.fieldIndex(bytesCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val b = r.getAs[Array[Byte]](idx)
        val feats = AudioCodec.decodeStats(b).map { case (_, means, rms, peak) =>
          (means ++ rms ++ peak :+ math.log1p(b.length.toDouble)).toSeq
        }.orNull
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Attach a REAL image-metadata struct (javax.imageio header decode)
    * from `bytesCol`; null struct for undecodable bytes. Narrow map —
    * same plumbing as the stub variant, real codec.
    */
  def withDecodedImageMeta(df: DataFrame, bytesCol: String, metaCol: String = "meta"): DataFrame = {
    val metaType = StructType(ImageMetaType.fields.map(_.copy(nullable = false)))
    val schema = StructType(df.schema.fields :+ StructField(metaCol, metaType, nullable = true))
    val idx = df.schema.fieldIndex(bytesCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val b = r.getAs[Array[Byte]](idx)
        val meta = ImageCodec.decodeMeta(b)
          .map(m => Row(m.format, m.width, m.height, m.channels, b.length.toLong))
          .orNull
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** REAL per-channel pixel features: mean and std per band plus
    * log1p(byte length) — `2*channels + 1` doubles per image, computed
    * from the decoded raster. Null array for undecodable bytes.
    */
  def decodedImageFeatures(df: DataFrame, bytesCol: String, featCol: String = "features"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(featCol, ArrayType(DoubleType, containsNull = false), nullable = true))
    val idx = df.schema.fieldIndex(bytesCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val b = r.getAs[Array[Byte]](idx)
        val feats = ImageCodec.decodeStats(b).map { case (_, means, stds) =>
          (means ++ stds :+ math.log1p(b.length.toDouble)).toSeq
        }.orNull
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Attach an image-metadata struct column decoded (fake) from
    * `bytesCol`. Narrow map, batch-at-a-time via mapPartitions.
    */
  def withImageMeta(df: DataFrame, bytesCol: String, metaCol: String = "meta"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(metaCol, ImageMetaType, nullable = false))
    val idx = df.schema.fieldIndex(bytesCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val b = r.getAs[Array[Byte]](idx)
        val fmt = FakeCodec.sniffFormat(b)
        val (w, h, c) = FakeCodec.dims(b)
        Row.fromSeq(r.toSeq :+ Row(fmt, w, h, c, b.length.toLong))
      }
    }(enc)
  }

  /** Fixed-length feature vector per media row (fake channel means +
    * normalized length) — the shape a real embedding/feature extractor
    * would produce; downstream ANN/dedup operate on this, never on the
    * raw bytes.
    */
  def imageFeatures(df: DataFrame, bytesCol: String, featCol: String = "features"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(featCol, ArrayType(DoubleType, containsNull = false), nullable = false))
    val idx = df.schema.fieldIndex(bytesCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val b = r.getAs[Array[Byte]](idx)
        val means = FakeCodec.channelMeans(b, 3)
        val feats = means :+ math.log1p(b.length.toDouble)
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** "Resize": deterministic re-sampling of the byte stream to a fixed
    * budget — stands in for pixel resampling; the real implementation
    * replaces the body, the schema/partitioning stay.
    */
  def resizeTo(df: DataFrame, bytesCol: String, targetBytes: Int, outCol: String = "resized"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType, nullable = false))
    val idx = df.schema.fieldIndex(bytesCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val b = r.getAs[Array[Byte]](idx)
        val out =
          if (b.length <= targetBytes) b
          else Array.tabulate[Byte](targetBytes)(i => b((i.toLong * b.length / targetBytes).toInt))
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** "Frame sampling": split a (fake) video byte stream into `n`
    * evenly-spaced fixed-size frames — one output row per frame,
    * exploded within the partition (narrow).
    */
  def sampleFrames(df: DataFrame, bytesCol: String, n: Int, frameBytes: Int = 4096): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val idx = df.schema.fieldIndex(bytesCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val b = r.getAs[Array[Byte]](idx)
        (0 until n).iterator.map { i =>
          val start = if (n == 1) 0 else (i.toLong * math.max(b.length - frameBytes, 0) / math.max(n - 1, 1)).toInt
          val end = math.min(start + frameBytes, b.length)
          Row.fromSeq(r.toSeq ++ Seq(i, java.util.Arrays.copyOfRange(b, start, end)))
        }
      }
    }(enc)
  }
}
