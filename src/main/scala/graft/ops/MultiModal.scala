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
  * Audio/video remain stub-only (no ffmpeg in a bare JVM); the frame
  * sampler operates on the byte stream.
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
