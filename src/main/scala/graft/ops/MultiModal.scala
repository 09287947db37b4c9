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
  * The actual codec work is STUBBED with a deterministic fake (this
  * environment ships no image/audio libraries): `FakeCodec` derives
  * metadata and "pixels" from the bytes alone, so results are stable,
  * testable, and schema-faithful. Swap `FakeCodec` for a real decoder
  * (javax.imageio / ffmpeg bindings) without touching the Spark
  * plumbing — schema, partitioning, batch shape are the real design.
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
