package graft.queries

import graft.convert.ArchiveConverter
import graft.core.{ConvertOptions, IncludeType}
import graft.functions.{GraftFunctions, TextStats}
import graft.ops.{Dedup, MultiModal, Packing, Quality, Sampling, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import scala.collection.immutable.ListMap

/** Multimodal decode faces: the stub-codec q26 shape plus the REAL
  * javax.sound (q110) and javax.imageio (q123) decodes under the
  * analytic-exactness oracles.
  *
  * One trait of the [[Inventory]] registry split (r12 verdict #7):
  * the single `queries` ListMap + `oracleSql` map in [[Inventory]]
  * remain the registry face; the linear trait chain preserves the
  * original member initialization order.
  */
private[queries] trait InventoryMedia extends InventoryQuality {


  private[queries] def q26(s: SparkSession, d: String): DataFrame = {
    // multimodal plumbing: documents' text bytes stand in for opaque
    // media blobs; decode(stub) -> typed meta struct -> feature vector,
    // aggregated per fake format. The stub codec is deliberately
    // SQL-expressible (and the corpus is ASCII, so byte==char), making
    // the whole mapPartitions pipeline oracle-checkable. Cross-row
    // double sums go through 6-dp DECIMAL (order-insensitive, exact).
    val media = graft.ops.Layouts.fanOutByKey(
        t(s, d, "documents").select(col("doc_id"),
          col("text").cast("binary").as("bytes")), "doc_id")
    val decoded = MultiModal.imageFeatures(
      MultiModal.withImageMeta(media, "bytes"), "bytes")
    decoded
      .groupBy(col("meta.format").as("format"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(element_at(col("features"), 1), 6).cast(DecimalType(18, 6)))
          .cast("double") / count(lit(1)), 6).as("avg_c0"),
        round(sum(col("meta.width").cast("long")).cast("double") / count(lit(1)), 6)
          .as("avg_width"))
      .orderBy(col("format"))
  }


  /** REAL audio decode ([[MultiModal.AudioCodec]], `javax.sound`):
    * per document a canonical-header PCM WAV is synthesized — even ids
    * 8-bit (WAV's unsigned domain), odd ids 16-bit signed LE, frame
    * count varying with `doc_id%5` — and decoded by the real JDK
    * audio stack: header metadata plus per-channel mean/RMS/peak
    * sample features. Every sample value is spec-determined integer
    * arithmetic, and integer-valued double sums at these sizes are
    * EXACT (< 2^53), so the oracle recomputes mean/RMS/peak from the
    * same arithmetic over `range(n)` — bit-identical, no summation-
    * order caveat. The mapPartitions plumbing is the q26 multimodal
    * shape with the stub swapped for the real codec.
    */
  private[queries] def q110(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // (r21 note: a fan-out before the decode was tried and REVERTED —
    // javax.sound's AudioSystem does a provider-registry lookup per
    // getAudioInputStream call that contends across threads, and 32
    // concurrent decode tasks measured ~2.5x SLOWER than one; the
    // image path (q123) has no such contention and keeps its fan-out)
    val media = t(s, d, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = 800 + (id % 5).toInt * 80
          val bits = if (id % 2 == 0) 8 else 16
          val samples = Array.tabulate(n) { i =>
            if (bits == 8) ((id + i) % 256).toInt
            else ((id * 31 + i.toLong * 7) % 65536 - 32768).toInt
          }
          (id, MultiModal.wavPcm(1, 8000, bits, samples))
        }
      }.toDF("doc_id", "bytes")
    val decoded = MultiModal.decodedAudioFeatures(
      MultiModal.withDecodedAudioMeta(media, "bytes"), "bytes")
    decoded.select(col("doc_id"),
      col("meta.format").as("format"),
      col("meta.channels").as("channels"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.bits").as("bits"),
      col("meta.frames").as("frames"),
      round(element_at(col("features"), 1), 6).as("mean_c0"),
      round(element_at(col("features"), 2), 6).as("rms_c0"),
      element_at(col("features"), 3).as("peak_c0"))
      .orderBy(col("doc_id"))
  }


  /** REAL image decode ([[MultiModal.ImageCodec]], `javax.imageio`) —
    * q110's analytic-exactness rule ported to images, retiring the
    * q26 stub-codec caveat: per document a 24-bit BMP and a palette-
    * indexed GIF are synthesized by HAND-ROLLED builders
    * ([[MultiModal.bmp24]] / [[MultiModal.gifGray]] — spec arithmetic
    * straight to container bytes, no encoder in the loop) and decoded
    * by the real JDK image stack. BMP pixels land as 3 exact R/G/B
    * bands; the GIF raster carries the palette indices themselves
    * through a real LZW decode (the builder's 9-bit clear-code
    * emission keeps indices verbatim). Every sample is spec-determined
    * integer arithmetic and integer-valued double sums at these sizes
    * are exact (< 2^53), so the oracle recomputes mean/std from the
    * same arithmetic over `range(w) x range(h)` — bit-identical
    * through the IEEE division/sqrt on both sides.
    */
  private[queries] def q123(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // fan out before the synth+decode mapPartitions (one core otherwise)
    val media = graft.ops.Layouts.fanOutByKey(
        t(s, d, "documents").select(col("doc_id")), "doc_id").as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val bh = 4 + (id % 3).toInt * 2
          val bmp = MultiModal.bmp24(16, bh, (x, y) =>
            (((id + 3 * x + 5 * y) % 256).toInt << 16) |
              (((2 * id + 7 * x + y) % 256).toInt << 8) |
              ((3 * id + x + 11 * y) % 256).toInt)
          val gh = 5 + (id % 4).toInt
          val gif = MultiModal.gifGray(12, gh,
            (x, y) => ((13 * id + 3 * x + 7 * y) % 256).toInt)
          (id, bmp, gif)
        }
      }.toDF("doc_id", "bmp_bytes", "gif_bytes")
    val withMeta = MultiModal.withDecodedImageMeta(
      MultiModal.withDecodedImageMeta(media, "bmp_bytes", "bmp_meta"),
      "gif_bytes", "gif_meta")
    val withFeats = MultiModal.decodedImageFeatures(
      MultiModal.decodedImageFeatures(withMeta, "bmp_bytes", "bmp_f"),
      "gif_bytes", "gif_f")
    withFeats.select(col("doc_id"),
      col("bmp_meta.format").as("bmp_format"),
      col("bmp_meta.width").cast("bigint").as("bmp_w"),
      col("bmp_meta.height").cast("bigint").as("bmp_h"),
      col("bmp_meta.channels").cast("bigint").as("bmp_ch"),
      round(element_at(col("bmp_f"), 1), 6).as("bmp_mean_r"),
      round(element_at(col("bmp_f"), 2), 6).as("bmp_mean_g"),
      round(element_at(col("bmp_f"), 3), 6).as("bmp_mean_b"),
      round(element_at(col("bmp_f"), 4), 6).as("bmp_std_r"),
      round(element_at(col("bmp_f"), 5), 6).as("bmp_std_g"),
      round(element_at(col("bmp_f"), 6), 6).as("bmp_std_b"),
      col("gif_meta.format").as("gif_format"),
      col("gif_meta.width").cast("bigint").as("gif_w"),
      col("gif_meta.height").cast("bigint").as("gif_h"),
      round(element_at(col("gif_f"), 1), 6).as("gif_mean"),
      round(element_at(col("gif_f"), 2), 6).as("gif_std"))
      .orderBy(col("doc_id"))
  }
}
