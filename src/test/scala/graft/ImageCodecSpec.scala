package graft

import graft.ops.MultiModal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Golden tests for the REAL javax.imageio codec behind
  * `MultiModal.withDecodedImageMeta` / `decodedImageFeatures`: the
  * fixture bytes are genuine PNG / JPEG streams produced by the JDK's
  * own encoders, so the decode path (header metadata + raster stats)
  * is exercised on real image formats, not the deterministic stub.
  */
class ImageCodecSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("ImageCodecSpec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Solid-color w×h TYPE_INT_RGB image encoded with the JDK encoder. */
  private def encode(fmt: String, w: Int, h: Int, rgb: (Int, Int, Int)): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val (r, g, b) = rgb
    val px = (r << 16) | (g << 8) | b
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK has no $fmt writer")
    bos.toByteArray
  }

  /** Two-tone image (left half c1, right half c2) for non-zero std. */
  private def encodeTwoTone(fmt: String, w: Int, h: Int, c1: Int, c2: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = if (x < w / 2) c1 else c2
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK has no $fmt writer")
    bos.toByteArray
  }

  test("real codec: PNG header meta is exact (width/height/channels)") {
    val png = encode("png", 8, 4, (10, 100, 200))
    // sanity: these are real PNG bytes (magic)
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val m = MultiModal.ImageCodec.decodeMeta(png).get
    assert(m.format == "png")
    assert(m.width == 8 && m.height == 4)
    assert(m.channels == 3)
  }

  test("real codec: PNG pixel features are exact (lossless)") {
    val png = encode("png", 8, 4, (10, 100, 200))
    val (meta, means, stds) = MultiModal.ImageCodec.decodeStats(png).get
    assert(meta.width == 8 && meta.height == 4 && meta.channels == 3)
    // raster band order for RGB is R,G,B; solid color => exact means, zero std
    assert(means.toSeq == Seq(10.0, 100.0, 200.0))
    assert(stds.forall(_ == 0.0))
  }

  test("real codec: JPEG meta exact, features within lossy tolerance") {
    val jpg = encode("jpeg", 16, 9, (128, 64, 32))
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8) // SOI marker
    val m = MultiModal.ImageCodec.decodeMeta(jpg).get
    assert(m.format.contains("jpeg"))
    assert(m.width == 16 && m.height == 9)
    assert(m.channels == 3)
    val (_, means, _) = MultiModal.ImageCodec.decodeStats(jpg).get
    val expect = Seq(128.0, 64.0, 32.0)
    means.zip(expect).foreach { case (got, want) =>
      assert(math.abs(got - want) <= 4.0, s"JPEG mean $got vs $want drifted > 4")
    }
  }

  test("real codec: two-tone PNG has the analytic std") {
    // half 40, half 120 => mean 80, std 40 exactly, every band
    val png = encodeTwoTone("png", 10, 6, 40, 120)
    val (_, means, stds) = MultiModal.ImageCodec.decodeStats(png).get
    assert(means.forall(_ == 80.0))
    assert(stds.forall(s => math.abs(s - 40.0) < 1e-9))
  }

  test("real codec: GIF meta + indexed-raster features (crawl-format coverage)") {
    // GIF: palette-indexed — the raster carries ONE band of palette
    // indices, and a solid-color image has zero variance in it
    val gif = encode("gif", 12, 5, (10, 100, 200))
    assert(gif(0) == 'G' && gif(1) == 'I' && gif(2) == 'F' && gif(3) == '8')
    val m = MultiModal.ImageCodec.decodeMeta(gif).get
    assert(m.format == "gif")
    assert(m.width == 12 && m.height == 5)
    val (ms, means, stds) = MultiModal.ImageCodec.decodeStats(gif).get
    assert(ms.width == 12 && ms.height == 5)
    assert(means.length == stds.length && means.nonEmpty)
    assert(stds.forall(_ == 0.0)) // solid color: every band constant
  }

  test("real codec: BMP meta + exact features (crawl-format coverage)") {
    // BMP: uncompressed — gray 100 lands exactly on every band
    val bmp = encode("bmp", 9, 6, (100, 100, 100))
    assert(bmp(0) == 'B' && bmp(1) == 'M')
    val m = MultiModal.ImageCodec.decodeMeta(bmp).get
    assert(m.format == "bmp")
    assert(m.width == 9 && m.height == 6 && m.channels == 3)
    val (_, means, stds) = MultiModal.ImageCodec.decodeStats(bmp).get
    assert(means.length == 3)
    assert(means.forall(_ == 100.0))
    assert(stds.forall(_ == 0.0))
    // two-tone BMP: lossless, so the analytic mean/std are exact
    val tt = encodeTwoTone("bmp", 8, 4, 40, 200)
    val (_, m2, s2) = MultiModal.ImageCodec.decodeStats(tt).get
    assert(m2.forall(_ == 120.0))
    assert(s2.forall(_ == 80.0))
  }

  test("hand-rolled bmp24: exact R/G/B bands through the real decoder (q123 builder)") {
    // spec arithmetic straight to container bytes, no encoder in the
    // loop; width 9 exercises the 4-byte row-padding path
    for ((w, h) <- Seq((16, 6), (9, 5))) {
      val bmp = MultiModal.bmp24(w, h, (x, y) =>
        (((x * 3 + y * 5) % 256) << 16) | (((x * 7 + y) % 256) << 8) | ((x + y * 11) % 256))
      val m = MultiModal.ImageCodec.decodeMeta(bmp).get
      assert(m.format == "bmp" && m.width == w && m.height == h && m.channels == 3)
      val (_, means, stds) = MultiModal.ImageCodec.decodeStats(bmp).get
      def stats(f: (Int, Int) => Int): (Double, Double) = {
        val vs = for (y <- 0 until h; x <- 0 until w) yield f(x, y).toDouble
        val mean = vs.sum / vs.size
        (mean, math.sqrt(vs.map(v => v * v).sum / vs.size - mean * mean))
      }
      val expect = Seq(
        stats((x, y) => (x * 3 + y * 5) % 256),
        stats((x, y) => (x * 7 + y) % 256),
        stats((x, y) => (x + y * 11) % 256))
      assert(means.toSeq == expect.map(_._1), s"${w}x$h means")
      assert(stds.toSeq == expect.map(_._2), s"${w}x$h stds")
    }
  }

  test("hand-rolled gifGray: palette indices survive the real LZW decode (q123 builder)") {
    // small image + one crossing the 250-code Clear boundary many times
    for ((w, h) <- Seq((12, 7), (64, 48))) {
      val gif = MultiModal.gifGray(w, h, (x, y) => (x * 3 + y * 7 + 5) % 256)
      assert(gif(0) == 'G' && gif(1) == 'I' && gif(2) == 'F')
      val m = MultiModal.ImageCodec.decodeMeta(gif).get
      assert(m.format == "gif" && m.width == w && m.height == h)
      val (sm, means, stds) = MultiModal.ImageCodec.decodeStats(gif).get
      assert(sm.channels == 1, "indexed raster carries ONE band of palette indices")
      val vs = for (y <- 0 until h; x <- 0 until w) yield ((x * 3 + y * 7 + 5) % 256).toDouble
      val mean = vs.sum / vs.size
      assert(means.toSeq == Seq(mean), s"${w}x$h mean")
      assert(stds.toSeq == Seq(math.sqrt(vs.map(v => v * v).sum / vs.size - mean * mean)),
        s"${w}x$h std")
    }
  }

  test("real codec: undecodable bytes yield None, not an exception") {
    assert(MultiModal.ImageCodec.decodeMeta(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(MultiModal.ImageCodec.decodeStats(Array.fill[Byte](64)(42)).isEmpty)
    assert(MultiModal.ImageCodec.decodeMeta(Array.empty[Byte]).isEmpty)
    // truncated PNG: valid magic, garbage after
    val broken = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 0, 0)
    assert(MultiModal.ImageCodec.decodeStats(broken).isEmpty)
  }

  test("dataframe plumbing: withDecodedImageMeta + decodedImageFeatures over mixed rows") {
    import spark.implicits._
    val png = encode("png", 8, 4, (10, 100, 200))
    val jpg = encode("jpeg", 16, 9, (128, 64, 32))
    val garbage = Array.fill[Byte](512)(7)
    val df = Seq((1L, png), (2L, jpg), (3L, garbage)).toDF("id", "bytes")

    val meta = MultiModal.withDecodedImageMeta(df, "bytes").orderBy("id")
      .select("id", "meta.format", "meta.width", "meta.height", "meta.channels", "meta.n_bytes")
    val rows = meta.collect()
    assert(rows(0).getString(1) == "png" && rows(0).getInt(2) == 8 && rows(0).getInt(3) == 4)
    assert(rows(0).getLong(5) == png.length.toLong)
    assert(rows(1).getString(1).contains("jpeg") && rows(1).getInt(2) == 16 && rows(1).getInt(3) == 9)

    // garbage row: whole struct is null
    val g = MultiModal.withDecodedImageMeta(df, "bytes")
      .where(col("id") === 3).select("meta").head()
    assert(g.isNullAt(0))

    val feats = MultiModal.decodedImageFeatures(df, "bytes").orderBy("id").select("features").collect()
    val fPng = feats(0).getSeq[Double](0)
    assert(fPng.length == 7) // 3 means + 3 stds + log1p(len)
    assert(fPng.take(3) == Seq(10.0, 100.0, 200.0))
    assert(fPng.slice(3, 6).forall(_ == 0.0))
    assert(math.abs(fPng(6) - math.log1p(png.length.toDouble)) < 1e-12)
    assert(feats(2).isNullAt(0))
  }
}
