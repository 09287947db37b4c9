package graft

import graft.ops.MultiModal
import org.scalatest.funsuite.AnyFunSuite

/** The real javax.sound audio codec: WAV metadata + PCM sample stats,
  * AIFF/AU via the JDK's own encoder, and the corrupt-bytes contract.
  */
class AudioCodecSpec extends AnyFunSuite {

  import MultiModal.AudioCodec

  test("wav 8-bit mono: exact analytic mean/rms/peak") {
    // constant signal 200: mean=200, rms=200, peak=200
    val b = MultiModal.wavPcm(1, 8000, 8, Array.fill(1000)(200))
    val meta = AudioCodec.decodeMeta(b).get
    assert(meta.format == "wav" && meta.channels == 1 &&
      meta.sampleRate == 8000 && meta.bits == 8 && meta.frames == 1000L)
    val (m2, means, rms, peak) = AudioCodec.decodeStats(b).get
    assert(m2.frames == 1000L)
    assert(means(0) == 200.0 && rms(0) == 200.0 && peak(0) == 200.0)
  }

  test("wav 16-bit stereo: per-channel separation, signed domain") {
    // ch0 alternates ±1000 (mean 0, rms 1000); ch1 constant -32768
    val n = 500
    val samples = Array.tabulate(n * 2) { k =>
      if (k % 2 == 0) { if ((k / 2) % 2 == 0) 1000 else -1000 }
      else -32768
    }
    val b = MultiModal.wavPcm(2, 16000, 16, samples)
    val meta = AudioCodec.decodeMeta(b).get
    assert(meta.channels == 2 && meta.bits == 16 && meta.frames == n.toLong)
    val (_, means, rms, peak) = AudioCodec.decodeStats(b).get
    assert(means(0) == 0.0 && rms(0) == 1000.0 && peak(0) == 1000.0)
    assert(means(1) == -32768.0 && rms(1) == 32768.0 && peak(1) == 32768.0)
  }

  test("aiff and au via the JDK's own encoder round-trip through decodeMeta") {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, true)
    val pcm = Array.tabulate(400)(i => (math.sin(i * 0.1) * 10000).toInt)
    val raw = new Array[Byte](pcm.length * 2)
    pcm.zipWithIndex.foreach { case (v, i) =>
      raw(2 * i) = ((v >> 8) & 0xFF).toByte // big-endian per fmt
      raw(2 * i + 1) = (v & 0xFF).toByte
    }
    Seq(AudioFileFormat.Type.AIFF -> "aif", AudioFileFormat.Type.AU -> "au")
      .foreach { case (tpe, ext) =>
        val ais = new AudioInputStream(
          new java.io.ByteArrayInputStream(raw), fmt, pcm.length.toLong)
        val bo = new java.io.ByteArrayOutputStream()
        AudioSystem.write(ais, tpe, bo)
        val meta = AudioCodec.decodeMeta(bo.toByteArray).get
        assert(meta.format == ext, s"type $tpe")
        assert(meta.channels == 1 && meta.bits == 16 && meta.frames == 400L)
        val (_, means, rms, peak) = AudioCodec.decodeStats(bo.toByteArray).get
        val exMean = pcm.map(_.toDouble).sum / pcm.length
        val exPeak = pcm.map(v => math.abs(v.toDouble)).max
        assert(math.abs(means(0) - exMean) < 1e-9 && peak(0) == exPeak)
        assert(rms(0) > 0.0)
      }
  }

  test("corrupt, truncated and non-audio bytes decode to None, never throw") {
    assert(AudioCodec.decodeMeta("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(AudioCodec.decodeStats(Array.emptyByteArray).isEmpty)
    val good = MultiModal.wavPcm(1, 8000, 8, Array.fill(100)(1))
    // truncations at every prefix length must not throw
    (0 until good.length by 7).foreach { k =>
      AudioCodec.decodeMeta(java.util.Arrays.copyOf(good, k))
      AudioCodec.decodeStats(java.util.Arrays.copyOf(good, k))
    }
    // header-corrupted variants
    val rnd = new java.util.Random(3)
    (0 until 500).foreach { _ =>
      val b = good.clone()
      b(rnd.nextInt(44)) = rnd.nextInt(256).toByte
      AudioCodec.decodeMeta(b)
      AudioCodec.decodeStats(b)
    }
  }

  test("decodedAudioFeatures plumbing: null array for bad rows, stats for good") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .appName("AudioCodecSpec").getOrCreate()
    try {
      import spark.implicits._
      val good = MultiModal.wavPcm(1, 8000, 8, Array.fill(64)(10))
      val df = Seq((1L, good), (2L, "junk".getBytes("UTF-8")))
        .toDF("id", "bytes")
      val out = MultiModal.decodedAudioFeatures(
        MultiModal.withDecodedAudioMeta(df, "bytes"), "bytes")
        .orderBy("id").collect()
      assert(out(0).getAs[org.apache.spark.sql.Row]("meta")
        .getAs[Int]("sample_rate") == 8000)
      assert(out(0).getSeq[Double](out(0).fieldIndex("features")).take(3) ==
        Seq(10.0, 10.0, 10.0))
      assert(out(1).getAs[org.apache.spark.sql.Row]("meta") == null)
      assert(out(1).getAs[Seq[Double]]("features") == null)
    } finally spark.stop()
  }
}
