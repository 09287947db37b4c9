package graft

import graft.convert.{ArchiveConverter, ProgressReporter}
import graft.core.ConvertOptions
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Live progress reporting (reference src/progress.rs:11-133): the
  * reporter must tick in-flight counter lines while a conversion runs
  * and settle with the final totals.
  */
class ProgressSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("ProgressSpec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("reporter ticks accumulator values and prints settled totals on stop") {
    spark.sparkContext // force init
    val metrics = new ArchiveConverter.WalkMetrics(spark)
    val buf = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(buf, true, "UTF-8")
    val rep = new ProgressReporter(metrics, totalInputs = 3, ps, intervalMs = 20).start()
    metrics.inputs.add(2)
    metrics.entries.add(1234)
    metrics.bytes.add(5L * 1000 * 1000)
    Thread.sleep(200) // several ticks
    metrics.inputs.add(1)
    metrics.errors.add(1)
    rep.stop()
    rep.stop() // idempotent
    val out = buf.toString("UTF-8")
    val lines = out.linesIterator.toVector
    assert(lines.count(_.startsWith("[graft] converting:")) >= 2, out)
    assert(lines.exists(l => l.contains("inputs 2/3") && l.contains("entries 1,234") && l.contains("5.0 MB")), out)
    assert(lines.last.startsWith("[graft] walked:") && lines.last.contains("inputs 3/3")
      && lines.last.contains("1 failed"), out)
    // exactly one settled line, no ticks after stop
    assert(lines.count(_.startsWith("[graft] walked:")) == 1, out)
  }

  test("convert with progress=true surfaces in-flight lines on stderr") {
    import Fixtures._
    val arch = java.io.File.createTempFile("graft_progress", ".tar.gz")
    arch.deleteOnExit()
    val fos = new java.io.FileOutputStream(arch)
    fos.write(gzipData(tarArchive((1 to 20).map(i => s"f$i.txt" -> s"row $i".getBytes("UTF-8")))))
    fos.close()
    val out = java.nio.file.Files.createTempDirectory("graft_progress_out").toString

    val buf = new java.io.ByteArrayOutputStream()
    val realErr = System.err
    System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
    val stats =
      try ArchiveConverter.convert(spark, Seq(arch.getAbsolutePath), out, ConvertOptions(
        progress = true, progressIntervalMs = 10))
      finally System.setErr(realErr)
    assert(stats.rows == 20)
    val err = buf.toString("UTF-8")
    assert(err.linesIterator.exists(_.startsWith("[graft] walked: inputs 1/1")), err)
  }
}
