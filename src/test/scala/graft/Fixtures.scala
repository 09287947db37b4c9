package graft

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.commons.compress.archivers.zip.{ZipArchiveEntry, ZipArchiveOutputStream}
import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
import org.apache.commons.compress.compressors.xz.XZCompressorOutputStream
import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

/** In-memory archive/codec fixture builders — the Scala port of the
  * reference's test helpers (reference: src/anyreader/test.rs:15-62).
  * No binaries are checked in; everything is generated from
  * (path, bytes) pairs.
  */
object Fixtures {
  val TestData: Array[Byte] = "hello world".getBytes("UTF-8")

  def gzipData(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(data); gz.close()
    bos.toByteArray
  }

  def zstdData(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(bos)
    z.write(data); z.close()
    bos.toByteArray
  }

  def bz2Data(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val b = new BZip2CompressorOutputStream(bos)
    b.write(data); b.close()
    bos.toByteArray
  }

  def xzData(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val x = new XZCompressorOutputStream(bos)
    x.write(data); x.close()
    bos.toByteArray
  }

  def tarArchive(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val tar = new TarArchiveOutputStream(bos)
    tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_GNU)
    entries.foreach { case (path, data) =>
      val e = new TarArchiveEntry(path)
      e.setSize(data.length.toLong)
      tar.putArchiveEntry(e)
      tar.write(data)
      tar.closeArchiveEntry()
    }
    tar.close()
    bos.toByteArray
  }

  def zipArchive(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zip = new ZipArchiveOutputStream(bos)
    entries.foreach { case (path, data) =>
      val e = new ZipArchiveEntry(path)
      e.setSize(data.length.toLong)
      zip.putArchiveEntry(e)
      zip.write(data)
      zip.closeArchiveEntry()
    }
    zip.close()
    bos.toByteArray
  }

  /** Minimal ISO 28500 WARC: one record per (extra headers, body);
    * the version line, Content-Length, and the two inter-record
    * CRLFs are supplied here.
    */
  def warcArchive(records: Seq[(Seq[(String, String)], Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { case (hdrs, body) =>
      val sb = new StringBuilder("WARC/1.0\r\n")
      hdrs.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
      sb.append(s"Content-Length: ${body.length}\r\n\r\n")
      out.write(sb.toString.getBytes("UTF-8"))
      out.write(body)
      out.write("\r\n\r\n".getBytes("UTF-8"))
    }
    out.toByteArray
  }

  def sha256(data: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(data)

  def sha256Hex(data: Array[Byte]): String =
    sha256(data).map(b => f"${b & 0xff}%02x").mkString

  /** A minimal fake ELF: magic + NULs + embedded ASCII runs. */
  def fakeElf(strings: Seq[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(Array[Byte](0x7f, 'E'.toByte, 'L'.toByte, 'F'.toByte))
    strings.foreach { s =>
      bos.write(Array[Byte](0, 1, 2)) // non-text separators
      bos.write(s.getBytes("UTF-8"))
    }
    bos.write(Array[Byte](0, 0))
    bos.toByteArray
  }
}
