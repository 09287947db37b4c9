package graft

/** Throwaway isolation probe for the 7z COPY-method checksum failure
  * seen in the sevenz ScaleEvidence rung: writes members of random
  * bytes with either COPY or LZMA2, reads them back three ways
  * (SevenZFile.read, getInputStream, and the walker), and reports
  * which combination breaks.
  */
object SevenZProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.commons.compress.archivers.sevenz._
    val members = 4
    val size = 256 * 1024
    for (method <- Seq(SevenZMethod.COPY, SevenZMethod.LZMA2)) {
      val f = java.io.File.createTempFile("probe-", ".7z")
      val out = new SevenZOutputFile(f)
      out.setContentMethods(java.util.List.of(new SevenZMethodConfiguration(method)))
      val rnd = new java.util.Random(42)
      val expect = (0 until members).map { i =>
        val buf = new Array[Byte](size)
        rnd.nextBytes(buf)
        val e = new SevenZArchiveEntry()
        e.setName(s"m$i.bin")
        out.putArchiveEntry(e); out.write(buf); out.closeArchiveEntry()
        java.util.Arrays.hashCode(buf)
      }
      out.close()

      def check(label: String)(readEntry: (SevenZFile, SevenZArchiveEntry) => Array[Byte]): Unit = {
        val sz = SevenZFile.builder().setFile(f).get()
        try {
          var i = 0
          var e = sz.getNextEntry
          while (e != null) {
            val got = try Right(readEntry(sz, e)) catch { case ex: Exception => Left(ex) }
            got match {
              case Right(b) =>
                val ok = b.length == size && java.util.Arrays.hashCode(b) == expect(i)
                println(s"[$method/$label] m$i: len=${b.length} match=$ok")
              case Left(ex) =>
                println(s"[$method/$label] m$i: EX ${ex.getClass.getSimpleName}: ${ex.getMessage}")
            }
            i += 1
            e = try sz.getNextEntry catch {
              case ex: Exception => println(s"[$method/$label] next: EX ${ex.getMessage}"); null
            }
          }
        } finally sz.close()
      }

      check("szread") { (sz, _) =>
        val b = new Array[Byte](size + 16)
        var off = 0
        var n = 0
        while (off < b.length && { n = sz.read(b, off, b.length - off); n > 0 }) off += n
        java.util.Arrays.copyOf(b, off)
      }
      check("getInputStream") { (sz, e) =>
        val in = sz.getInputStream(e)
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { if (n > 0) bos.write(buf, 0, n); n = in.read(buf) }
        bos.toByteArray
      }
      f.delete()
    }
  }
}
