package graft.walk

import java.io.{BufferedInputStream, FileInputStream, InputStream, PrintStream}

/** Standalone `strings` CLI face (reference:
  * crates/extract-strings/src/bin/strings.rs:1-17): print every ASCII
  * run of >= `minLength` (default 10, the reference's choice) in the
  * file, then a `Total strings: N` line. Pure stream utility — no
  * Spark session. The distributed faces of the same algorithm are the
  * `extract_strings` SQL function (q59) and the walker's
  * executable-strings path (P3).
  */
object StringsMain {

  /** Testable core: stream in, lines out, returns the string count. */
  def run(in: InputStream, out: PrintStream, minLength: Int): Long = {
    var total = 0L
    val it = AsciiStrings.iterate(in, minLength)
    while (it.hasNext) { out.println(it.next()); total += 1 }
    out.println(s"Total strings: $total")
    out.flush()
    total
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.walk.StringsMain PATH [minLength]")
      sys.exit(2)
    }
    val minLength = if (args.length > 1) args(1).toInt else 10
    val in = new BufferedInputStream(new FileInputStream(args(0)), 256 * 1024)
    try run(in, System.out, minLength) finally in.close()
  }
}
