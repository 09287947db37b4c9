package graft.walk

import java.io.InputStream

/** ASCII-string extraction from binary streams — a `strings(1)` clone
  * mirroring the reference's iterator semantics exactly
  * (reference: crates/extract-strings/src/ascii.rs:5-130):
  *
  *   - a "text" byte is ASCII, non-NUL, non-control (ascii.rs:5-8);
  *   - maximal runs of text bytes are accumulated into a pending
  *     buffer; when a run ends (non-text byte) the buffer is emitted
  *     iff its TOTAL length >= minLength, otherwise it is kept and
  *     the next run appends to it (ascii.rs:95-112 — the pending
  *     buffer is only cleared on emit);
  *   - at end-of-stream the pending buffer is emitted if >= minLength
  *     (ascii.rs:70-81).
  *
  * Note the accumulate-short-runs behavior is deliberate parity with
  * the reference (e.g. minLength=10 over "\0binary\0data\0" emits
  * "binarydata").
  */
object AsciiStrings {

  @inline private def isText(c: Int): Boolean =
    c != 0 && c < 0x80 && !Character.isISOControl(c)

  /** Lazily extract strings from a stream. Single pass, O(bufSize) memory. */
  def iterate(in: InputStream, minLength: Int, bufSize: Int = 8192): Iterator[String] =
    new Iterator[String] {
      private val buf = new Array[Byte](bufSize)
      private var len = 0
      private var pos = 0
      private var eof = false
      private val pending = new java.lang.StringBuilder
      private var ready: String = null

      private def fill(): Unit = {
        len = in.read(buf)
        pos = 0
        if (len < 0) { eof = true; len = 0 }
      }

      private def advance(): Unit = {
        while (ready == null && !eof) {
          if (pos >= len) fill()
          else {
            val c = buf(pos) & 0xff
            pos += 1
            if (isText(c)) pending.append(c.toChar)
            else if (pending.length > 0) {
              if (pending.length >= minLength) {
                ready = pending.toString
              }
              // shorter-than-min runs accumulate (parity: ascii.rs:95-112
              // never clears partial_string below min_length)
              if (ready != null) pending.setLength(0)
            }
          }
        }
        if (ready == null && eof && pending.length >= minLength) {
          ready = pending.toString
          pending.setLength(0)
        } else if (ready == null && eof) {
          pending.setLength(0)
        }
      }

      override def hasNext: Boolean = { advance(); ready != null }
      override def next(): String = {
        advance()
        if (ready == null) throw new NoSuchElementException
        val r = ready; ready = null; r
      }
    }

  def extract(bytes: Array[Byte], minLength: Int): Seq[String] =
    iterate(new java.io.ByteArrayInputStream(bytes), minLength).toVector
}
