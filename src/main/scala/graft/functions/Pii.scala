package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PII detection + redaction for training-corpus preparation — the
  * safety-filtering stage every published web-scale pipeline runs
  * before tokenization (emails / IP addresses / phone numbers /
  * secret-looking keys replaced by typed placeholders, per-category
  * counts kept for corpus accounting).
  *
  * The single-pass, counting upgrade of [[TextStats.scrubPii]] (q62's
  * three-regex composition): one scan instead of three rewrites, a
  * KEY category the regex face lacks, per-category counts for corpus
  * accounting, and boundary rules precise enough to state near-miss
  * guarantees (below).
  *
  * One deterministic left-to-right pass, hand-rolled scanners (no
  * regex — identical semantics under any engine, no catastrophic
  * backtracking). At each position the candidates are tried in fixed
  * precedence EMAIL > IPV4 > PHONE > KEY (an email wins over the
  * phone-like digits of its local part; an IPv4 wins over the
  * phone-like digit count of its octets); a failed candidate consumes
  * nothing. The matched span is replaced by `<EMAIL>` / `<IP>` /
  * `<PHONE>` / `<KEY>`.
  *
  * The restricted, documented match specs (deliberately conservative —
  * a redactor's false positive destroys real text):
  *
  *   - EMAIL: `local@label(.label)+` — local is 1+ of
  *     `[A-Za-z0-9._%+-]` starting at a non-local boundary; labels are
  *     1+ of `[A-Za-z0-9-]`; 2+ labels; the final label (the TLD) is
  *     ASCII letters only, length >= 2 (`x@y.z`, `bad@host` stay).
  *   - IPV4: a maximal digit/dot run (trailing dots dropped) that
  *     parses as exactly 4 octets of 1-3 digits each <= 255, starting
  *     at a boundary that is neither alphanumeric nor `.`, and not
  *     followed by an ASCII letter (`v1.2.3.4`, `1.2.3.4.5`,
  *     `300.1.1.1` stay; `8.8.8.8.` at sentence end redacts).
  *   - PHONE: optional `+`, then 9-15 digits with single-or-double
  *     separators from `space - ( )` (NOT `.` — dotted runs are
  *     IP/version territory), at an alphanumeric-free left boundary,
  *     ending on a digit not followed by an alphanumeric; shortest
  *     valid match, see [[PiiHelper.tryPhone]]
  *     (`+1 555-0123-4567`, `(555) 123-4567` redact; a date alone
  *     and 8-digit build numbers stay under the 9-digit floor, and a
  *     `+`-less candidate whose three leading digit groups are
  *     exactly 4-2-2 — the `YYYY-MM-DD HH:MM` shape ubiquitous in
  *     crawl/log text — is rejected even past the floor).
  *   - KEY: a maximal `[A-Za-z0-9]` run, length >= 32, containing at
  *     least one letter AND one digit (hex digests, API tokens;
  *     a 40-char all-letter word stays).
  *
  * Scale: pure per-row scalar inside whole-stage codegen; every
  * candidate scan is bounded (the phone scan aborts past 16 digits),
  * so the whole pass is O(n) — PiiSpec holds a linearity budget over
  * pathological separator soup. Never throws; non-ASCII characters
  * are copied verbatim (multi-byte text can't enter any candidate
  * class).
  */
object PiiHelper {

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isAlnum(c: Char): Boolean = isDigit(c) || isAsciiLetter(c)
  private def isLocal(c: Char): Boolean =
    isAlnum(c) || c == '.' || c == '_' || c == '%' || c == '+' || c == '-'
  private def isLabel(c: Char): Boolean = isAlnum(c) || c == '-'
  private def isPhoneSep(c: Char): Boolean =
    c == ' ' || c == '-' || c == '(' || c == ')'

  /** End (exclusive) of an email starting at `i`, or -1. */
  private def tryEmail(s: String, i: Int): Int = {
    val n = s.length
    if (!isLocal(s.charAt(i))) return -1
    if (i > 0 && isLocal(s.charAt(i - 1))) return -1 // mid-run start
    var j = i
    while (j < n && isLocal(s.charAt(j))) j += 1
    if (j == i || j >= n || s.charAt(j) != '@') return -1
    var k = j + 1
    var labels = 0
    var lastStart = k
    var more = true
    while (more) {
      if (k >= n || !isLabel(s.charAt(k))) return -1 // '@'/'.' needs a label
      lastStart = k
      while (k < n && isLabel(s.charAt(k))) k += 1
      labels += 1
      if (k + 1 < n && s.charAt(k) == '.' && isLabel(s.charAt(k + 1))) k += 1
      else more = false
    }
    var t = lastStart
    while (t < k && isAsciiLetter(s.charAt(t))) t += 1
    if (labels >= 2 && t == k && k - lastStart >= 2) k else -1
  }

  /** End (exclusive) of an IPv4 literal starting at `i`, or -1. */
  private def tryIp(s: String, i: Int): Int = {
    val n = s.length
    if (!isDigit(s.charAt(i))) return -1
    if (i > 0) {
      val p = s.charAt(i - 1)
      if (isAlnum(p) || p == '.') return -1
    }
    var j = i
    while (j < n && (isDigit(s.charAt(j)) || s.charAt(j) == '.')) j += 1
    if (j < n && isAsciiLetter(s.charAt(j))) return -1 // "1.2.3.4x"
    var end = j
    while (end > i && s.charAt(end - 1) == '.') end -= 1
    // exactly 4 octets, each 1-3 digits <= 255
    var k = i
    var octets = 0
    while (k < end) {
      val start = k
      var v = 0
      while (k < end && isDigit(s.charAt(k))) { v = v * 10 + (s.charAt(k) - '0'); k += 1 }
      val len = k - start
      if (len < 1 || len > 3 || v > 255) return -1
      octets += 1
      if (k < end) {
        if (s.charAt(k) != '.') return -1
        k += 1
        if (k == end) return -1 // can't happen (trailing dots stripped)
      }
    }
    if (octets == 4) end else -1
  }

  /** End (exclusive) of a phone number starting at `i`, or -1, or a
    * DATE-REJECTION sentinel `-(end) - 2` (see below).
    * Shortest-valid-match (non-greedy) semantics: the match ends at
    * the FIRST digit where the cumulative digit count has reached
    * [9, 15] and the next char is not alphanumeric (i.e. the first
    * digit-group boundary past the floor). Intra-group digits never
    * qualify (they're followed by digits), so a multi-group number
    * matches whole — and two adjacent phone numbers separated by one
    * space split correctly into two matches instead of being rejected
    * as one 20-digit soup, while a contiguous 16-digit run still
    * stays. The scan aborts past 16 digits, bounding every attempt.
    *
    * Date+time guard: a `+`-less candidate whose first three digit
    * groups are exactly 4, 2 and 2 digits is rejected — that is the
    * `YYYY-MM-DD HH[:MM]` shape ("2026-08-15 14:30" reaches 10 digits
    * with valid separators and would otherwise redact to "<PHONE>:30").
    * International numbers written with a literal `+` are exempt, and
    * no common national format leads 4-2-2 (NANP groups 3-3-4; a
    * 4-digit-led trunk form like "0044 20 7946 0958" has a 4-digit
    * third group). The guard trades a rare false negative for never
    * eating timestamps — a redactor's false positive destroys text.
    *
    * A 4-2-2 rejection returns `-(end) - 2` (<= -3, distinguishable
    * from the plain -1) where `end` is the START of the trailing open
    * digit group: the caller must COPY `[i, end)` verbatim and resume
    * AT the open group. The copied prefix holds only the closed
    * 4-2-2 groups and their separators (pure date shape — nothing to
    * redact), while the open group gets a fresh email/IP/phone/key
    * attempt: "2026-08-15 192.168.1.1" resumes at "192..." and the IP
    * still redacts, "2026-08-15 555 123 4567" resumes at the NANP
    * number, and a pure timestamp tail like "143000" or "14:30"
    * matches nothing on retry. Resuming at an INTERIOR group instead
    * would partially redact — "2026-08-15 143000" → "2026-<PHONE>"
    * via a restart at "08" — which is why the sentinel never points
    * inside the closed groups.
    */
  private def tryPhone(s: String, i: Int): Int = {
    val n = s.length
    val c0 = s.charAt(i)
    if (!(c0 == '+' || c0 == '(' || isDigit(c0))) return -1
    if (i > 0 && isAlnum(s.charAt(i - 1))) return -1
    var j = i
    if (c0 == '+') j += 1
    var digits = 0
    var sepRun = 0
    var g1 = 0; var g2 = 0; var g3 = 0 // closed leading group lengths
    var cur = 0                        // open group length
    while (j < n) {
      val c = s.charAt(j)
      if (isDigit(c)) {
        digits += 1
        cur += 1
        if (digits > 16) return -1 // bounded scan
        if (digits >= 9 && digits <= 15 &&
            (j + 1 >= n || !isAlnum(s.charAt(j + 1)))) {
          if (c0 != '+' && g1 == 4 && g2 == 2 && g3 == 2) return -(j + 1 - cur) - 2
          return j + 1
        }
        sepRun = 0
        j += 1
      } else if (isPhoneSep(c) && sepRun < 2) {
        if (cur > 0) {
          if (g1 == 0) g1 = cur else if (g2 == 0) g2 = cur
          else if (g3 == 0) g3 = cur
          cur = 0
        }
        sepRun += 1
        j += 1
      } else return -1
    }
    -1
  }

  /** End (exclusive) of a secret-looking key starting at `i`, or -1. */
  private def tryKey(s: String, i: Int): Int = {
    val n = s.length
    if (!isAlnum(s.charAt(i))) return -1
    if (i > 0 && isAlnum(s.charAt(i - 1))) return -1
    var j = i
    var letters = 0
    var digits = 0
    while (j < n && isAlnum(s.charAt(j))) {
      if (isDigit(s.charAt(j))) digits += 1 else letters += 1
      j += 1
    }
    if (j - i >= 32 && letters > 0 && digits > 0) j else -1
  }

  def redact(u: UTF8String): InternalRow = {
    val s = u.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var email = 0L; var ip = 0L; var phone = 0L; var key = 0L
    var i = 0
    while (i < n) {
      var e = tryEmail(s, i)
      if (e >= 0) { out.append("<EMAIL>"); email += 1; i = e }
      else {
        e = tryIp(s, i)
        if (e >= 0) { out.append("<IP>"); ip += 1; i = e }
        else {
          e = tryPhone(s, i)
          if (e >= 0) { out.append("<PHONE>"); phone += 1; i = e }
          else if (e <= -3) {
            // 4-2-2 date rejection: copy the closed date groups
            // verbatim and resume AT the trailing open digit group so
            // a following IP/phone/etc. still gets its own attempt
            // (see tryPhone's scaladoc)
            val end = -e - 2
            out.append(s, i, end)
            i = end
          } else {
            e = tryKey(s, i)
            if (e >= 0) { out.append("<KEY>"); key += 1; i = e }
            else { out.append(s.charAt(i)); i += 1 }
          }
        }
      }
    }
    InternalRow(UTF8String.fromString(out.toString), email, ip, phone, key)
  }
}

/** `redact_pii(text) -> struct<clean, n_email, n_ip, n_phone, n_key>`
  * — see [[PiiHelper]]. Codegen'd single pass, never throws.
  */
case class RedactPii(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n_email", LongType, nullable = false),
    StructField("n_ip", LongType, nullable = false),
    StructField("n_phone", LongType, nullable = false),
    StructField("n_key", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "redact_pii"
  override protected def nullSafeEval(input: Any): Any =
    PiiHelper.redact(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiHelper.redact($c)")
  override protected def withNewChildInternal(newChild: Expression): RedactPii =
    copy(child = newChild)
}
