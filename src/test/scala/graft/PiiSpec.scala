package graft

import graft.functions.PiiHelper
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** [[PiiHelper]] at the expression layer (no Spark session): the four
  * category specs, every documented near-miss boundary, precedence,
  * fuzz (never throws; placeholder counts always reconcile), and the
  * linearity budget over pathological separator soup.
  */
class PiiSpec extends AnyFunSuite {

  private def redact(s: String): (String, Long, Long, Long, Long) = {
    val r = PiiHelper.redact(UTF8String.fromString(s))
    (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }
  private def clean(s: String): String = redact(s)._1

  test("email: matches and TLD/label near-misses") {
    assert(redact("mail a.b-c%d+e@sub.ex-1.org now") ==
      ("mail <EMAIL> now", 1L, 0L, 0L, 0L))
    assert(clean("x@y.z stays") == "x@y.z stays") // 1-char TLD
    assert(clean("bad@host stays") == "bad@host stays") // one label
    assert(clean("a@b.c2 stays") == "a@b.c2 stays") // digit in TLD
    assert(clean("u@ex.org.") == "<EMAIL>.") // trailing dot not consumed
    assert(clean("price+tax@9.99 stays") == "price+tax@9.99 stays")
    assert(clean("u@ex.org,v@ex.org") == "<EMAIL>,<EMAIL>")
  }

  test("ipv4: octet range, boundaries, trailing-dot strip") {
    assert(redact("ping 192.168.0.1 ok") == ("ping <IP> ok", 0L, 1L, 0L, 0L))
    assert(clean("at 8.8.8.8.") == "at <IP>.") // sentence end
    assert(clean("v1.2.3.4 stays") == "v1.2.3.4 stays") // letter prefix
    assert(clean("1.2.3.4x stays") == "1.2.3.4x stays") // letter suffix
    assert(clean("1.2.3.4.5 stays") == "1.2.3.4.5 stays") // five octets
    assert(clean("300.1.1.1 stays") == "300.1.1.1 stays") // octet > 255
    assert(clean("1.2.3 stays") == "1.2.3 stays") // three octets
    assert(clean("255.255.255.255!") == "<IP>!")
  }

  test("phone: formats, digit floor/ceiling, boundaries") {
    assert(redact("call +1 555-010-1234 now") == ("call <PHONE> now", 0L, 0L, 1L, 0L))
    assert(clean("(555) 123-4567!") == "<PHONE>!")
    assert(clean("5551234567") == "<PHONE>") // bare 10 digits
    assert(clean("20260815 stays") == "20260815 stays") // 8 < floor
    assert(clean("1234567890123456 stays") == "1234567890123456 stays") // 16 > ceil... but KEY? no letters -> stays
    assert(clean("555-123-4567x stays") == "555-123-4567x stays") // alnum tail
    assert(clean("555.123.4567 stays") == "555.123.4567 stays") // '.' not a separator
    assert(clean("a555-123-4567 stays") == "a555-123-4567 stays") // alnum head
    // shortest-valid-match: two adjacent numbers are two matches, not
    // one rejected 20-digit soup
    assert(redact("555-010-1234 867-530-9999") ==
      ("<PHONE> <PHONE>", 0L, 0L, 2L, 0L))
  }

  test("phone: date+time shape guard (4-2-2 leading groups)") {
    // "YYYY-MM-DD HH:MM" reaches 10 digits with valid separators and
    // previously redacted to "<PHONE>:30" — the 4-2-2 guard keeps it
    assert(clean("2026-08-15 14:30 deploy") == "2026-08-15 14:30 deploy")
    assert(clean("logged 2026-08-15 14:30:45Z") == "logged 2026-08-15 14:30:45Z")
    assert(clean("2026-08-15 14") == "2026-08-15 14") // bare date+hour-ish
    // a literal '+' marks an international number — exempt from the guard
    assert(clean("+4912 34 56 789") == "<PHONE>")
    // after a 4-2-2 rejection the scanner resumes PAST the rejected
    // span: an interior restart at "08-15 …" is no longer 4-2-2-led
    // and used to partially redact these (compact and space-separated
    // time shapes have no ':' to break the separator chain)
    assert(clean("2026-08-15 143000 build") == "2026-08-15 143000 build")
    assert(clean("2026-08-15 14 30 55 done") == "2026-08-15 14 30 55 done")
    // fuzz: no timestamp of any common shape ever redacts — time part
    // drawn from HH:MM[:SS], compact HHMMSS and space-separated forms
    val rnd = new scala.util.Random(41)
    (0 until 500).foreach { _ =>
      val y = 1900 + rnd.nextInt(200); val mo = 1 + rnd.nextInt(12)
      val da = 1 + rnd.nextInt(28); val h = rnd.nextInt(24)
      val mi = rnd.nextInt(60); val se = rnd.nextInt(60)
      val sep = if (rnd.nextBoolean()) "-" else " "
      val time = rnd.nextInt(3) match {
        case 0 => f"$h%02d:$mi%02d" + (if (rnd.nextBoolean()) f":$se%02d" else "")
        case 1 => f"$h%02d$mi%02d" + (if (rnd.nextBoolean()) f"$se%02d" else "")
        case _ => f"$h%02d $mi%02d" + (if (rnd.nextBoolean()) f" $se%02d" else "")
      }
      val ts = f"$y%04d$sep$mo%02d$sep$da%02d $time" +
        (if (rnd.nextBoolean()) "Z" else "")
      val in = s"deployed at $ts by ops"
      assert(clean(in) == in, s"timestamp eaten: $ts -> ${clean(in)}")
    }
    // a 4-digit-led trunk form with a non-2-digit third group still
    // redacts (shortest-match ends at the first boundary past the floor)
    assert(clean("0044 20 7946") == "<PHONE>")
    // NANP 3-3-4 grouping untouched by the guard
    assert(clean("555-010-1234") == "<PHONE>")
    // r15 ADVICE: the rejection sentinel ends at the START of the
    // trailing open digit group, so PII that follows a date gets its
    // own fresh match attempt instead of being swallowed into the
    // copied span (the leading IP octet / phone group used to ride
    // inside the rejected span and the rest leaked unredacted)
    assert(redact("deployed 2026-08-15 192.168.1.1") ==
      ("deployed 2026-08-15 <IP>", 0L, 1L, 0L, 0L))
    assert(redact("2026-08-15 10.0.0.200 up") ==
      ("2026-08-15 <IP> up", 0L, 1L, 0L, 0L))
    assert(redact("2026-08-15 555 123 4567") ==
      ("2026-08-15 <PHONE>", 0L, 0L, 1L, 0L))
    assert(redact("at 2026-08-15 555-123-4567 call") ==
      ("at 2026-08-15 <PHONE> call", 0L, 0L, 1L, 0L))
    // fuzz: <date> <ip> and <date> <phone> — the tail ALWAYS redacts
    (0 until 300).foreach { _ =>
      val y = 1900 + rnd.nextInt(200); val mo = 1 + rnd.nextInt(12)
      val da = 1 + rnd.nextInt(28)
      val sep = if (rnd.nextBoolean()) "-" else " "
      val date = f"$y%04d$sep$mo%02d$sep$da%02d"
      val ip = s"${rnd.nextInt(256)}.${rnd.nextInt(256)}" +
        s".${rnd.nextInt(256)}.${rnd.nextInt(256)}"
      assert(clean(s"$date $ip") == s"$date <IP>",
        s"$date $ip -> ${clean(s"$date $ip")}")
      val ph = s"${100 + rnd.nextInt(900)} ${100 + rnd.nextInt(900)} " +
        s"${1000 + rnd.nextInt(9000)}"
      assert(clean(s"$date $ph") == s"$date <PHONE>",
        s"$date $ph -> ${clean(s"$date $ph")}")
    }
  }

  test("key: length gate and letter+digit requirement") {
    val hex = "d3adb33f" * 4 // 32 chars, letters+digits
    assert(redact(s"sk $hex ok") == ("sk <KEY> ok", 0L, 0L, 0L, 1L))
    assert(clean("x" + "9" * 31) == "<KEY>") // 32: one letter, 31 digits
    assert(clean("x" * 40 + " stays") == "x" * 40 + " stays") // no digit
    assert(clean("deadbeef" * 4 + " stays") ==
      "deadbeef" * 4 + " stays") // hex that happens to be all-letter
    assert(clean("1" * 40 + " stays") == "1" * 40 + " stays") // no letter (and phone > 15 digits)
    assert(clean("d3adb33f1234567d3adb33f1234567a stays") ==
      "d3adb33f1234567d3adb33f1234567a stays") // 31 < gate
  }

  test("precedence: email over phone-like local, ip over phone-like octets") {
    // the local part alone would be a 10-digit phone; email wins
    assert(redact("555-1234567u@ex.org") == ("<EMAIL>", 1L, 0L, 0L, 0L))
    // dotted octets are not phone separators, and the run is an IP
    assert(redact("192.168.100.200") == ("<IP>", 0L, 1L, 0L, 0L))
    // a 32+ alnum local followed by a domain is an email, not a key
    val local = "a1" * 16
    assert(redact(s"$local@ex.org") == ("<EMAIL>", 1L, 0L, 0L, 0L))
  }

  test("non-ASCII passes through verbatim") {
    val s = "héllo 日本語 🌍 u@ex.org фон"
    assert(redact(s) == ("héllo 日本語 🌍 <EMAIL> фон", 1L, 0L, 0L, 0L))
  }

  test("fuzz: never throws; placeholder counts reconcile") {
    val rnd = new scala.util.Random(127)
    val atoms = Seq("u@ex.org", "@", ".", "-", "+", "(", ")", " ", "a", "1",
      "192.168.0.1", "555", "0123456789", "deadbeef" * 4, "x@y.z", "é",
      "<", ">", "EMAIL", "300.1.1.1", "+1 555-010-1234")
    (1 to 2000).foreach { _ =>
      val soup = (1 to rnd.nextInt(30)).map(_ => atoms(rnd.nextInt(atoms.size))).mkString
      val (c, ne, nip, np, nk) = redact(soup) // must not throw
      def occ(m: String): Long = {
        var i = 0; var n = 0L
        while ({ i = c.indexOf(m, i); i >= 0 }) { n += 1; i += m.length }
        n
      }
      // every reported match corresponds to one emitted placeholder
      // (placeholder text can also arrive verbatim via the <,EMAIL,>
      // atoms, so emitted occurrences can only exceed the counters)
      assert(occ("<EMAIL>") >= ne && occ("<IP>") >= nip &&
        occ("<PHONE>") >= np && occ("<KEY>") >= nk, s"soup: $soup -> $c")
    }
  }

  test("pathological separator soup stays linear (bounded phone scan)") {
    val s = ("1 " * 200000) + ("((" * 100000)
    val t0 = System.nanoTime()
    val (_, _, _, np, _) = redact(s)
    val secs = (System.nanoTime() - t0) / 1e9
    // spaced single digits accumulate to valid 15-digit prefixes —
    // they redact (documented spec), in linear time
    assert(np > 1000L)
    assert(secs < 5.0, s"quadratic rescan? took $secs s")
  }
}
