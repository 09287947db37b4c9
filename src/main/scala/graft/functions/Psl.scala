package graft.functions

/** Public Suffix List engine backing [[UrlHelper.registeredDomain]].
  *
  * Rules come from a vendored snapshot of the Mozilla Public Suffix
  * List (`resources/graft/public_suffix_list.dat`, MPL-2.0 public
  * data, ~9.5k rules incl. the private section) and are matched with
  * the published publicsuffix.org algorithm:
  *
  *   - a normal rule (`co.uk`) matches a host whose trailing labels
  *     equal the rule;
  *   - a wildcard rule (`*.ck`) matches any host with at least one
  *     label before the rule's tail;
  *   - an exception rule (`!www.ck`) overrides every other match and
  *     declares its own tail (the rule minus its leftmost label) the
  *     public suffix;
  *   - when no rule matches, the prevailing rule is `*` (the bare TLD
  *     is the public suffix);
  *   - the longest matching rule (most labels) prevails among
  *     non-exceptions.
  *
  * The registrable domain (eTLD+1) is the public suffix plus one more
  * label. The private section (`github.io`, `blogspot.com`, S3 bucket
  * suffixes, ...) is INCLUDED: for per-domain quota caps on a web
  * corpus, `alice.github.io` and `bob.github.io` are different
  * publishers and must not share one cap group.
  *
  * Unicode rules (466 in the snapshot) are additionally indexed under
  * their IDN/punycode form, so both `xn--55qx5d.cn` and the raw
  * unicode host match. Matching is a per-suffix hash probe — O(labels)
  * per host, no regex, safe inside whole-stage codegen.
  */
object Psl {

  private val exact = new java.util.HashSet[String](16384)
  private val wildcard = new java.util.HashSet[String](256)
  private val exception = new java.util.HashSet[String](16)

  locally {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "vendored public_suffix_list.dat missing from resources")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().foreach { raw =>
        val line = raw.trim
        if (line.nonEmpty && !line.startsWith("//")) {
          // the PSL format spec reads each line only up to the first
          // whitespace — a refreshed snapshot with trailing annotations
          // must not index bogus rules (r11 ADVICE)
          val rule = line.split("\\s+")(0).toLowerCase(java.util.Locale.ROOT)
          def add(set: java.util.HashSet[String], r: String): Unit = {
            set.add(r)
            // index the punycode form too, so already-IDN-encoded hosts
            // match unicode rules without a decode pass
            try {
              val ascii = java.net.IDN.toASCII(r)
              if (ascii != r) set.add(ascii.toLowerCase(java.util.Locale.ROOT))
            } catch { case _: IllegalArgumentException => () }
          }
          if (rule.startsWith("!")) add(exception, rule.substring(1))
          else if (rule.startsWith("*.")) add(wildcard, rule.substring(2))
          else add(exact, rule)
        }
      }
    } finally src.close()
  }

  /** Number of labels in the public suffix of `labels` (≥ 1; the
    * default rule `*` makes every bare TLD a public suffix). May equal
    * or exceed `labels.length` when the host IS a public suffix.
    */
  def publicSuffixLabels(labels: Array[String]): Int = {
    val n = labels.length
    var best = 1 // default rule `*`
    var suffix: String = null
    var i = n - 1
    while (i >= 0) {
      suffix = if (suffix == null) labels(i) else labels(i) + "." + suffix
      val len = n - i
      // exception prevails over everything: its tail is the suffix
      if (exception.contains(suffix)) return len - 1
      if (exact.contains(suffix) && len > best) best = len
      // `*.X` matches one extra label on top of X
      if (wildcard.contains(suffix) && len + 1 > best) best = len + 1
      i -= 1
    }
    best
  }

  /** eTLD+1 of an already-canonical (lowercase, no trailing dot) host,
    * or the host itself when it has no registrable part (the host IS a
    * public suffix — passthrough keeps the grouping key total).
    */
  def registrableDomain(host: String): String = {
    val labels = host.split('.')
    val ps = publicSuffixLabels(labels)
    if (labels.length <= ps) host
    else {
      // join the last ps+1 labels
      val keep = ps + 1
      val sb = new java.lang.StringBuilder()
      var i = labels.length - keep
      while (i < labels.length) {
        if (sb.length > 0) sb.append('.')
        sb.append(labels(i))
        i += 1
      }
      sb.toString
    }
  }
}
