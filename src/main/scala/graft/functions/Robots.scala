package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.util.Locale

/** robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol):
  * the admission gate of a crawl pipeline — given a host's robots.txt,
  * a crawler product token and a target path, may the crawler fetch
  * it? Pairs with the link-graph surface ([[HtmlLinkHelper]],
  * [[UrlHelper.resolve]]): extract → resolve → robots-gate → frontier.
  *
  * Semantics implemented (RFC 9309 §2):
  *   - groups: consecutive `User-agent:` lines share the rule block
  *     that follows (§2.2.1); multiple groups matching the same agent
  *     combine (§2.2.1 "MUST be combined");
  *   - group selection: case-insensitive product-token match beats
  *     `*`; a crawler with no matching group and no `*` group may
  *     fetch anything (§2.2.1);
  *   - rule matching: longest-match wins, measured in pattern octets;
  *     on equal length Allow wins over Disallow (§2.2.2);
  *   - `*` matches any octet sequence, `$` anchors the pattern end
  *     (§2.2.3); an empty Disallow value matches nothing;
  *   - unknown directives, comments (`#`) and malformed lines are
  *     ignored (§2.2.4) — never throw on crawl data.
  *
  * Parsing cost at scale: robots.txt count is O(hosts) while path
  * probes are O(edges) — a per-JVM bounded cache keyed on the robots
  * bytes makes the per-row cost a hash probe + rule walk (the
  * [[CharsetHelper]] cache design). The cache is per-executor state,
  * no broadcast, no shuffle, safe inside whole-stage codegen.
  */
object RobotsHelper {

  /** One rule: allow/disallow + its path pattern, pre-split on '*'. */
  private final case class Rule(allow: Boolean, pattern: String,
      segments: Array[String], anchored: Boolean)

  private final case class Group(agents: Array[String], rules: Array[Rule],
      crawlDelay: Double) // NaN = no Crawl-delay line in the group

  /** Parsed form: the groups in file order. */
  private final class Robots(val groups: Array[Group])

  /** Bounded per-JVM parse cache (robots bytes are per-host, probes
    * are per-URL — hit rate is effectively the edge/host ratio).
    */
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Robots](1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Robots]): Boolean = size() > 1000
    })

  private def mkRule(allow: Boolean, value: String): Rule = {
    val anchored = value.endsWith("$")
    val pat = if (anchored) value.dropRight(1) else value
    Rule(allow, value, pat.split("\\*", -1), anchored)
  }

  private def parse(txt: String): Robots = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var delay = Double.NaN
    var inAgents = true // consecutive user-agent lines accumulate
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.toArray, rules.toArray, delay)
      agents = scala.collection.mutable.ArrayBuffer.empty[String]
      rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
      delay = Double.NaN
    }
    txt.split("\r\n|\r|\n", -1).foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) flush()
            inAgents = true
            agents += value.toLowerCase(Locale.ROOT)
          case "allow" | "disallow" =>
            inAgents = false
            // an empty value matches nothing — representable as a
            // rule with an impossible pattern; simplest is to skip
            // the empty Disallow (and an empty Allow adds nothing)
            if (value.nonEmpty && agents.nonEmpty)
              rules += mkRule(key == "allow", value)
          case "crawl-delay" =>
            // de-facto politeness directive (not in RFC 9309 but
            // ubiquitous); group-scoped like rules. Malformed or
            // negative values are ignored; repeated lines keep the
            // LARGEST (the conservative reading).
            inAgents = false
            if (agents.nonEmpty) {
              try {
                val v = value.toDouble
                if (v >= 0 && (delay.isNaN || v > delay)) delay = v
              } catch { case _: NumberFormatException => () }
            }
          case _ => if (agents.nonEmpty) inAgents = false // sitemap etc.
        }
      }
    }
    flush()
    new Robots(groups.toArray)
  }

  private def parsed(txt: String): Robots = {
    val hit = cache.get(txt)
    if (hit != null) hit
    else {
      val r = parse(txt)
      cache.put(txt, r)
      r
    }
  }

  /** Glob match of a pre-split pattern against the path (RFC 9309
    * §2.2.3): pattern matches at path START; '*' spans any octets;
    * '$' requires the match to end at path end.
    */
  private def ruleMatches(r: Rule, path: String): Boolean = {
    val segs = r.segments
    if (!path.startsWith(segs(0))) return false
    var pos = segs(0).length
    var i = 1
    while (i < segs.length) {
      val s = segs(i)
      if (i == segs.length - 1 && r.anchored) {
        // last segment under '$': must match at the very end
        return path.length - pos >= s.length && path.endsWith(s)
      }
      val at = path.indexOf(s, pos)
      if (at < 0) return false
      pos = at + s.length
      i += 1
    }
    if (r.anchored) pos == path.length else true
  }

  /** The crawler's product token, lowercased, stripped of version
    * suffixes (`graftbot/2.1` → `graftbot`).
    */
  private def token(agent: String): String = {
    val a = agent.toLowerCase(Locale.ROOT)
    val slash = a.indexOf('/')
    (if (slash >= 0) a.substring(0, slash) else a).trim
  }

  /** May `agent` fetch `path` under this robots.txt? An empty robots
    * text (the null-coalesced "no robots file" case) restricts
    * nothing — PERMITTED, the protocol's default. Never throws.
    */
  def allowed(robots: UTF8String, agent: UTF8String, path: UTF8String): Boolean = {
    if (robots == null || agent == null || path == null) return true
    if (robots.numBytes() == 0) return true
    val r = parsed(robots.toString)
    val tok = token(agent.toString)
    val p = {
      val s = path.toString
      if (s.isEmpty) "/" else s
    }
    // group selection: exact-token groups beat '*' groups; all groups
    // at the winning specificity combine
    var exact = List.empty[Group]
    var star = List.empty[Group]
    r.groups.foreach { g =>
      if (g.agents.contains(tok)) exact ::= g
      else if (g.agents.contains("*")) star ::= g
    }
    val selected = if (exact.nonEmpty) exact else star
    if (selected.isEmpty) return true
    // longest pattern wins; Allow wins length ties
    var bestLen = -1
    var bestAllow = true
    selected.foreach { g =>
      g.rules.foreach { rule =>
        if (ruleMatches(rule, p)) {
          val len = rule.pattern.length
          if (len > bestLen || (len == bestLen && rule.allow)) {
            bestLen = len
            bestAllow = rule.allow
          }
        }
      }
    }
    if (bestLen < 0) true else bestAllow
  }

  /** The `Crawl-delay` (seconds) `agent` should honor under this
    * robots.txt, or NaN when no selected group carries one — the
    * de-facto politeness input to a fetch scheduler. Group selection
    * is [[allowed]]'s: exact product-token groups beat `*`; among the
    * combined selected groups the LARGEST delay wins (the conservative
    * reading, matching the per-group repeated-line rule). Null/empty
    * robots or agent → NaN. Never throws.
    */
  def crawlDelay(robots: UTF8String, agent: UTF8String): Double = {
    if (robots == null || agent == null || robots.numBytes() == 0)
      return Double.NaN
    val r = parsed(robots.toString)
    val tok = token(agent.toString)
    var exact = List.empty[Group]
    var star = List.empty[Group]
    r.groups.foreach { g =>
      if (g.agents.contains(tok)) exact ::= g
      else if (g.agents.contains("*")) star ::= g
    }
    val selected = if (exact.nonEmpty) exact else star
    var best = Double.NaN
    selected.foreach { g =>
      if (!g.crawlDelay.isNaN && (best.isNaN || g.crawlDelay > best))
        best = g.crawlDelay
    }
    best
  }

  /** All `Sitemap:` directive values in file order — the sitemaps.org
    * cross-submission extension RFC 9309 §2.2.4 tolerates as "other
    * records". Group-INDEPENDENT per the sitemaps.org spec: a Sitemap
    * line applies to the whole file wherever it appears, so this is a
    * plain line scan, not a group lookup. Comments stripped, the key
    * matched case-insensitively, empty values and malformed lines
    * skipped; null input → empty array. Never throws. Closes the
    * discovery loop: robots.txt ([[allowed]]) points at sitemaps
    * ([[SitemapHelper.extract]]) which seed the frontier.
    */
  def sitemaps(robots: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    if (robots != null) {
      robots.toString.split("\r\n|\r|\n", -1).foreach { raw =>
        val hash = raw.indexOf('#')
        val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
        val colon = line.indexOf(':')
        if (colon > 0 &&
          line.substring(0, colon).trim.equalsIgnoreCase("sitemap")) {
          val value = line.substring(colon + 1).trim
          if (value.nonEmpty) out.add(UTF8String.fromString(value))
        }
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** `robots_crawl_delay(robots_txt, agent) -> double` — the
  * Crawl-delay seconds `agent` should honor (see
  * [[RobotsHelper.crawlDelay]]); null when no selected group carries
  * one, or for null inputs. The politeness input to a per-host fetch
  * scheduler. Never throws.
  */
case class RobotsCrawlDelay(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "robots_crawl_delay"
  override protected def nullSafeEval(robots: Any, agent: Any): Any = {
    val d = RobotsHelper.crawlDelay(robots.asInstanceOf[UTF8String],
      agent.asInstanceOf[UTF8String])
    if (d.isNaN) null else java.lang.Double.valueOf(d)
  }
  // NaN (no delay) surfaces as SQL null — propagate into isNull
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, a) => s"""
      ${ev.value} = graft.functions.RobotsHelper.crawlDelay($r, $a);
      if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RobotsCrawlDelay =
    copy(left = l, right = r)
}

/** `robots_sitemaps(robots_txt) -> array<string>` — the `Sitemap:`
  * directives in file order (see [[RobotsHelper.sitemaps]]); empty
  * array when none. Construct via
  * [[RobotsSitemaps.withNullSafeDefault]] so a null robots text (no
  * robots file) yields an empty array, not null (the
  * [[RobotsAllowed.withNullSafeDefaults]] design). Never throws.
  */
case class RobotsSitemaps(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "robots_sitemaps"
  override protected def nullSafeEval(robots: Any): Any =
    RobotsHelper.sitemaps(robots.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RobotsHelper.sitemaps($c)")
  override protected def withNewChildInternal(newChild: Expression): RobotsSitemaps =
    copy(child = newChild)
}

object RobotsSitemaps {
  /** Null robots text → empty string → empty array. */
  def withNullSafeDefault(robots: Expression): RobotsSitemaps =
    RobotsSitemaps(Coalesce(Seq(robots,
      Literal(UTF8String.fromString(""), StringType))))
}

/** `robots_allowed(robots_txt, agent, path) -> boolean` — RFC 9309
  * fetch-permission check (see [[RobotsHelper.allowed]]): group
  * selection by product token, longest-match rules with `*`/`$`,
  * Allow wins ties; never throws. Construct via
  * [[RobotsAllowed.withNullSafeDefaults]] so a null robots/agent/path
  * means "no restriction / default probe", not a null verdict (the
  * [[CharsetDecode.withNullSafeHint]] design).
  */
case class RobotsAllowed(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "robots_allowed"
  override protected def nullSafeEval(robots: Any, agent: Any, path: Any): Any =
    RobotsHelper.allowed(robots.asInstanceOf[UTF8String],
      agent.asInstanceOf[UTF8String], path.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (r, a, p) => s"graft.functions.RobotsHelper.allowed($r, $a, $p)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RobotsAllowed =
    copy(first = f, second = s, third = t)
}

object RobotsAllowed {
  private def orEmpty(e: Expression): Expression =
    Coalesce(Seq(e, Literal(UTF8String.fromString(""), StringType)))
  /** A null robots text (no robots file) restricts nothing; a null
    * agent matches only `*` groups; a null path probes `/`.
    */
  def withNullSafeDefaults(robots: Expression, agent: Expression,
      path: Expression): RobotsAllowed =
    RobotsAllowed(orEmpty(robots), orEmpty(agent), orEmpty(path))
}
