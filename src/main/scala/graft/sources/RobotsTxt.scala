package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt parsing and rule evaluation (RFC 9309, the Robots Exclusion
  * Protocol) — the crawl-policy side of the frontier toolkit next to
  * [[WarcSource]] and the URL canonicalizer/blocklist: a compliant corpus
  * pipeline must be able to prove which archived fetches the origin
  * actually permitted.
  *
  * Scale shape: robots.txt content is HOST-cardinality (millions of small
  * files vs billions of URLs), so parsing runs once over the small table
  * and the parsed rule arrays ride a broadcastable host equi-join onto the
  * URL corpus; per-URL evaluation is then a narrow higher-order-function
  * fold with no shuffle of its own.
  */
object RobotsTxt {

  /** One access rule: the raw path pattern (longest-match length per RFC
    * 9309 §2.2.2 is measured on THIS), its compiled regex (RFC wildcards:
    * `*` = any octets, trailing `$` = end anchor), and the verdict.
    */
  final case class RobotRule(pattern: String, rx: String, allow: Boolean)

  /** Compile an RFC 9309 path pattern to an anchored regex: every char
    * regex-escaped except `*` (→ `.*`) and a TRAILING `$` (→ anchor).
    */
  def compilePattern(pattern: String): String = {
    val (body, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true) else (pattern, false)
    val sb = new StringBuilder("^")
    body.foreach {
      case '*' => sb.append(".*")
      case c if "\\.[]{}()<>+-=!?^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    if (anchored) sb.append('$')
    sb.toString
  }

  /** Parse robots.txt content into the rule list governing `userAgent`:
    * group lines by consecutive `User-agent:` headers (a group may name
    * several agents), match the agent case-insensitively by substring
    * product-token rule (exact token here), concatenate ALL matching
    * groups' rules (RFC 9309 §2.2.1), and fall back to the `*` groups when
    * no specific group matches. Comments (`#`), blank lines, unknown
    * directives (Crawl-delay, Sitemap) and empty Disallow values (= no
    * restriction) are skipped. Directive names are case-insensitive.
    */
  def parseRobots(content: String, userAgent: String): Seq[RobotRule] = {
    val ua = userAgent.toLowerCase
    final case class Group(agents: Seq[String], rules: Seq[RobotRule])
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var curAgents = Vector.empty[String]
    var inHeader = false
    content.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (inHeader) curAgents :+= value.toLowerCase
            else { curAgents = Vector(value.toLowerCase); inHeader = true }
          case "allow" | "disallow" =>
            if (inHeader) { groups += Group(curAgents, Vector.empty); inHeader = false }
            if (value.nonEmpty && groups.nonEmpty) {
              val g = groups.last
              groups(groups.length - 1) = g.copy(rules = g.rules :+
                RobotRule(value, compilePattern(value), key == "allow"))
            }
          case _ =>
            // Crawl-delay / Sitemap / unknown: closes the header run but
            // attaches to the current group without adding rules
            if (inHeader) { groups += Group(curAgents, Vector.empty); inHeader = false }
        }
      }
    }
    val specific = groups.filter(_.agents.contains(ua))
    val chosen = if (specific.nonEmpty) specific else groups.filter(_.agents.contains("*"))
    chosen.flatMap(_.rules).toSeq
  }

  /** Rule-list evaluation as a Column: allowed iff the longest matching
    * Allow pattern is at least as long as the longest matching Disallow
    * pattern (RFC 9309 longest-match; equal length → allow; no matching
    * rule → allow; null rules — host without a robots.txt — → allow).
    * `rules` must be `array<struct<pattern,rx,allow>>`.
    */
  def evalAllowed(rules: Column, path: Column): Column = {
    def bestLen(want: Boolean): Column = array_max(transform(
      filter(rules, r => r("allow") === want && regexp_like(path, r("rx"))),
      r => length(r("pattern"))))
    // null rules (no robots.txt for the host) fall through: both sides
    // coalesce to -1 and -1 >= -1 allows
    coalesce(bestLen(true), lit(-1)) >= coalesce(bestLen(false), lit(-1))
  }

  /** Parse a (host, robots.txt content) table into (host, rules) — one
    * small-side pass; content cardinality is hosts, not documents.
    */
  def parseRobotsTable(robots: DataFrame, hostCol: String, contentCol: String,
      userAgent: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(hostCol).cast("string"), col(contentCol).cast("string"))
      .as[(String, String)]
      .mapPartitions(_.map { case (h, c) => (h, parseRobots(c, userAgent)) })
      .toDF(hostCol, "rules")
  }

  /** Flag every URL with its robots verdict: extract host and path,
    * equi-join the parsed rule table on host (broadcastable — host
    * cardinality), evaluate. Hosts with no robots.txt row are allowed.
    */
  def robotsFlags(urls: DataFrame, idCol: String, urlCol: String,
      robots: DataFrame, hostCol: String, contentCol: String,
      userAgent: String): DataFrame = {
    val parsed = parseRobotsTable(robots, hostCol, contentCol, userAgent)
      .withColumnRenamed(hostCol, "__rb_host")
    val host = lower(regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?([^/?#:]*)", 1))
    val path = when(regexp_extract(col(urlCol),
        "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1) === "", lit("/"))
      .otherwise(regexp_extract(col(urlCol),
        "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1))
    urls.withColumn("host", host).withColumn("path", path)
      .join(parsed, col("host") === col("__rb_host"), "left")
      .withColumn("allowed", evalAllowed(col("rules"), col("path")))
      .drop("__rb_host", "rules")
  }
}
