package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** One robots.txt rule scoped to a crawler: `allow` is the line's
  * directive (Allow/Disallow), `path` the match pattern verbatim in the
  * published spelling (prefix match; `*` matches any octet run, a
  * trailing `$` anchors the end). Produced by [[Web.loadRobotsRules]],
  * consumed by [[Web.robotsPrevailingRule]] and
  * [[graft.functions.RobotsMatchExpr]]. */
case class RobotsRule(allow: Boolean, path: String)

/** URL/domain curation — the stage every web-scraped corpus passes
  * before text ever matters (C4 strips by domain blocklist, RefinedWeb
  * dedups and caps by registrable domain, Dolma publishes per-domain
  * composition): canonicalize raw URLs so byte-different spellings of
  * the same resource collide, roll hosts up to their REGISTRABLE domain
  * (the public-suffix-list eTLD+1 — "blog.siteX.co.uk" and
  * "www.siteX.co.uk" are both siteX.co.uk, the unit crawl policy is set
  * at), and enforce per-domain document caps so no single host
  * dominates the training mixture.
  *
  * Everything here is codegen'd builtin string/array expressions in a
  * scan-stage projection — no UDF, no shuffle until the per-domain
  * aggregate — and every rule is exact string arithmetic a SQL oracle
  * replays verbatim.
  */
object Web {

  /** The public-suffix set the registrable-domain rule matches against
    * (longest suffix wins — `co.uk` before `uk`-level labels). A real
    * deployment swaps in the full Mozilla PSL (~9k suffixes, still a
    * broadcast-sized constant); the rule is suffix-count-independent. */
  val DefaultSuffixes: Seq[String] = Seq("co.uk", "com", "org", "io")

  /** URL canonicalization as one scan-stage projection. Appends to
    * every input row:
    *  - `host`: the authority lowercased, `www.` prefix and port
    *    stripped — the join key for domain rollups;
    *  - `norm_url`: scheme and host lowercased, `www.` stripped,
    *    scheme-default ports dropped (https:443 / http:80; any other
    *    port kept), ONE trailing slash stripped from a non-root path,
    *    `utm_*` tracking parameters removed, surviving query parameters
    *    sorted lexicographically, fragment dropped;
    *  - `had_tracking`: whether any `utm_*` parameter was removed.
    *
    * The contract expects absolute URLs (`scheme://authority…`) with a
    * plain `host[:port]` authority — no userinfo, no bracketed IPv6.
    * Host/port split on the FIRST colon (the URL-correct rule for that
    * authority class): a malformed multi-colon authority (`h:80:90`)
    * keeps everything after the first colon as the "port" on BOTH
    * engines — the DuckDB oracle (`oracleSql`'s `urlNormSql` CTE) uses
    * the identical rule, and the garbage-input parity test in
    * `Round11OpsSpec` pins the two formulas together so neither can
    * drift silently. A NULL url yields NULL outputs (the quarantine
    * convention — one malformed scrape row must not kill a sweep).
    * Parameter VALUES are preserved byte-for-byte: canonicalization
    * must never merge two genuinely different resources, only
    * different spellings of one. */
  def normalizeUrls(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    df
      .withColumn("_scheme",
        lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)))
      .withColumn("_hp",
        lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)))
      .withColumn("_host0",
        when(col("_hp").contains(":"), substring_index(col("_hp"), ":", 1))
          .otherwise(col("_hp")))
      .withColumn("_port",
        when(col("_hp").contains(":"),
          expr("substring(_hp, instr(_hp, ':') + 1)"))
          .otherwise(lit("")))
      .withColumn("host",
        when(col("_host0").startsWith("www."),
          expr("substring(_host0, 5)")).otherwise(col("_host0")))
      .withColumn("_path0",
        regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1))
      .withColumn("_path",
        when(length(col("_path0")) > 1 && col("_path0").endsWith("/"),
          expr("substring(_path0, 1, length(_path0) - 1)"))
          .otherwise(col("_path0")))
      .withColumn("_q0", regexp_extract(u, "\\?([^#]*)", 1))
      .withColumn("_params",
        when(col("_q0") === "", array().cast("array<string>"))
          .otherwise(split(col("_q0"), "&")))
      .withColumn("_kept",
        array_sort(expr("filter(_params, x -> NOT startswith(x, 'utm_'))")))
      .withColumn("had_tracking", size(col("_params")) =!= size(col("_kept")))
      .withColumn("norm_url", concat(
        col("_scheme"), lit("://"), col("host"),
        when(col("_port") =!= "" &&
          !((col("_scheme") === "https" && col("_port") === "443") ||
            (col("_scheme") === "http" && col("_port") === "80")),
          concat(lit(":"), col("_port"))).otherwise(lit("")),
        col("_path"),
        when(size(col("_kept")) === 0, lit(""))
          .otherwise(concat(lit("?"), array_join(col("_kept"), "&")))))
      .drop("_scheme", "_hp", "_host0", "_port", "_path0", "_path", "_q0",
        "_params", "_kept")
  }

  /** Suffix count up to which [[registrableDomain]] stays a when-chain:
    * small chains constant-fold to straight-line codegen'd `endsWith`s;
    * past this, chain codegen size grows toward Catalyst's 64KB/method
    * limit (a ~9k-suffix PSL chain falls back to interpreted CaseWhen)
    * and the data-driven [[graft.functions.RegistrableDomainExpr]]
    * takes over. */
  val WhenChainMaxSuffixes: Int = 16

  /** Parse the published public_suffix_list.dat FORMAT into the rule
    * `Seq[String]` that [[registrableDomain]]/[[pslRuleClass]] and the
    * native expressions consume — closing the ingest-to-expression
    * story: callers hand the file text (a few hundred KB, read on the
    * driver, shipped inside the expression as the usual broadcast-sized
    * constant) instead of pre-cleaning it by hand.
    *
    * Format rules honored (the published spec):
    *  - a line is read up to its first whitespace; anything after is
    *    ignored (the file annotates some rules that way);
    *  - `//` lines are comments — EXCEPT the section markers
    *    `// ===BEGIN ICANN DOMAINS===` / `// ===END PRIVATE DOMAINS===`,
    *    which scope the rules between them;
    *  - blank lines are ignored;
    *  - wildcard (`*.ck`) and exception (`!www.ck`) spellings pass
    *    through verbatim — they are the expressions' native contract.
    *
    * `sections` filters by section name (the published file has ICANN
    * and PRIVATE; most curation audits want ICANN only — the PRIVATE
    * half would split e.g. every `github.io` user site into its own
    * "domain" in a per-domain cap). Rules outside any marked section
    * (hand-authored lists) always load. Rule text is lowercased —
    * the published list is already lowercase; hand-authored lists meet
    * the host-normalization contract either way. */
  def loadPslRules(text: String,
      sections: Set[String] = Set("ICANN")): Seq[String] = {
    val begin = "===BEGIN ([A-Z]+) DOMAINS===".r
    val end = "===END ([A-Z]+) DOMAINS===".r
    var current: Option[String] = None
    val out = Seq.newBuilder[String]
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.startsWith("//")) {
        begin.findFirstMatchIn(line).foreach(m => current = Some(m.group(1)))
        end.findFirstMatchIn(line).foreach(_ => current = None)
      } else if (line.nonEmpty && current.forall(sections.contains)) {
        val rule = line.takeWhile(!_.isWhitespace).toLowerCase
        if (rule.nonEmpty) out += rule
      }
    }
    out.result().distinct
  }

  /** Parse RFC 9309 robots.txt TEXT into the crawler-scoped rule list
    * the verdict expressions consume — the crawl-politeness twin of
    * [[loadPslRules]]: the file is a few KB fetched per site (the RFC
    * caps parse obligation at 500 KiB), parsed once on the driver, and
    * the rules ride the verdict expression as a broadcast-sized
    * constant.
    *
    * Format rules honored (RFC 9309 §2.2):
    *  - lines are `field: value`; field names case-insensitive; a `#`
    *    starts a comment anywhere in the line; a leading UTF-8 BOM is
    *    stripped;
    *  - a group is one or more CONSECUTIVE `User-agent` lines followed
    *    by its `Allow`/`Disallow` rules; a later `User-agent` run
    *    starts a new group. Multiple groups naming the same agent are
    *    combined (MUST per the RFC). Rules before any `User-agent`
    *    line belong to no group and are dropped;
    *  - other known-shape lines (`Sitemap`, `Crawl-delay`, any
    *    unknown field) are ignored — they end a User-agent RUN but do
    *    not close the open group's rule scope;
    *  - an EMPTY `Disallow:`/`Allow:` value is no rule at all (the
    *    classic "Disallow nothing = allow everything" spelling);
    *  - product tokens match case-insensitively and EXACTLY
    *    (`graftbot` selects the `GraftBot` group, not `graftbot-img`);
    *    a crawler with no named group falls back to the `*` group,
    *    else to no rules (everything allowed). */
  def loadRobotsRules(text: String, userAgent: String = "*"): Seq[RobotsRule] = {
    val byAgent = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[RobotsRule]]
    var currentAgents: List[String] = Nil
    var inAgentRun = false
    text.stripPrefix("\uFEFF").linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val field = line.substring(0, ci).trim.toLowerCase
        val value = line.substring(ci + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgentRun) { currentAgents = Nil; inAgentRun = true }
            val tok = value.toLowerCase
            if (tok.nonEmpty) {
              currentAgents ::= tok
              byAgent.getOrElseUpdate(tok,
                scala.collection.mutable.ArrayBuffer.empty)
            }
          case "allow" | "disallow" =>
            inAgentRun = false
            if (value.nonEmpty) {
              val r = RobotsRule(field == "allow", value)
              currentAgents.foreach(a => byAgent(a) += r)
            }
          case _ => inAgentRun = false
        }
      }
    }
    val ua = userAgent.trim.toLowerCase
    byAgent.get(ua).orElse(byAgent.get("*"))
      .map(_.toSeq).getOrElse(Seq.empty)
  }

  /** Rule count up to which the robots verdict stays a when-chain of
    * builtin `startswith`/`rlike` probes; past this the native
    * [[graft.functions.RobotsMatchExpr]] takes over (real files run a
    * handful of rules, but e-commerce robots.txt with thousands of
    * generated Disallow lines exist — the RFC's 500 KiB parse cap is
    * ~20k rules, far past the 64KB codegen limit a chain would hit). */
  val WhenChainMaxRobotsRules: Int = 16

  /** The RFC 9309 match pattern as a regex string IDENTICAL in Java
    * and RE2 syntax — the one translation both the Spark `rlike`
    * chain and the DuckDB oracle replay, so the two engines cannot
    * disagree on a metacharacter: `*` → `.*` under `(?s)` (an octet
    * run crosses newlines), a TRAILING `$` → `\z` (true end-of-text in
    * both engines — bare `$` would admit a trailing newline in Java
    * but not RE2), every other metacharacter escaped literal (a
    * mid-pattern `$` is data, not an anchor). */
  def robotsGlobRegex(pat: String): String = {
    val anchored = pat.endsWith("$")
    val body = if (anchored) pat.dropRight(1) else pat
    val sb = new StringBuilder("(?s)^")
    body.foreach {
      case '*' => sb.append(".*")
      case c if "\\.[](){}+?^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    if (anchored) sb.append("\\z")
    sb.toString
  }

  /** Index (into `rules`' ORIGINAL order) of the rule that decides a
    * path under RFC 9309's precedence, or -1 when none matches (the
    * default: allowed). Precedence is the RFC's: the LONGEST matching
    * pattern (spelled octet length) wins; at equal length `Allow`
    * beats `Disallow`. Matching is octet-exact prefix with `*` as
    * any-run and trailing `$` as end anchor; the match target is the
    * URI's path-plus-query (what a crawler tests before fetching).
    *
    * Plan: ≤ [[WhenChainMaxRobotsRules]] rules — a when-chain ordered
    * longest-first/allow-first, each probe a codegen'd builtin
    * (`startswith` for literal prefixes, `rlike` on
    * [[robotsGlobRegex]] for wildcard/anchored patterns), so the first
    * hit IS the prevailing rule; past that the native
    * [[graft.functions.RobotsMatchExpr]] — same order, one byte-level
    * glob walk per rule with early exit, no regex engine on the row
    * path (chain ≡ native fuzz-pinned in `Round13OpsSpec`). Returning
    * the INDEX keeps one evaluation per row: the verdict
    * ([[robotsAllowed]]) and the audit label ([[robotsRuleLabel]])
    * are O(1) array probes on it. */
  def robotsPrevailingRule(path: Column, rules: Seq[RobotsRule]): Column =
    if (rules.isEmpty) when(path.isNotNull, lit(-1))
    else if (rules.size <= WhenChainMaxRobotsRules) robotsChain(path, rules)
    else graft.functions.RobotsMatchExpr(path, rules.map(r => (r.allow, r.path)))

  private[graft] def robotsChain(path: Column, rules: Seq[RobotsRule]): Column = {
    val cases = robotsOrder(rules).map { case (r, i) =>
      val cond =
        if (!r.path.contains('*') && !r.path.endsWith("$"))
          path.startsWith(lit(r.path))
        else path.rlike(robotsGlobRegex(r.path))
      when(cond, lit(i))
    }
    // the isNotNull guard pins NULL-in → NULL-out (the native
    // expression's UnaryExpression contract): a bare coalesce would
    // turn a NULL path into the -1 default
    when(path.isNotNull, coalesce(cases :+ lit(-1): _*))
  }

  /** RFC 9309 precedence order: longest spelled pattern first (octet
    * length), `Allow` before `Disallow` at equal length, original
    * position as the deterministic tail tie-break. Shared spelling of
    * the one sort both the chain and the native expression use. */
  private[graft] def robotsOrder(
      rules: Seq[RobotsRule]): Seq[(RobotsRule, Int)] =
    rules.zipWithIndex.sortBy { case (r, i) =>
      (-r.path.getBytes("UTF-8").length, !r.allow, i)
    }

  /** Crawl verdict from a [[robotsPrevailingRule]] index: the
    * prevailing rule's directive, or allowed when no rule matched. */
  def robotsAllowed(ruleIdx: Column, rules: Seq[RobotsRule]): Column =
    if (rules.isEmpty) when(ruleIdx.isNotNull, lit(true))
    else when(ruleIdx === -1, lit(true))
      .otherwise(element_at(typedLit(rules.map(_.allow)), ruleIdx + 1))

  /** Audit label from a [[robotsPrevailingRule]] index: the prevailing
    * rule in its spelled form (`"disallow "` + the pattern), or
    * `"default"` —
    * the column a crawl-admission report groups by so a verdict is
    * explainable without re-running the match. */
  def robotsRuleLabel(ruleIdx: Column, rules: Seq[RobotsRule]): Column =
    if (rules.isEmpty) when(ruleIdx.isNotNull, lit("default"))
    else when(ruleIdx === -1, lit("default"))
      .otherwise(element_at(typedLit(rules.map(r =>
        (if (r.allow) "allow " else "disallow ") + r.path)), ruleIdx + 1))

  /** Registrable domain (eTLD+1) of a normalized host: the longest
    * matching public suffix plus one label; a host that matches no
    * rule (an IP, an intranet name) is its own domain.
    *
    * Rules use the published PSL file spelling — plain suffixes
    * (`com`, `co.uk`), wildcards (`*.ck`: any ONE label under `ck` is
    * itself a public suffix), and exceptions (`!www.ck`: despite the
    * wildcard, `www.ck` is NOT a public suffix — its parent is, so
    * `www.ck` is the registrable domain of anything at/under it).
    * Exception rules prevail over everything (the published list never
    * shadows one with a longer rule); otherwise the longest match
    * wins, a wildcard matching one label more than its spelled parent.
    * A host that IS a bare public suffix (incl. a bare `<label>.w`
    * wildcard suffix) is its own domain; an empty label where the
    * contract needs one yields "" (regexp_extract's no-match value).
    *
    * Plan: for a handful of rules (≤ [[WhenChainMaxSuffixes]]) a
    * when-chain — exceptions first, then rules ordered by effective
    * public-suffix label count — constant-folded by Catalyst, no join,
    * no UDF. For a real PSL (the full Mozilla list is ~9k suffixes +
    * ~1k wildcard/exception rules) the when-chain would blow past the
    * 64KB codegen limit, so the rule switches to the native
    * [[graft.functions.RegistrableDomainExpr]]: the rule sets ride
    * the expression as a broadcast-sized constant and each host is
    * matched longest-first in one O(labels) pass — same contract
    * (property-pinned equal in `Round11PropertySpec`/`Round12OpsSpec`),
    * still one codegen'd scan-stage projection. */
  def registrableDomain(
      host: Column,
      suffixes: Seq[String] = DefaultSuffixes): Column =
    if (suffixes.size <= WhenChainMaxSuffixes) {
      def q(s: String) = java.util.regex.Pattern.quote(s)
      // exceptions prevail: checked before any length-ordered rule
      val exceptions = suffixes.filter(_.startsWith("!")).map(_.substring(1))
        .sortBy(e => (-e.count(_ == '.'), -e.length))
        .map(e => when(host === e || host.endsWith("." + e), lit(e)))
      // plain + wildcard, by effective public-suffix label count (a
      // wildcard's is one more than its spelled parent's); equal-count
      // overlaps produce the same psuffix string either way, so the
      // tie-break (spelled length) only pins determinism
      val ordered = suffixes.filterNot(_.startsWith("!"))
        .sortBy { s =>
          val spelled = if (s.startsWith("*.")) s.substring(2) else s
          val eff = spelled.count(_ == '.') + (if (s.startsWith("*.")) 2 else 1)
          (-eff, -spelled.length)
        }
      val candidates = ordered.map {
        case w if w.startsWith("*.") =>
          val p = w.substring(2)
          // bare ⟨label⟩.parent is itself the public suffix → own
          // domain; otherwise one label + ⟨label⟩.parent, both labels
          // non-empty or the extract yields ""
          when(host.endsWith("." + p),
            when(host.rlike("^[^.]+\\." + q(p) + "$"), host)
              .otherwise(
                regexp_extract(host, "([^.]+\\.[^.]+\\." + q(p) + ")$", 1)))
        case s =>
          when(host.endsWith("." + s),
            regexp_extract(host, "([^.]+\\." + q(s) + ")$", 1))
      }
      coalesce(exceptions ++ candidates :+ host: _*)
    } else graft.functions.RegistrableDomainExpr(host, suffixes)

  /** The CLASS of the prevailing PSL rule for each host — the crawl
    * audit that explains a domain report's rollup behavior before
    * anyone debugs it ("these hosts rooted under a wildcard", "ck is
    * exception-rooted"): `'exception'`, `'wildcard'`, `'plain'`, or
    * `'none'` (no rule matched — IPs, intranet names). The branches
    * are [[registrableDomain]]'s when-chain VERBATIM in the same
    * order, emitting class labels instead of domains, so the two
    * chains cannot disagree about which rule prevails. Past
    * [[WhenChainMaxSuffixes]] the rule switches to the native
    * [[graft.functions.PslRuleClassExpr]] — the same walk as the
    * domain expression returning the branch's class, so full-PSL
    * (~10k-rule) class profiles run at the same
    * rule-count-independent cost (chain ≡ native property-pinned in
    * `Round12OpsSpec`). */
  def pslRuleClass(host: Column, suffixes: Seq[String]): Column =
    if (suffixes.size <= WhenChainMaxSuffixes) pslRuleClassChain(host, suffixes)
    else graft.functions.PslRuleClassExpr(host, suffixes)

  private def pslRuleClassChain(host: Column, suffixes: Seq[String]): Column = {
    val exceptions = suffixes.filter(_.startsWith("!")).map(_.substring(1))
      .sortBy(e => (-e.count(_ == '.'), -e.length))
      .map(e => when(host === e || host.endsWith("." + e), lit("exception")))
    val ordered = suffixes.filterNot(_.startsWith("!"))
      .sortBy { s =>
        val spelled = if (s.startsWith("*.")) s.substring(2) else s
        val eff = spelled.count(_ == '.') + (if (s.startsWith("*.")) 2 else 1)
        (-eff, -spelled.length)
      }
    val candidates = ordered.map {
      case w if w.startsWith("*.") =>
        when(host.endsWith("." + w.substring(2)), lit("wildcard"))
      case s =>
        when(host.endsWith("." + s), lit("plain"))
    }
    coalesce(exceptions ++ candidates :+ lit("none"): _*)
  }

  /** Per-registrable-domain composition report — the table a curation
    * run publishes before setting crawl policy: document count,
    * distinct canonical URLs (re-crawls and tracking-spelling variants
    * collapse), how many raw URLs carried tracking parameters, and each
    * domain's corpus share in exact ppm.
    *
    * Plan: the [[normalizeUrls]] projection, one hash aggregate on the
    * domain (map-side partial; the distinct-URL count plans as Spark's
    * two-stage distinct aggregate so no reducer sees raw rows), and a
    * 1-row total broadcast back onto the domain-count-sized result. */
  def domainStats(
      df: DataFrame, urlCol: String,
      suffixes: Seq[String] = DefaultSuffixes): DataFrame = {
    val n = normalizeUrls(df, urlCol)
      .withColumn("reg_domain", registrableDomain(col("host"), suffixes))
    val g = n.groupBy(col("reg_domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("norm_url")).as("n_urls"),
        coalesce(sum(when(col("had_tracking"), 1L)), lit(0L)).as("n_tracked"))
    val tot = g.agg(sum(col("n_docs")).as("_nt"))
    g.crossJoin(broadcast(tot))
      .select(col("reg_domain"), col("n_docs"), col("n_urls"), col("n_tracked"),
        expr("CAST(CAST(n_docs AS DECIMAL(38,0)) * 1000000 div _nt AS BIGINT)")
          .as("share_ppm"))
  }

  /** Per-domain document cap (RefinedWeb's anti-dominance rule): keep
    * at most `k` documents per registrable domain, selected by the
    * deterministic seeded key `hash60("cap|" ∥ id)` with the id as
    * tie-break — an unbiased fixed-size sample that every engine and
    * every rerun reproduces bit-for-bit.
    *
    * Selection runs through [[MinKAgg]] (GroupSample's bounded
    * mergeable k-smallest aggregate: map-side partial, ≤ k rows per
    * partition per domain cross the shuffle) — NOT a `row_number`
    * window, which would shuffle the whole corpus into one partition
    * per domain and serialize on the mega-domains that dominate real
    * crawls (a handful of hosts own double-digit percent of the web).
    *
    * Output: the kept rows `(reg_domain, idCol, rk)` with `rk` the
    * 1-based position in the domain's cap order. */
  def domainCap(
      df: DataFrame, urlCol: String, idCol: String, k: Int,
      suffixes: Seq[String] = DefaultSuffixes): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val mink = udaf(new MinKAgg(k), Encoders.product[SampleCand])
    // id contract: idCol must TRY_CAST to LONG (the output narrows to
    // it — same as StatefulDomainCap's DomainDoc). The filter runs on
    // the try_cast, not on raw isNotNull: a non-null but non-numeric
    // string id would either throw the whole sweep under ANSI cast or
    // cast to NULL and NPE the SampleCand encoder the way a null
    // parquet cell does; both row classes quarantine here instead.
    val idAsLong = expr(s"try_cast(`$idCol` AS LONG)")
    // the selection key hashes the CANONICAL long spelling, not the raw
    // column: "7" and "007" are one document and must share one hash
    // key (and the oracle hashes CAST(id AS VARCHAR) of the numeric id)
    normalizeUrls(df.where(idAsLong.isNotNull), urlCol)
      .withColumn("reg_domain", registrableDomain(col("host"), suffixes))
      .select(col("reg_domain"),
        Dedup.hash60(concat(lit("cap|"), idAsLong.cast("string"))).as("_ck"),
        idAsLong.as("_id"))
      .groupBy(col("reg_domain"))
      .agg(mink(col("_ck"), col("_id")).as("_keep"))
      .select(col("reg_domain"), posexplode(col("_keep")).as(Seq("_pos", "_c")))
      .select(col("reg_domain"), col("_c.id").as(idCol),
        (col("_pos") + 1).cast("int").as("rk"))
  }
}
