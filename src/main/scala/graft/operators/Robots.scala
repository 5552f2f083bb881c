package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt politeness — the Robots Exclusion Protocol screen a
  * real crawler applies to the FRONTIER before fetching: a URL the
  * site disallows must never be requested, so this sits between
  * [[UrlCuration.crawlFrontier]]'s output and the next wave's fetch.
  * REP parsing/matching semantics live in
  * [[graft.functions.RobotsRules]] (RFC 9309 §2.2 — wildcard path
  * rules, longest-match precedence, Allow wins ties, agent-group
  * selection with `*` fallback); this file is the DataFrame operator.
  *
  * Scale shape: robots files are PER-DOMAIN state, so
  * [[filterAllowed]] pays ONE keyed join of pages against the robots
  * relation (millions of domains at crawl scale — a normal shuffle
  * join; a small domain set broadcasts) and evaluates the match
  * per row with the native [[graft.functions.RobotsAllowed]]
  * expression, which parses each DISTINCT robots text once into a
  * compiled rule group (bounded per-executor memo — a crawl
  * partition sees the same few domains' texts over and over); the
  * match itself is a linear wildcard walk per rule, no per-row regex
  * compilation.
  *
  * The PARSER is spec-tested (hand-verified RFC cases,
  * RobotsRulesSpec); the MATCHING algorithm is oracle-gated
  * (`q_robots_filter` re-derives wildcard matching and longest-match
  * precedence in DuckDB over the same rule relation).
  */
object Robots {

  /** The robots relation KEYED for joining: one row per domain,
    * enforced LOUDLY at execution — a re-fetched robots.txt that left
    * two rows for one domain would otherwise silently DUPLICATE every
    * matching page in [[filterAllowed]]'s output (the r18 ADVICE
    * guard). One per-domain aggregate; at crawl scale the robots
    * relation is per-domain state, orders of magnitude smaller than
    * the pages side, so the exchange is proportionate — and callers
    * that maintain a unique keyed robots table anyway pay it once at
    * build time, not per screen. */
  def keyedRobots(robots: DataFrame, domainCol: String,
      robotsCol: String): DataFrame = {
    Seq(domainCol, robotsCol).foreach(c =>
      require(robots.columns.contains(c), s"column $c absent in robots"))
    robots
      .select(col(domainCol).as("__rb_domain"), col(robotsCol).as("__rb_txt0"))
      .groupBy("__rb_domain")
      .agg(count(lit(1)).as("__rb_n"), max(col("__rb_txt0")).as("__rb_txt1"))
      .select(col("__rb_domain"),
        when(col("__rb_n") > 1,
          raise_error(concat(
            lit("Robots: duplicate robots rows for domain "),
            col("__rb_domain"),
            lit(" — the robots relation must be keyed one row per domain")))
            .cast("string"))
          .otherwise(col("__rb_txt1")).as("__rb_txt"))
  }

  /** Keep only the pages `agent` MAY fetch: one keyed join of pages
    * against `robots(domainCol, robotsCol)` (domains with no robots
    * row are allowed — the no-robots.txt default), then the per-row
    * native match on the URL's PATH-AND-QUERY (the REP match
    * subject; fragments are already gone from canonical URLs).
    *
    * Join shape (the cluster-path contract): the page-side domain is
    * projected ONCE map-side and the robots side arrives through
    * [[keyedRobots]] (unique per domain, loud otherwise), so the join
    * itself is a plain column equi-join — plan-asserted in RobotsSpec. */
  def filterAllowed(pages: DataFrame, urlCol: String, robots: DataFrame,
      domainCol: String, robotsCol: String,
      agent: String = "graftbot"): DataFrame = {
    require(pages.columns.contains(urlCol), s"column $urlCol absent")
    require(agent.nonEmpty && !agent.contains("*"),
      s"agent='$agent' must be a concrete product token")
    Seq("__rb_domain", "__rb_txt", "__pg_domain").foreach(c =>
      require(!pages.columns.contains(c), s"column $c reserved"))
    val keyed = pages.withColumn("__pg_domain",
      UrlCuration.domainOf(col(urlCol)))
    keyed.join(keyedRobots(robots, domainCol, robotsCol),
        col("__pg_domain") === col("__rb_domain"), "left")
      .filter(col("__rb_txt").isNull ||
        graft.functions.GraftFunctions.robots_allowed(
          col("__rb_txt"), pathAndQueryOf(col(urlCol)), agent))
      .drop("__pg_domain", "__rb_domain", "__rb_txt")
  }

  /** BOOTSTRAP the per-domain robots relation from the crawl ITSELF:
    * a real crawler fetches `robots.txt` through the same fetch loop
    * as everything else, so the pages whose canonical URL path is
    * exactly `/robots.txt` ARE the robots corpus. Keep-smallest-id
    * per domain (the deterministic house winner rule — a re-fetched
    * robots.txt collapses to the first fetch; swap in a fetch-time
    * priority upstream if freshest-wins is wanted), emitting
    * `(domain, robots_txt)` — unique per domain by construction,
    * ready for [[filterAllowed]] / [[sitemapSeeds]] / the wave
    * scheduler. This closes the last crawl-loop seam: the politeness
    * screen's input no longer arrives out-of-band.
    *
    * Scale shape: one map-only path/domain projection + ONE per-domain
    * `min_by` aggregate over the tiny robots slice of the corpus
    * (the filter prunes everything else before the exchange). */
  def robotsFromPages(pages: DataFrame, idCol: String, urlCol: String,
      textCol: String): DataFrame = {
    Seq(idCol, urlCol, textCol).foreach(c =>
      require(pages.columns.contains(c), s"column $c absent"))
    val canon = UrlCuration.canonicalUrl(col(urlCol))
    pages
      .select(col(idCol), UrlCuration.domainOf(col(urlCol)).as("domain"),
        col(textCol).as("__txt"), pathAndQueryOf(canon).as("__pq"))
      .filter(col("__pq") === "/robots.txt" && col("domain") =!= "" &&
        col("__txt").isNotNull)
      .groupBy(col("domain"))
      .agg(min_by(col("__txt"), col(idCol)).as("robots_txt"))
  }

  /** SITEMAP SEEDS: the `Sitemap:` URLs the robots relation declares
    * (sitemaps.org protocol — global lines, independent of any agent
    * group), canonicalized and aggregated to one row per distinct
    * seed with the number of declaring domains as `n_refs` (a sitemap
    * cross-listed by many hosts is a stronger seed, the frontier's
    * in-degree convention). These are sitemap FILES to fetch and
    * expand, not pages — union them into the frontier under a
    * distinguishing provenance column
    * ([[UrlCuration.crawlFrontierWithSitemaps]]) so the fetcher
    * routes them to the sitemap parser.
    *
    * Scale shape: the robots relation is per-domain state (small next
    * to pages); one [[keyedRobots]] uniqueness aggregate, an in-row
    * explode of the native [[graft.functions.RobotsSitemaps]] parse
    * (memoized per distinct text), one (url) count exchange. */
  def sitemapSeeds(robots: DataFrame, domainCol: String, robotsCol: String,
      agent: String = "graftbot"): DataFrame = {
    require(agent.nonEmpty && !agent.contains("*"),
      s"agent='$agent' must be a concrete product token")
    keyedRobots(robots, domainCol, robotsCol)
      .select(col("__rb_domain"),
        explode(graft.functions.GraftFunctions.robots_sitemaps(
          col("__rb_txt"), agent)).as("__sm"))
      .filter(UrlCuration.isUrlish(col("__sm")))
      .select(col("__rb_domain"), UrlCuration.canonicalUrl(col("__sm")).as("url"))
      // distinct DECLARING domains — two raw spellings from one host
      // that canonicalize together still count once
      .groupBy(col("url"))
      .agg(countDistinct(col("__rb_domain")).as("n_refs"))
      .select(col("url"), UrlCuration.domainOf(col("url")).as("domain"),
        col("n_refs"))
  }

  /** The path-and-query of a URL (the REP match subject): everything
    * after the authority; empty path ⇒ `/`. */
  def pathAndQueryOf(url: Column): Column = {
    val noScheme = regexp_replace(trim(url),
      "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val rest = regexp_replace(regexp_replace(noScheme, "#.*$", ""),
      "^[^/?]*", "")
    when(rest === "", lit("/")).otherwise(rest)
  }
}
