package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap XML parsing — the EXPAND step for the sitemap FILES the
  * frontier proposes ([[UrlCuration.crawlFrontierWithSitemaps]] routes
  * them under `provenance = 'sitemap'`; this is what the fetcher runs
  * on their fetched bodies). The sitemaps.org protocol (the public
  * format — `<urlset>` of `<url>` entries, or a `<sitemapindex>` of
  * nested `<sitemap>` files) carries exactly the freshness metadata
  * the recrawl planner wants: `<lastmod>` (when the page last
  * changed), `<changefreq>` (the site's own change-rate claim) and
  * `<priority>`.
  *
  * Parse contract (mirrored by the `q_sitemap_parse` oracle):
  *   - every `<url>…</url>` block with a `<loc>` yields a
  *     `kind = 'url'` row; every `<sitemap>…</sitemap>` block yields
  *     `kind = 'sitemap'` (a nested index file — feed it back to the
  *     fetcher, not to the page frontier);
  *   - `loc` values are resolved against the sitemap's own URL
  *     (relative locs appear in the wild), canonicalized, and
  *     non-URL values drop;
  *   - `lastmod` parses the two W3C datetime shapes real sitemaps
  *     carry (`YYYY-MM-DD`, `…T HH:MM:SSZ`); anything else → NULL,
  *     never a failed job;
  *   - `changefreq` lower-cases to the protocol's seven tokens
  *     (anything else → NULL); `priority` is a tolerant double cast;
  *   - entries dedupe per (sitemap, kind, loc) keeping the FIRST
  *     occurrence's metadata (in-text duplicates are common).
  *
  * Scale shape: entirely IN-ROW — one `regexp_extract_all` explode
  * per block kind + per-entry field regexes, all codegen built-ins,
  * zero exchanges until the final per-(kind, loc) dedup aggregate;
  * sitemap files are a tiny fraction of any crawl's fetches.
  */
object Sitemaps {

  /** `<url>`/`<sitemap>` block contents, non-greedy, case-insensitive,
    * dot-matches-newline (real sitemaps are pretty-printed). */
  private def blocks(xml: Column, tag: String): Column =
    regexp_extract_all(xml, lit(s"(?is)<$tag\\b[^>]*>(.*?)</$tag>"), lit(1))

  /** One field's text inside a block: optional CDATA wrapper and
    * surrounding whitespace stripped; `''` when absent (regexp_extract
    * convention) — callers null it. */
  private def field(block: Column, tag: String): Column =
    regexp_extract(block,
      s"(?is)<$tag\\b[^>]*>\\s*(?:<!\\[CDATA\\[)?\\s*(.*?)\\s*(?:\\]\\]>)?\\s*</$tag>",
      1)

  private val Changefreqs =
    Seq("always", "hourly", "daily", "weekly", "monthly", "yearly", "never")

  /** The protocol's `<changefreq>` tokens as expected page-change
    * rates per DAY — the cold-start PRIOR for
    * [[UrlCuration.recrawlWaves]] before any revisit history exists
    * (`always`/`hourly` ≈ 24/day, `never` ≈ once a decade — still
    * re-checked eventually, sites lie). Stated once; the oracle CASE
    * is generated from this map. */
  val ChangefreqRatePerDay: Map[String, Double] = Map(
    "always" -> 24.0, "hourly" -> 24.0, "daily" -> 1.0,
    "weekly" -> (1.0 / 7.0), "monthly" -> (1.0 / 30.0),
    "yearly" -> (1.0 / 365.0), "never" -> (1.0 / 3650.0))

  /** `changefreq` token → rate/day column ([[ChangefreqRatePerDay]]);
    * NULL for NULL/unknown tokens. */
  def changefreqRate(changefreq: Column): Column =
    ChangefreqRatePerDay.foldLeft(lit(null).cast("double")) {
      case (acc, (token, rate)) =>
        when(changefreq === token, lit(rate)).otherwise(acc)
    }

  /** Parse fetched sitemap FILES `(idCol, urlCol = the sitemap's own
    * URL, xmlCol = its body)` into entry rows
    * `(sitemap_url, kind, loc, lastmod, changefreq, priority)`. */
  def parseSitemapPages(pages: DataFrame, idCol: String, urlCol: String,
      xmlCol: String): DataFrame = {
    Seq(idCol, urlCol, xmlCol).foreach(c =>
      require(pages.columns.contains(c), s"column $c absent"))
    def entries(kind: String, tag: String): DataFrame = {
      val withBlock = pages.select(col(idCol),
          col(urlCol).as("__sm_url"),
          explode(blocks(col(xmlCol), tag)).as("__blk"))
      val locRaw = field(col("__blk"), "loc")
      val lm = field(col("__blk"), "lastmod")
      val cf = lower(field(col("__blk"), "changefreq"))
      val pr = field(col("__blk"), "priority")
      withBlock.select(col(idCol), col("__sm_url"),
          graft.functions.GraftFunctions.url_resolve(
            col("__sm_url"), locRaw).as("__loc_res"),
          when(locRaw === "", lit(null)).otherwise(locRaw).as("__loc_raw"),
          coalesce(
            to_timestamp(lm, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
            to_timestamp(lm, "yyyy-MM-dd")).as("lastmod"),
          when(cf.isin(Changefreqs: _*), cf).otherwise(lit(null))
            .as("changefreq"),
          pr.cast("double").as("priority"))
        .filter(col("__loc_raw").isNotNull &&
          UrlCuration.isUrlish(col("__loc_res")))
        .select(col(idCol), col("__sm_url").as("sitemap_url"),
          lit(kind).as("kind"),
          UrlCuration.canonicalUrl(col("__loc_res")).as("loc"),
          col("lastmod"), col("changefreq"), col("priority"))
    }
    entries("url", "url").unionByName(entries("sitemap", "sitemap"))
      // in-text duplicates keep the FIRST occurrence's metadata —
      // smallest (page id, and the protocol's document order is not
      // observable post-explode, so min over the metadata struct keyed
      // by id is the deterministic winner)
      .groupBy(col("sitemap_url"), col("kind"), col("loc"))
      .agg(min(struct(col(idCol), col("lastmod"), col("changefreq"),
        col("priority"))).as("__w"))
      .select(col("sitemap_url"), col("kind"), col("loc"),
        col("__w.lastmod").as("lastmod"),
        col("__w.changefreq").as("changefreq"),
        col("__w.priority").as("priority"))
  }
}
