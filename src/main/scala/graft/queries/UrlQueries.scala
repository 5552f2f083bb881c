package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.UrlCuration
import graft.sources.Scan

/** Domain/URL curation gates. The documents table carries no URL
  * column, so both engines SYNTHESIZE the same deliberately-messy URL
  * from (doc_id, source) — upper-cased schemes and hosts, `www.`
  * prefixes, default and non-default ports, trailing slashes,
  * tracking parameters in every position, fragments — and the oracle
  * then re-implements the full 7-step canonicalization contract
  * ([[UrlCuration]]) in DuckDB string ops. A drift in ANY step (port
  * rule, query re-rooting, case scope, winner rule) fails the hash
  * gate row-for-row.
  */
object UrlQueries {

  type Q = (SparkSession, String) => DataFrame

  /** The messy URL, Spark spelling. Exercises every canonicalization
    * step: scheme case (%5), www (%3), default/non-default ports
    * (%2/%11), path case (always), trailing slash (%6), tracking
    * params leading/trailing/alone (%4), fragment (%8). */
  private def messyUrl(id: Column, source: Column): Column = concat(
    when(id % 5 === 0, lit("HTTPS")).otherwise(lit("http")), lit("://"),
    when(id % 3 === 0, lit("WWW.")).otherwise(lit("")),
    lit("Site"), id % 37, lit(".Example.COM"),
    when(id % 2 === 0,
      when(id % 5 === 0, lit(":443")).otherwise(lit(":80")))
      .otherwise(when(id % 11 === 0, lit(":8080")).otherwise(lit(""))),
    lit("/Articles/"), source, lit("/"), id,
    when(id % 6 === 0, lit("/")).otherwise(lit("")),
    when(id % 4 === 0, concat(lit("?utm_source=feed&page="), id % 7))
      .when(id % 4 === 1, concat(lit("?page="), id % 7, lit("&utm_campaign=x")))
      .when(id % 4 === 2, lit("?utm_medium=em"))
      .otherwise(lit("")),
    when(id % 8 === 0, lit("#Section2")).otherwise(lit("")))

  /** The SAME messy URL in DuckDB SQL — literal-for-literal. */
  private val messyUrlSql: String =
    """CASE WHEN doc_id % 5 = 0 THEN 'HTTPS' ELSE 'http' END || '://' ||
       CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
       'Site' || (doc_id % 37) || '.Example.COM' ||
       CASE WHEN doc_id % 2 = 0
            THEN CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE ':80' END
            ELSE CASE WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END END ||
       '/Articles/' || source || '/' || doc_id ||
       CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END ||
       CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&page=' || (doc_id % 7)
            WHEN doc_id % 4 = 1 THEN '?page=' || (doc_id % 7) || '&utm_campaign=x'
            WHEN doc_id % 4 = 2 THEN '?utm_medium=em'
            ELSE '' END ||
       CASE WHEN doc_id % 8 = 0 THEN '#Section2' ELSE '' END"""

  /** The oracle's independent canonicalization: the 7 steps re-spelled
    * in DuckDB regex ops over a `u(doc_id, url)` CTE. Emits
    * `hp(doc_id, url, scheme, host, path, q0)`. */
  /** [[canonCtesSql]] with PREFIXED internal CTE names, so a composing
    * oracle (the crawl-to-corpus capstone) can stack it next to CTE
    * chains that already use `c`/`h`/`hp`. Emits `<p>hp`. */
  private[queries] def canonCtesSqlPrefixed(p: String): String =
    s"""${p}c AS (
          SELECT doc_id, url,
            LOWER(REGEXP_EXTRACT(TRIM(url),
              '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
            REGEXP_REPLACE(REGEXP_REPLACE(TRIM(url),
              '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '#.*$$', '') AS nofrag
          FROM u),
        ${p}h AS (
          SELECT *,
            REGEXP_REPLACE(LOWER(REGEXP_EXTRACT(nofrag, '^([^/?]*)', 1)),
              '^www\\.', '') AS hostport,
            REGEXP_REPLACE(nofrag, '^[^/?]*', '') AS rest
          FROM ${p}c),
        ${p}hp AS (
          SELECT doc_id, url, scheme,
            CASE WHEN scheme = 'http'
                   THEN REGEXP_REPLACE(hostport, ':80$$', '')
                 WHEN scheme = 'https'
                   THEN REGEXP_REPLACE(hostport, ':443$$', '')
                 ELSE hostport END AS host,
            REGEXP_REPLACE(REGEXP_EXTRACT(rest, '^([^?]*)', 1),
              '/+$$', '') AS path,
            REGEXP_REPLACE(REGEXP_REPLACE(
              REGEXP_REPLACE(rest, '^[^?]*', ''),
              '[?&]${UrlCuration.TrackingParamsRe}=[^&]*', '', 'g'),
              '^&', '?') AS q0
          FROM ${p}h)"""

  private[queries] val canonCtesSql: String = canonCtesSqlPrefixed("")

  private[queries] val canonicalSql =
    "scheme || '://' || host || path || " +
      "(CASE WHEN q0 = '?' THEN '' ELSE q0 END)"

  /** URL canonicalization under the hash gate. */
  val urlCanonical: Q = (s, dir) => {
    val d = Scan.table(s, dir, "documents")
      .select(col("doc_id"),
        messyUrl(col("doc_id"), col("source")).as("url"))
    UrlCuration.withDomain(
        UrlCuration.withCanonicalUrl(d, "url"), "url")
      .select("doc_id", "url", "canonical_url", "domain")
      .orderBy("doc_id")
  }

  /** Canonical-URL keep-smallest-id dedup under the hash gate. The
    * page path collapses to doc_id % 20 (no source component), so
    * scheme/www/port/tracking/fragment VARIANTS of the same 20 pages
    * collide exactly when canonicalization is correct; `doc:` rows
    * (%13) are non-URLs and must be exempt. */
  val urlDedup: Q = (s, dir) => {
    val id = col("doc_id")
    val url = when(id % 13 === 0, concat(lit("doc:"), id)).otherwise(concat(
      when(id % 5 === 0, lit("HTTPS")).otherwise(lit("http")), lit("://"),
      when(id % 3 === 0, lit("WWW.")).otherwise(lit("")),
      lit("Site"), id % 10, lit(".Example.COM"),
      when(id % 2 === 0,
        when(id % 5 === 0, lit(":443")).otherwise(lit(":80")))
        .otherwise(lit("")),
      lit("/Page/"), id % 20,
      when(id % 6 === 0, lit("/")).otherwise(lit("")),
      when(id % 4 === 2, lit("?utm_medium=em")).otherwise(lit("")),
      when(id % 8 === 0, lit("#Section2")).otherwise(lit(""))))
    val d = Scan.table(s, dir, "documents")
      .select(col("doc_id"), url.as("url"))
    UrlCuration.dedupByUrl(d, "doc_id", "url")
      .select("doc_id").orderBy("doc_id")
  }

  private val urlDedupMessySql: String =
    """CASE WHEN doc_id % 13 = 0 THEN 'doc:' || doc_id ELSE
         CASE WHEN doc_id % 5 = 0 THEN 'HTTPS' ELSE 'http' END || '://' ||
         CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
         'Site' || (doc_id % 10) || '.Example.COM' ||
         CASE WHEN doc_id % 2 = 0
              THEN CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE ':80' END
              ELSE '' END ||
         '/Page/' || (doc_id % 20) ||
         CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END ||
         CASE WHEN doc_id % 4 = 2 THEN '?utm_medium=em' ELSE '' END ||
         CASE WHEN doc_id % 8 = 0 THEN '#Section2' ELSE '' END
       END"""

  /** Per-domain cap under the hash gate (cap=3, deterministic
    * smallest-id order — the constant-score [[UrlCuration.domainCap]]
    * path; the oracle re-ranks with a window over ITS canonical
    * domain). */
  val domainCap: Q = (s, dir) => {
    val d = Scan.table(s, dir, "documents")
      .select(col("doc_id"),
        messyUrl(col("doc_id"), col("source")).as("url"))
    UrlCuration.domainCap(d, "doc_id", "url", cap = 3)
      .select("doc_id", "domain", "domain_rank")
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = ListMap(
    "q_url_canonical" -> urlCanonical,
    "q_url_dedup" -> urlDedup,
    "q_domain_cap" -> domainCap)

  val oracles: Map[String, String] = ListMap(
    "q_url_canonical" ->
      s"""WITH u AS (SELECT doc_id, $messyUrlSql AS url FROM documents),
          $canonCtesSql
          SELECT doc_id, url, $canonicalSql AS canonical_url,
            host AS domain
          FROM hp ORDER BY doc_id""",
    "q_url_dedup" ->
      s"""WITH u AS (SELECT doc_id, $urlDedupMessySql AS url FROM documents),
          $canonCtesSql,
          urls AS (
            SELECT doc_id, $canonicalSql AS canonical
            FROM hp WHERE scheme <> ''),
          winners AS (
            SELECT doc_id FROM urls
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY canonical ORDER BY doc_id) = 1)
          SELECT doc_id FROM winners
          UNION ALL SELECT doc_id FROM hp WHERE scheme = ''
          ORDER BY doc_id""",
    "q_domain_cap" ->
      s"""WITH u AS (SELECT doc_id, $messyUrlSql AS url FROM documents),
          $canonCtesSql,
          ranked AS (
            SELECT doc_id, host AS domain,
              ROW_NUMBER() OVER (
                PARTITION BY host ORDER BY doc_id) AS domain_rank
            FROM hp)
          SELECT doc_id, domain, CAST(domain_rank AS INTEGER) AS domain_rank
          FROM ranked WHERE domain_rank <= 3 ORDER BY doc_id""")
}
