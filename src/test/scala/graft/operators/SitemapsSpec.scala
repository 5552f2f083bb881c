package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SitemapsSpec extends SparkSpec {
  import spark.implicits._

  test("parseSitemapPages: urlset entries, index entries, CDATA, relative locs") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        | <url>
        |  <loc>/a/1</loc>
        |  <lastmod>2026-03-01</lastmod>
        |  <changefreq>DAILY</changefreq>
        |  <priority>0.9</priority>
        | </url>
        | <url><loc><![CDATA[ http://other.com/b ]]></loc>
        |      <lastmod>2026-03-02T08:15:30Z</lastmod></url>
        | <url><loc>mailto:no@no.com</loc></url>
        | <url><loc></loc></url>
        | <url><loc>/a/1</loc></url>
        | <sitemap><loc>/maps/sub.xml</loc></sitemap>
        |</urlset>""".stripMargin
    val pages = Seq((1L, "http://site.com/maps/m.xml", xml))
      .toDF("id", "url", "xml")
    val out = Sitemaps.parseSitemapPages(pages, "id", "url", "xml")
      .orderBy("kind", "loc").collect()
    assert(out.length == 3)
    val bySite = out.map(r =>
      (r.getAs[String]("kind"), r.getAs[String]("loc"))).toSeq
    assert(bySite == Seq(
      ("sitemap", "http://site.com/maps/sub.xml"),
      ("url", "http://other.com/b"),
      ("url", "http://site.com/a/1")))
    val a1 = out.find(_.getAs[String]("loc") == "http://site.com/a/1").get
    // the duplicate entry exists → the all-null-metadata struct wins
    assert(a1.getAs[String]("changefreq") == null)
    val b = out.find(_.getAs[String]("loc") == "http://other.com/b").get
    assert(b.getAs[java.sql.Timestamp]("lastmod") ==
      java.sql.Timestamp.from(java.time.Instant.parse("2026-03-02T08:15:30Z")))
  }

  test("parseSitemapPages: metadata parses tolerantly when unique") {
    val xml = "<urlset><url><loc>/x</loc><lastmod>2026-03-01</lastmod>" +
      "<changefreq>Weekly</changefreq><priority>0.5</priority></url>" +
      "<url><loc>/bad</loc><lastmod>dunno</lastmod>" +
      "<changefreq>often</changefreq><priority>high</priority></url></urlset>"
    val out = Sitemaps.parseSitemapPages(
        Seq((1L, "http://s.com/m.xml", xml)).toDF("id", "url", "xml"),
        "id", "url", "xml")
      .orderBy("loc").collect()
    val bad = out(0) // /bad
    assert(bad.getAs[java.sql.Timestamp]("lastmod") == null)
    assert(bad.getAs[String]("changefreq") == null)
    assert(bad.get(bad.fieldIndex("priority")) == null)
    val x = out(1) // /x
    assert(x.getAs[String]("changefreq") == "weekly")
    assert(x.getAs[Double]("priority") == 0.5)
  }

  test("changefreqRate: the protocol tokens map; unknown/null → null") {
    val df = Seq("daily", "weekly", "bogus", null)
      .map(Tuple1(_)).toDF("cf")
      .select(Sitemaps.changefreqRate(col("cf")).as("r")).collect()
    assert(df(0).getDouble(0) == 1.0)
    assert(df(1).getDouble(0) == 1.0 / 7.0)
    assert(df(2).isNullAt(0) && df(3).isNullAt(0))
  }

  test("estimateChangeRate: the bias-reduced Cho/Garcia-Molina estimator") {
    def ts(h: Long): java.sql.Timestamp = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1767225600L + h * 3600))
    // url A: 5 fetches, hourly, hash changes on fetches 3 and 5 → n=4,
    // X=2, mean interval 3600 s
    // url B: 2 fetches, no change → n=1 < minObservations → NULL rate
    // url C: every revisit changed → the naive estimator is infinite,
    // the +0.5 terms keep it finite
    val fetches = Seq(
      ("A", ts(0), "h1"), ("A", ts(1), "h1"), ("A", ts(2), "h2"),
      ("A", ts(3), "h2"), ("A", ts(4), "h3"),
      ("B", ts(0), "h1"), ("B", ts(5), "h1"),
      ("C", ts(0), "h1"), ("C", ts(6), "h2"), ("C", ts(12), "h3"))
      .toDF("url", "fetch_ts", "content_hash")
    val out = UrlCuration.estimateChangeRate(
        fetches, "url", "fetch_ts", "content_hash")
      .collect().map(r => r.getAs[String]("url") -> r).toMap
    val a = out("A")
    assert(a.getAs[Long]("n_obs") == 4 && a.getAs[Long]("n_changed") == 2)
    assert(a.getAs[Double]("mean_interval_s") == 3600.0)
    val expectedA = -math.log((4 - 2 + 0.5) / (4 + 0.5)) / 3600.0 * 86400.0
    assert(math.abs(a.getAs[Double]("change_rate_per_day") - expectedA) < 1e-9)
    assert(out("B").isNullAt(out("B").fieldIndex("change_rate_per_day")))
    val c = out("C")
    assert(c.getAs[Long]("n_changed") == 2 && c.getAs[Long]("n_obs") == 2)
    val expectedC = -math.log(0.5 / 2.5) / (6 * 3600.0) * 86400.0
    assert(math.abs(c.getAs[Double]("change_rate_per_day") - expectedC) < 1e-9)
  }
}
