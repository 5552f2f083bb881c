package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RobotsRulesSpec extends SparkSpec {
  import spark.implicits._

  private def allowed(txt: String, path: String, agent: String = "graftbot") =
    RobotsRules.parse(txt, agent).isAllowed(path)

  test("rule matching: prefixes, wildcards, end anchors") {
    val txt = "User-agent: *\nDisallow: /private/\nDisallow: /tmp*\n" +
      "Disallow: /deep/*/x$\nAllow: /private/pub*"
    assert(!allowed(txt, "/private/a"))
    assert(allowed(txt, "/privateer")) // prefix is PATH prefix, not word
    assert(!allowed(txt, "/tmpfile"))
    assert(!allowed(txt, "/deep/a/b/x"))  // '*' spans '/'
    assert(allowed(txt, "/deep/a/x1"))    // anchored: not at the end
    assert(allowed(txt, "/private/pub/1")) // longer Allow wins
    assert(allowed(txt, "/other"))
  }

  test("precedence: longest rule wins, Allow wins exact ties") {
    val txt = "User-agent: *\nDisallow: /a/b\nAllow: /a/\n"
    assert(allowed(txt, "/a/c") && !allowed(txt, "/a/b1"))
    val tie = "User-agent: *\nDisallow: /dir/\nAllow: /dir*\n" // len 5 both
    assert(allowed(tie, "/dir/x"))
  }

  test("group selection: exact agent beats *, multiple groups merge") {
    val txt = "User-agent: graftbot\nDisallow: /bot/\n\n" +
      "User-agent: *\nDisallow: /\n\n" +
      "User-agent: GRAFTBOT\nDisallow: /bot2/"
    assert(!allowed(txt, "/bot/x") && !allowed(txt, "/bot2/x"))
    assert(allowed(txt, "/anything")) // the '*' group is NOT merged in
    // another agent falls back to '*'
    assert(!allowed(txt, "/anything", agent = "otherbot"))
    // shared agent run: one rule block serves two agents
    val shared = "User-agent: a\nUser-agent: graftbot\nDisallow: /x/"
    assert(!allowed(shared, "/x/1") && allowed(shared, "/y"))
  }

  test("defaults and noise: empty Disallow, comments, unknown keys, no group") {
    val txt = "# hello\nUser-agent: *\nCrawl-delay: 10\n" +
      "Sitemap: http://e.com/s.xml\nDisallow:\nDisallow: /q/ # trailing"
    assert(allowed(txt, "/anything"))
    assert(!allowed(txt, "/q/1")) // inline comment stripped
    assert(allowed("User-agent: other\nDisallow: /", "/x")) // no group
    assert(allowed("", "/x"))
  }

  test("native expression: per-row evaluation, NULL-safe, path extraction") {
    val robots = "User-agent: *\nDisallow: /no/"
    val rows = Seq(
      (1L, robots, "http://a.com/no/x"),
      (2L, robots, "http://a.com/yes"),
      (3L, null.asInstanceOf[String], "http://a.com/no/x"))
      .toDF("id", "txt", "url")
    val out = rows.select(col("id"),
        GraftFunctions.robots_allowed(col("txt"),
          graft.operators.Robots.pathAndQueryOf(col("url")), "bot").as("ok"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else Boolean.box(r.getBoolean(1)))).toMap
    assert(out(1L) == false && out(2L) == true && out(3L) == null)
    // path-and-query extraction: query included, bare host → '/'
    val p = Seq(("http://a.com", "http://a.com/d?x=1#f"))
      .toDF("u1", "u2")
      .select(graft.operators.Robots.pathAndQueryOf(col("u1")),
        graft.operators.Robots.pathAndQueryOf(col("u2")))
      .collect()(0)
    assert(p.getString(0) == "/" && p.getString(1) == "/d?x=1")
  }

  test("crawl-delay: group-scoped, exact beats *, max merge, noise ignored") {
    // the selected group's delay only — an exact group WITHOUT a delay
    // must not inherit the star group's
    val txt = "User-agent: graftbot\nCrawl-delay: 2.5\nDisallow: /x/\n\n" +
      "User-agent: *\nCrawl-delay: 30\nDisallow: /"
    assert(RobotsRules.parse(txt, "graftbot").crawlDelay.contains(2.5))
    assert(RobotsRules.parse(txt, "otherbot").crawlDelay.contains(30.0))
    val noDelay = "User-agent: graftbot\nDisallow: /x/\n\n" +
      "User-agent: *\nCrawl-delay: 30\nDisallow: /"
    assert(RobotsRules.parse(noDelay, "graftbot").crawlDelay.isEmpty)
    // repeated values merge to the MAX (most polite); junk ignored
    val multi = "User-agent: *\nCrawl-delay: 5\nCrawl-delay: 9\n" +
      "Crawl-delay: soon\nCrawl-delay: -1"
    assert(RobotsRules.parse(multi, "graftbot").crawlDelay.contains(9.0))
    // native expression: value, none → NULL, NULL text → NULL
    val rows = Seq((1L, txt), (2L, noDelay), (3L, null.asInstanceOf[String]))
      .toDF("id", "txt")
      .select(col("id"), org.apache.spark.sql.graftbridge.ColumnBridge.column(
        RobotsCrawlDelay(org.apache.spark.sql.graftbridge.ColumnBridge
          .expression(col("txt")), "graftbot")).as("d"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else Double.box(r.getDouble(1)))).toMap
    assert(rows(1L) == 2.5 && rows(2L) == null && rows(3L) == null)
  }

  test("sitemaps: global across groups, first-token cut, dedup, order, NULL-safe expression") {
    // Sitemap lines are GLOBAL (sitemaps.org): collected wherever they
    // sit — before any group, inside a group, after — for EVERY agent
    val txt = "Sitemap: http://e.com/a.xml\n" +
      "User-agent: graftbot\nDisallow: /x/\n" +
      "Sitemap: http://e.com/b.xml extra-token\n" +
      "User-agent: *\nDisallow: /\n" +
      "sitemap:http://e.com/c.xml\n" +
      "Sitemap: http://e.com/a.xml\n" + // duplicate → once
      "Sitemap:\n" // empty value → skipped
    assert(RobotsRules.parse(txt, "graftbot").sitemaps ==
      Vector("http://e.com/a.xml", "http://e.com/b.xml", "http://e.com/c.xml"))
    assert(RobotsRules.parse(txt, "otherbot").sitemaps ==
      RobotsRules.parse(txt, "graftbot").sitemaps)
    // a Sitemap line must NOT leak into the rule groups around it
    assert(RobotsRules.parse(txt, "graftbot").isAllowed("/x/p") == false)
    assert(RobotsRules.parse(txt, "graftbot").isAllowed("/y") == true)
    // native expression: array value, empty text → empty array, NULL → NULL
    val rows = Seq((1L, txt), (2L, "User-agent: *\nDisallow: /"),
      (3L, null.asInstanceOf[String])).toDF("id", "txt")
      .select(col("id"), org.apache.spark.sql.graftbridge.ColumnBridge.column(
        RobotsSitemaps(org.apache.spark.sql.graftbridge.ColumnBridge
          .expression(col("txt")), "graftbot")).as("sm"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1).toVector)).toMap
    assert(rows(1L) == Vector("http://e.com/a.xml", "http://e.com/b.xml",
      "http://e.com/c.xml"))
    assert(rows(2L) == Vector.empty)
    assert(rows(3L) == null)
  }

  test("sitemapSeeds: canonicalized, urlish-screened, distinct declaring domains") {
    import graft.operators.Robots
    val robots = Seq(
      ("a.com", "User-agent: *\nSitemap: http://a.com/S.xml\n" +
        "Sitemap: http://hub.com/all.xml"),
      ("b.com", "Sitemap: http://hub.com/all.xml?utm_source=rss\n" +
        "Sitemap: doc:ignored"),
      ("c.com", "User-agent: *\nDisallow: /"))
      .toDF("domain", "txt")
    val out = Robots.sitemapSeeds(robots, "domain", "txt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    // hub.com/all.xml declared by BOTH hosts (b's utm variant
    // canonicalizes into it) → n_refs 2; doc: value screened
    assert(out.toSeq == Seq(
      ("http://a.com/S.xml", "a.com", 1L),
      ("http://hub.com/all.xml", "hub.com", 2L)))
  }

  test("crawlFrontierWithSitemaps: provenance union, shared seen screen") {
    import graft.operators.{Robots, UrlCuration}
    val pages = Seq(
      (1L, "http://a.com/p", """<a href="/next">n</a>"""),
      (2L, "http://a.com/sm.xml", "<p>already fetched</p>"))
      .toDF("doc_id", "url", "html")
    val robots = Seq(
      // first sitemap already fetched → screened; second is fresh
      ("a.com", "User-agent: *\nSitemap: http://a.com/sm.xml\n" +
        "Sitemap: http://a.com/sm2.xml")).toDF("domain", "txt")
    val out = UrlCuration.crawlFrontierWithSitemaps(pages,
        "doc_id", "url", "html", robots, "domain", "txt")
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      ("http://a.com/next", "a.com", 1L, "link"),
      ("http://a.com/sm2.xml", "a.com", 1L, "sitemap")))
  }

  test("robotsFromPages: the /robots.txt pages become the keyed relation, first fetch wins") {
    import graft.operators.Robots
    val pages = Seq(
      (1L, "http://a.com/page", "<html>content</html>"),
      (2L, "http://A.com/robots.txt", "User-agent: *\nDisallow: /x/"),
      (5L, "http://a.com/robots.txt#frag", "User-agent: *\nDisallow: /"),
      (3L, "http://b.com:80/robots.txt", "User-agent: *\nDisallow: /y/"),
      (4L, "not a url", "junk"),
      (6L, "http://c.com/robots.txt/extra", "not the robots path"))
      .toDF("id", "url", "body")
    val out = Robots.robotsFromPages(pages, "id", "url", "body")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // host case + default port + fragment all canonicalize; the
    // re-fetch (id 5) loses to the first fetch (id 2); /robots.txt/extra
    // is NOT the robots path; non-URLs screen out
    assert(out == Map(
      "a.com" -> "User-agent: *\nDisallow: /x/",
      "b.com" -> "User-agent: *\nDisallow: /y/"))
    // the output is keyed one-row-per-domain — filterAllowed accepts it
    val content = Seq((1L, "http://a.com/x/p"), (2L, "http://a.com/ok"),
      (3L, "http://b.com/y/p"), (4L, "http://c.com/anything"))
      .toDF("id", "url")
    val kept = Robots.filterAllowed(content, "url",
        Robots.robotsFromPages(pages, "id", "url", "body"),
        "domain", "robots_txt")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L))
  }

  test("filterAllowed: duplicate robots rows fail LOUDLY; join is a plain equi-join") {
    import graft.operators.Robots
    val pages = Seq((1L, "http://a.com/x"), (2L, "http://b.com/y"))
      .toDF("id", "url")
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /no/"))
      .toDF("domain", "txt")
    val out = Robots.filterAllowed(pages, "url", robots, "domain", "txt")
    assert(out.count() == 2L)
    // plan contract: page domain projected map-side, then a plain
    // column equi-join — the join condition carries no regex chain
    val plan = out.queryExecution.optimizedPlan.toString
    val joinLine = plan.linesIterator.find(_.contains("Join")).getOrElse("")
    assert(joinLine.contains("__pg_domain") && joinLine.contains("__rb_domain")
      && !joinLine.toLowerCase.contains("regexp"),
      s"expected a pre-keyed equi-join, got:\n$plan")
    // two rows for one domain would silently duplicate every matching
    // page — the keyed build must fail instead
    val dup = Seq(("a.com", "User-agent: *\nDisallow: /no/"),
      ("a.com", "User-agent: *\nDisallow: /"))
      .toDF("domain", "txt")
    val e = intercept[Exception] {
      Robots.filterAllowed(pages, "url", dup, "domain", "txt").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("duplicate robots rows")),
      s"unexpected error: $e")
  }
}
