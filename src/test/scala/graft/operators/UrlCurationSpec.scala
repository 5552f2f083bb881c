package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlCurationSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(Tuple1(url)).toDF("url")
      .select(UrlCuration.canonicalUrl(col("url")).as("c"))
      .collect().head.getString(0)

  test("canonicalization: the 8-step contract, step by step") {
    // scheme+host lower, path case preserved
    assert(canon("HTTP://Example.COM/Docs/A") == "http://example.com/Docs/A")
    // www. strip, fragment strip
    assert(canon("https://www.example.com/a#Section") ==
      "https://example.com/a")
    // default ports stripped, non-default kept
    assert(canon("http://example.com:80/a") == "http://example.com/a")
    assert(canon("https://example.com:443/a") == "https://example.com/a")
    assert(canon("http://example.com:8080/a") == "http://example.com:8080/a")
    // https :80 is NOT default — kept
    assert(canon("https://example.com:80/a") == "https://example.com:80/a")
    // tracking params: leading, middle, trailing, all-tracked
    assert(canon("http://e.com/a?utm_source=x&page=2") ==
      "http://e.com/a?page=2")
    assert(canon("http://e.com/a?page=2&utm_campaign=y&id=3") ==
      "http://e.com/a?page=2&id=3")
    assert(canon("http://e.com/a?gclid=abc") == "http://e.com/a")
    // trailing slash runs stripped; root URL collapses to bare host
    assert(canon("http://e.com/a///") == "http://e.com/a")
    assert(canon("http://e.com/") == "http://e.com")
    // percent-encoding normalization (step 2): unreserved escapes
    // decode in either hex case, reserved escapes uppercase but stay
    // encoded, malformed % stays literal — and it reaches the HOST too
    assert(canon("http://e.com/%7eu/%7EV") == "http://e.com/~u/~V")
    assert(canon("http://e.com/a%2fb") == "http://e.com/a%2Fb")
    assert(canon("http://e.com/a%zzb%") == "http://e.com/a%zzb%")
    assert(canon("http://e%2Ecom/x") == "http://e.com/x")
    // an escaped '?' (%3F) is reserved: normalized but NOT decoded, so
    // it never becomes a real query delimiter
    assert(canon("http://e.com/a%3fb") == "http://e.com/a%3Fb")
    // non-URL passes through trimmed
    assert(canon("  not a url  ") == "not a url")
    // trim + everything at once
    assert(canon(" HTTPS://WWW.Site7.Example.COM:443/Articles/src1/7/?utm_medium=em#f ") ==
      "https://site7.example.com/Articles/src1/7")
  }

  test("domainOf extracts the canonical host; non-URLs map to ''") {
    val d = Seq(
      (1L, "HTTP://WWW.A.com:80/x"),
      (2L, "https://b.org:8443/y"),
      (3L, "plain text"),
      (4L, null: String)
    ).toDF("id", "url")
      .select(col("id"), UrlCuration.domainOf(col("url")).as("d"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(d(1L).contains("a.com"))
    assert(d(2L).contains("b.org:8443"))
    assert(d(3L).contains(""))
    assert(d(4L).isEmpty)
  }

  test("dedupByUrl keeps the smallest id per canonical URL; non-URLs and nulls are exempt") {
    val docs = Seq(
      (1L, "http://e.com/a?utm_source=x"),     // canonical http://e.com/a
      (2L, "HTTP://E.COM/a#frag"),             // same canonical — dropped
      (3L, "http://e.com/a/"),                 // same canonical — dropped
      (4L, "http://e.com/b"),                  // distinct — kept
      (5L, "not a url"),                       // exempt — kept
      (6L, "not a url"),                       // exempt too (no identity)
      (7L, null: String),                      // exempt — kept
      (8L, "%68ttp://e.com/b")                 // escaped scheme: SAME canonical as 4 — dropped
    ).toDF("id", "url")
    val kept = UrlCuration.dedupByUrl(docs, "id", "url")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L, 6L, 7L))
  }

  test("isUrlish classifies on the pct-normalized form, like the canonicalizer") {
    val rows = Seq(
      (1L, "%68ttp://e.com/x"), // escaped scheme — IS a URL after decode
      (2L, "http://e.com/x"),
      (3L, "doc:17"),
      (4L, "plain text"))
      .toDF("id", "url")
      .select(col("id"), UrlCuration.isUrlish(col("url")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rows == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false))
  }

  test("domainCap keeps cap docs per domain by (score desc, id), ranks 1-based") {
    val docs = Seq.tabulate(12) { i =>
      (i.toLong, s"http://d${i % 2}.com/p$i", (i % 3).toDouble)
    }.toDF("id", "url", "q")
    val out = UrlCuration.domainCap(docs, "id", "url", cap = 2,
        score = col("q"))
      .select("id", "domain", "domain_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.length == 4)
    // d0.com ids 0,2,4,6,8,10 with q = 0,2,1,0,2,1 → best (2.0, id 2), (2.0, id 8)
    val d0 = out.filter(_._2 == "d0.com").sortBy(_._3).map(x => (x._1, x._3))
    assert(d0.toSeq == Seq((2L, 1), (8L, 2)))
    // d1.com ids 1,3,5,7,9,11 with q = 1,0,2,1,0,2 → (2.0, id 5), (2.0, id 11)
    val d1 = out.filter(_._2 == "d1.com").sortBy(_._3).map(x => (x._1, x._3))
    assert(d1.toSeq == Seq((5L, 1), (11L, 2)))
  }

  test("registeredDomainCap collapses a subdomain farm the host cap misses") {
    // 6 farm docs across distinct subdomains of one registered domain
    // (multi-label co.uk suffix), 2 platform user sites
    val docs = ((0L to 5L).map(i => (i, s"http://sub$i.farm.co.uk/p/$i")) ++
      Seq((10L, "http://alice.github.io/x"), (11L, "http://bob.github.io/x")))
      .toDF("id", "url")
    // host cap sees 8 distinct hosts → nothing capped
    assert(UrlCuration.domainCap(docs, "id", "url", cap = 2).count() == 8L)
    val out = UrlCuration.registeredDomainCap(docs, "id", "url", cap = 2,
        table = graft.functions.PslTable.fixture)
      .select("id", "domain", "domain_rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // the farm shares ONE unit and keeps only the smallest 2 ids...
    assert(out.filter(_._2 == "farm.co.uk").map(_._1).sorted.toSeq == Seq(0L, 1L))
    // ...while each github.io user site is its own (private-section) unit
    assert(out.filter(_._2 == "alice.github.io").map(_._1).toSeq == Seq(10L))
    assert(out.filter(_._2 == "bob.github.io").map(_._1).toSeq == Seq(11L))
    assert(out.length == 4)
  }

  test("crawlFrontier: both quote styles, resolution, screens, seen removal, in-degree") {
    val pages = Seq(
      (1L, "http://a.com/p/1",
        """<a href="http://B.com/x#frag">1</a> <a href='http://c.com/y/'>2</a>
           <a href="/rel">3</a> <a href="doc:5">4</a>
           <a href="../up">5</a> <a href="#frag">6</a>"""),
      (2L, "http://b.com/x", // fetched: b.com/x is SEEN
        """<a href="http://b.com/x?utm_source=z">self</a>
           <a href="http://c.com/y">again</a>"""),
      (3L, "http://d.com/q", "<p>no links</p>"))
      .toDF("doc_id", "url", "html")
    val out = UrlCuration.crawlFrontier(pages, "doc_id", "url", "html")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    // b.com/x canonicalizes into the seen set (page 2's own URL); the
    // fragment-only link resolves to page 1 itself → also seen; the
    // root-relative and dot-segment links RESOLVE against the page
    // URL; doc: links screened; c.com/y referenced by BOTH pages
    // (trailing-slash variant collapses) → in-degree 2
    assert(out.toSeq == Seq(
      ("http://a.com/rel", "a.com", 1L),
      ("http://a.com/up", "a.com", 1L),
      ("http://c.com/y", "c.com", 2L)))
  }

  test("url_resolve: the RFC 3986 branch table and dot-segment removal") {
    import graft.functions.UrlResolve.resolve
    val base = "http://a.com/dir/sub/page.html?q=1#frag"
    assert(resolve(base, "x.html") == "http://a.com/dir/sub/x.html")
    assert(resolve(base, "../x") == "http://a.com/dir/x")
    assert(resolve(base, "../../x") == "http://a.com/x")
    assert(resolve(base, "../../../../x") == "http://a.com/x") // over the root
    assert(resolve(base, "./x") == "http://a.com/dir/sub/x")
    assert(resolve(base, "/abs?p=2") == "http://a.com/abs?p=2")
    assert(resolve(base, "//cdn.com/a") == "http://cdn.com/a")
    assert(resolve(base, "?p=2") == "http://a.com/dir/sub/page.html?p=2")
    // fragment-only and empty: the page itself (base query kept, base
    // fragment dropped)
    assert(resolve(base, "#s") == "http://a.com/dir/sub/page.html?q=1#s")
    assert(resolve(base, "") == "http://a.com/dir/sub/page.html?q=1")
    // ref with its own scheme wins outright; opaque forms pass through
    assert(resolve(base, "https://o.com/a/../b") == "https://o.com/b")
    assert(resolve(base, "doc:raw") == "doc:raw")
    assert(resolve(base, "mailto:x@y.z") == "mailto:x@y.z")
    // trailing dot segments keep the directory slash (RFC §5.2.4)
    assert(resolve(base, "..") == "http://a.com/dir/")
    assert(resolve(base, ".") == "http://a.com/dir/sub/")
    // empty base path ⇒ '/' + ref path; empty segments are preserved
    // and popped like any segment
    assert(resolve("http://a.com", "x") == "http://a.com/x")
    assert(resolve("http://a.com/a//b/", "../x") == "http://a.com/a//x")
    assert(resolve("http://a.com/a//../x", "") == "http://a.com/a//../x")
    // a relative ref against a non-URL base has no target
    assert(resolve("doc:17", "x.html") == null)
    // whitespace-trimmed inputs (href values legally carry it)
    assert(resolve(base, " x.html ") == "http://a.com/dir/sub/x.html")
  }

  test("fetchWaves: delay budgets, defaults, clamping, and the horizon") {
    // a.com declares Crawl-delay 10 → 3 slots per 30 s wave; b.com has
    // no robots row → the 5 s default → 6 slots; c.com declares 0.2 →
    // clamped to the 1 s floor → 30 slots
    val frontier = ((1 to 8).map(i => (s"http://a.com/p$i", i.toLong)) ++
      Seq(("http://b.com/x", 5L), ("http://b.com/y", 9L),
        ("http://c.com/z", 1L))).toDF("url", "n_refs")
    val robots = Seq(
      ("a.com", "User-agent: *\nCrawl-delay: 10"),
      ("c.com", "User-agent: *\nCrawl-delay: 0.2")).toDF("d", "r")
    val out = UrlCuration.fetchWaves(frontier, "url", robots, "d", "r",
        waveSeconds = 30.0, defaultDelaySeconds = 5.0,
        minDelaySeconds = 1.0, maxWaves = 2, priority = col("n_refs"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getDouble(4))))
      .toMap
    // a.com ranked p8..p1 best-first: wave 1 = p8 p7 p6, wave 2 =
    // p5 p4 p3, p2/p1 beyond the horizon → dropped
    assert(out("http://a.com/p8") == (("a.com", 1, 1, 10.0)))
    assert(out("http://a.com/p6") == (("a.com", 1, 3, 10.0)))
    assert(out("http://a.com/p5") == (("a.com", 2, 1, 10.0)))
    assert(out("http://a.com/p3") == (("a.com", 2, 3, 10.0)))
    assert(!out.contains("http://a.com/p2") && !out.contains("http://a.com/p1"))
    // b.com: both fit in wave 1, higher in-degree first
    assert(out("http://b.com/y") == (("b.com", 1, 1, 5.0)))
    assert(out("http://b.com/x") == (("b.com", 1, 2, 5.0)))
    // c.com: the declared 0.2 clamps to the politeness floor
    assert(out("http://c.com/z") == (("c.com", 1, 1, 1.0)))
  }

  test("fetchWaves: agent-group selection drives the delay; plan uses the bounded heap") {
    val frontier = (1 to 4).map(i => (s"http://a.com/p$i", 1L))
      .toDF("url", "n_refs")
    val robots = Seq(("a.com",
      "User-agent: graftbot\nCrawl-delay: 15\n\nUser-agent: *\nCrawl-delay: 1"))
      .toDF("d", "r")
    val out = UrlCuration.fetchWaves(frontier, "url", robots, "d", "r",
      agent = "graftbot", waveSeconds = 30.0, maxWaves = 2,
      priority = col("n_refs"))
    val rows = out.collect()
    // graftbot's own group (delay 15 → 2 slots/wave) must win over the
    // star group's 1 s; with 2 waves only 4 urls fit, 2 per wave
    assert(rows.map(r => (r.getInt(2), r.getInt(3))).sorted.toSeq ==
      Seq((1, 1), (1, 2), (2, 1), (2, 2)))
    assert(rows.forall(_.getDouble(4) == 15.0))
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("top_k_by_score"), s"bounded rank expected:\n$plan")
    assert(!plan.contains("Window"), s"no per-host window:\n$plan")
  }

  test("fetchWaves closes the loop: wave N's fetches feed wave N+1's frontier") {
    def pageHtml(links: Seq[String]): String =
      links.map(l => s"""<a href="$l">x</a>""").mkString(" ")
    // wave 0: one seed page linking to three targets on one host
    val wave0 = Seq((1L, "http://s.com/seed",
      pageHtml(Seq("/a", "/b", "/c")))).toDF("doc_id", "url", "html")
    val robots = Seq(("s.com", "User-agent: *\nCrawl-delay: 15"))
      .toDF("d", "r")
    val fr1 = UrlCuration.crawlFrontier(wave0, "doc_id", "url", "html")
    // 15 s delay, 30 s wave → 2 slots: only /a and /b make wave 1
    val w1 = UrlCuration.fetchWaves(fr1, "url", robots, "d", "r",
        waveSeconds = 30.0, maxWaves = 1, priority = col("n_refs"))
      .select("url").collect().map(_.getString(0)).toSet
    assert(w1 == Set("http://s.com/a", "http://s.com/b"))
    // "fetch" wave 1: those pages link onward (/d) and back (/a, /seed)
    val fetched1 = Seq(
      (2L, "http://s.com/a", pageHtml(Seq("/d", "/seed"))),
      (3L, "http://s.com/b", pageHtml(Seq("/a", "/d"))))
      .toDF("doc_id", "url", "html")
    // wave 2's frontier: seen = everything fetched so far (wave 0 + 1)
    val fr2 = UrlCuration.crawlFrontier(wave0.union(fetched1),
      "doc_id", "url", "html")
    val w2 = UrlCuration.fetchWaves(fr2, "url", robots, "d", "r",
        waveSeconds = 30.0, maxWaves = 1, priority = col("n_refs"))
      .collect().map(r => (r.getString(0), r.getInt(3)))
    // /c (still pending from wave 0's links) and /d (new, in-degree 2
    // → ranked first); /a and /seed are SEEN and never re-proposed
    assert(w2.toSet == Set(("http://s.com/d", 1), ("http://s.com/c", 2)))
  }

  test("recrawlWaves: staleness priority orders waves, politeness budget holds") {
    val asOf = 1767225600L
    def ts(hoursAgo: Long): java.sql.Timestamp =
      java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(asOf - hoursAgo * 3600))
    // one host, delay 10 s → 3 slots/wave at waveSeconds=30; four pages
    // whose staleness strictly orders them: rate·age products 24·2=48
    // (saturated), 2·1=2, 0.5·1=0.5, 0.5·0.04≈0.02
    val fresh = Seq(
      ("http://a.example.com/cold", ts(1), 0.5),
      ("http://a.example.com/hot", ts(48), 24.0),
      ("http://a.example.com/warm", ts(24), 2.0),
      ("http://a.example.com/fresh", ts(1), 0.02))
      .toDF("url", "last_fetch_ts", "change_rate")
    val robots = Seq(("a.example.com", "User-agent: *\nCrawl-delay: 10"))
      .toDF("domain", "robots_txt")
    val out = UrlCuration.recrawlWaves(fresh, "url", "last_fetch_ts",
        "change_rate",
        asOf = timestamp_seconds(lit(asOf)),
        robots = robots, domainCol = "domain", robotsCol = "robots_txt",
        waveSeconds = 30.0, maxWaves = 2)
      .collect().map(r => r.getAs[String]("url") ->
        (r.getAs[Int]("wave"), r.getAs[Int]("wave_slot"))).toMap
    // most-likely-stale first: hot(1,1) warm(1,2) cold(1,3) fresh(2,1)
    assert(out("http://a.example.com/hot") == (1, 1))
    assert(out("http://a.example.com/warm") == (1, 2))
    assert(out("http://a.example.com/cold") == (1, 3))
    assert(out("http://a.example.com/fresh") == (2, 1))
    // priority arithmetic: monotone in age and rate, 0 at age 0
    def pri(ageH: Long, rate: Double): Double =
      Seq((ts(ageH), rate)).toDF("t", "r")
        .select(UrlCuration.recrawlPriority(col("t"), col("r"),
          timestamp_seconds(lit(asOf))).as("p"))
        .head().getDouble(0)
    assert(pri(0, 5.0) == 0.0)
    assert(pri(24, 1.0) > pri(12, 1.0))
    assert(pri(12, 2.0) > pri(12, 1.0))
    assert(math.abs(pri(24, 1.0) - (1.0 - math.exp(-1.0))) < 1e-12)
  }

  test("resolveRedirects: chains fold, cycles cap at the horizon, relatives resolve") {
    val pages = Seq(
      // a → b → c (terminal); a's Location is ROOT-RELATIVE
      ("http://x.com/a", 301, "/b"),
      ("http://x.com/b", 302, "http://x.com/c"),
      ("http://x.com/c", 200, null),
      // 2-cycle p ↔ q
      ("http://x.com/p", 301, "http://x.com/q"),
      ("http://x.com/q", 308, "http://x.com/p"),
      // a free-text Location resolves as a RELATIVE reference —
      // exactly what browsers do with it
      ("http://x.com/j", 301, "weird target"),
      // a redirect out of the fetched set: terminal at the stranger
      ("http://x.com/o", 301, "http://elsewhere.com/z"))
      .toDF("url", "http_status", "location")
    val out = UrlCuration.resolveRedirects(
        pages, "url", "http_status", "location", maxHops = 4)
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[String]("final_url"), r.getAs[Long]("hops"),
          r.getAs[Boolean]("resolved")))).toMap
    assert(out("http://x.com/a") == (("http://x.com/c", 2L, true)))
    assert(out("http://x.com/b") == (("http://x.com/c", 1L, true)))
    assert(out("http://x.com/c") == (("http://x.com/c", 0L, true)))
    // the cycle walks exactly maxHops and lands back unresolved
    assert(out("http://x.com/p") == (("http://x.com/p", 4L, false)))
    assert(out("http://x.com/q") == (("http://x.com/q", 4L, false)))
    assert(out("http://x.com/j") ==
      (("http://x.com/weird target", 1L, true)))
    assert(out("http://x.com/o") ==
      (("http://elsewhere.com/z", 1L, true)))
    // maxHops must be a power of two (doubling span = horizon)
    intercept[IllegalArgumentException] {
      UrlCuration.resolveRedirects(pages, "url", "http_status",
        "location", maxHops = 3)
    }
  }

  test("plan shapes: projections are map-only; domainCap ranks via the bounded aggregate") {
    val docs = Seq((1L, "http://e.com/a")).toDF("id", "url")
    val proj = UrlCuration.withCanonicalUrl(
      UrlCuration.withDomain(docs, "url"), "url")
    proj.collect()
    val pplan = proj.queryExecution.executedPlan.toString
    assert(!pplan.contains("Exchange") && !pplan.contains("Join"),
      s"canonicalize/domain must be map-only:\n$pplan")
    val capped = UrlCuration.domainCap(docs, "id", "url", cap = 3)
    capped.collect()
    val cplan = capped.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(cplan.contains("top_k_by_score"), s"bounded rank expected:\n$cplan")
    assert(!cplan.contains("Window"), s"no per-domain window:\n$cplan")
  }

  test("guards: occupied output columns and bad caps fail loudly") {
    val docs = Seq((1L, "http://e.com/a", "x")).toDF("id", "url", "domain")
    intercept[IllegalArgumentException] {
      UrlCuration.withDomain(docs, "url")
    }
    intercept[IllegalArgumentException] {
      UrlCuration.domainCap(docs, "id", "url", cap = 2)
    }
    intercept[IllegalArgumentException] {
      UrlCuration.domainCap(docs.drop("domain"), "id", "url", cap = 0)
    }
    intercept[IllegalArgumentException] {
      UrlCuration.withCanonicalUrl(docs, "nope")
    }
  }
}
