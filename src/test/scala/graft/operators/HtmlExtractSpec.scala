package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(Tuple1(html)).toDF("h")
      .select(HtmlExtract.stripHtml(col("h")).as("t"))
      .collect()(0).getString(0)

  test("strip: tags, block boundaries, script/style/comment removal") {
    assert(strip("<p>Hello <b>world</b></p><p>second</p>") ==
      "Hello world\nsecond")
    assert(strip("<SCRIPT>var x = '<p>not text</p>';</SCRIPT>ok") == "ok")
    assert(strip("<style>p { color: red; }</style>ok") == "ok")
    assert(strip("a<!-- <p>hidden</p> -->b") == "ab")
    // case-insensitive block tags, attributes tolerated
    assert(strip("""<DIV class="x">a</DIV><P id=1>b</P>""") == "a\nb")
    // inline tags vanish without a boundary
    assert(strip("a<span>b</span><em>c</em>d") == "abcd")
  }

  test("strip: entity decode order — double-encoded single-decodes") {
    assert(strip("a &amp; b") == "a & b")
    assert(strip("&lt;tag&gt; &quot;q&quot; &#39;s&#39;") == "<tag> \"q\" 's'")
    // &amp;lt; is the TEXT '&lt;' — must NOT double-decode to '<'
    assert(strip("&amp;lt;x&amp;gt;") == "&lt;x&gt;")
    // &nbsp; decodes to the FAITHFUL U+00A0 (folding it to an ASCII
    // space is TextNormalize.cleanText's job, downstream)
    assert(strip("a&nbsp;b") == "a b")
  }

  test("strip: numeric and hex references decode in the same pass") {
    assert(strip("caf&#233; d&#xE9;j&#224; vu&#X1F600;") == "café déjà vu😀")
    // double-encoded NUMERIC single-decodes from either side
    assert(strip("&amp;#65;") == "&#65;")
    assert(strip("&#38;lt;") == "&lt;")
    // disallowed codepoints stay literal: C0 control (the paragraph
    // sentinel range), surrogate half, beyond U+10FFFF, >7 hex digits
    assert(strip("a&#2;b &#xD800; &#x110000; &#x123456789;") ==
      "a&#2;b &#xD800; &#x110000; &#x123456789;")
    // decoded tab/newline participate in step-4 whitespace collapse
    assert(strip("a&#9;b&#10;c") == "a b\nc")
    // the common named table decodes; unknown names stay literal;
    // the legacy semicolon-free subset decodes in text context (r20 —
    // `&amp` → `&`, and the legacy prefix fires inside `&ampx`)
    assert(strip("&eacute;t&eacute; &mdash; &copy; &euro;5 &rsquo;") ==
      "été — © €5 ’")
    assert(strip("&unknown; &amp &ampx; &Frac12;") ==
      "&unknown; & &x; &Frac12;")
  }

  test("strip: whitespace normal form") {
    assert(strip("a  \t b") == "a b")
    assert(strip("<p>  a  </p>  <p>  b  </p>") == "a\nb")
    // newline-bearing runs collapse to ONE newline, outer ws stripped
    assert(strip("<br><br><p></p>a<br><br>b<div></div>") == "a\nb")
    assert(strip(null.asInstanceOf[String]) == null)
  }

  private lazy val pages = Seq(
    (1L, "<nav><a href=x>Home</a> <a href=y>About</a></nav>" +
      "<p>this paragraph has enough plain words to be kept</p>" +
      "<ul><li><a href=z>Link only</a></li></ul>"),
    (2L, "<p>See <a href=q>one link</a> inside enough surrounding words to stay under the density cap</p>"),
    (3L, "<div><a href=a>all link text here now</a></div>"), // density 1.0 → dropped
    (4L, "<p>short</p>"),                                    // < minWords → dropped
    (5L, null: String))
    .toDF("doc_id", "html")

  test("extract: link-density and length classification, doc-order reassembly") {
    val out = HtmlExtract.extractMainContent(pages, "doc_id", "html")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: nav (2 words, link-heavy) and link-only li dropped; middle kept
    assert(out(1L) == (("this paragraph has enough plain words to be kept", 1L, 2L)))
    // doc 2: one link inside a long paragraph — density below cap
    assert(out(2L)._2 == 1L && out(2L)._1.startsWith("See one link inside"))
    // docs 3 (pure link), 4 (short), 5 (null) have no kept paragraphs
    assert(!out.contains(3L) && !out.contains(4L) && !out.contains(5L))
  }

  test("extract: boundary density — exactly at the cap is kept") {
    // cleaned: 'aaa bbb ccc ddd eee' = 19 chars; link chars 'aaa' = 3
    // density 3/19 ≈ 0.158 ≤ 0.3 → kept; with maxLinkDensity=0.1 → dropped
    val d = Seq((1L, "<p><a href=x>aaa</a> bbb ccc ddd eee</p>")).toDF("doc_id", "html")
    assert(HtmlExtract.extractMainContent(d, "doc_id", "html").count() == 1L)
    assert(HtmlExtract.extractMainContent(d, "doc_id", "html",
      maxLinkDensity = 0.1).count() == 0L)
    assert(HtmlExtract.extractMainContent(d, "doc_id", "html",
      minWords = 6).count() == 0L)
  }

  test("extract plan is map-only: zero exchanges, no explode-regroup") {
    val out = HtmlExtract.extractMainContent(pages, "doc_id", "html")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Generate"),
      s"extract plan not in-row:\n$plan")
  }

  test("invalid knobs and id-name collisions are rejected loudly") {
    intercept[IllegalArgumentException] {
      HtmlExtract.extractMainContent(pages, "doc_id", "html", minWords = 0)
    }
    intercept[IllegalArgumentException] {
      HtmlExtract.extractMainContent(pages, "doc_id", "html", maxLinkDensity = 1.5)
    }
    intercept[IllegalArgumentException] {
      HtmlExtract.extractMainContent(
        pages.withColumnRenamed("doc_id", "text"), "text", "html")
    }
    intercept[IllegalArgumentException] {
      HtmlExtract.withStrippedHtml(
        pages.withColumn("text", lit("x")), "html", "text")
    }
  }

  test("extractLinks: tag and attribute boundaries (no <area>/data-href over-match)") {
    import spark.implicits._
    val html =
      """<a href="http://ok1.com/">1</a>
        |<a class="x" href='http://ok2.com/'>2</a>
        |<a
        |href="http://ok3.com/">newline ws</a>
        |<area href="http://bad-area.com/">
        |<abbr href="http://bad-abbr.com/">x</abbr>
        |<a data-href="http://bad-data.com/">no real href</a>
        |<audio href="http://bad-audio.com/"></audio>""".stripMargin
    val out = Seq(html).toDF("html")
      .select(explode(HtmlExtract.extractLinks(col("html"))).as("l"))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("http://ok1.com/", "http://ok2.com/", "http://ok3.com/"),
      s"got $out")
  }
}
