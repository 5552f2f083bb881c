package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HtmlEntityTableSpec extends SparkSpec {
  import spark.implicits._

  private def dec(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(GraftFunctions.html_entity_decode(col("t")).as("d"))
      .collect().head.getString(0)

  test("the committed fixture is the full HTML5 semicolon table") {
    val m = HtmlEntityDecode.Named.toMap
    // the HTML5 spec's named-reference table is frozen — 2125
    // semicolon-terminated names, 93 of them multi-codepoint
    assert(HtmlEntityDecode.Named.size == 2125)
    assert(m.values.count(v => v.codePointCount(0, v.length) > 1) == 93)
    assert(m("amp") == "&" && m("AMP") == "&" && m("lt") == "<")
    assert(m("hellip") == "…" && m("mdash") == "—")
    assert(m("alpha") == "α")
    assert(m("CounterClockwiseContourIntegral") == "∳")
    assert(m("NotEqualTilde") == "≂̸") // multi-codepoint
    assert(m("fjlig") == "fj")
    // case-sensitive per the spec; no legacy semicolon-free forms
    assert(!m.contains("Amp"))
  }

  test("scanner decodes the long tail in one pass") {
    assert(dec("a&hellip;b &alpha;&Beta; &NotEqualTilde; x") ==
      "a…b αΒ ≂̸ x")
    assert(dec("&CounterClockwiseContourIntegral;") == "∳")
    // unknown names stay literal; legacy prefixes don't fire inside
    // runs that no legacy name prefixes ("nosuchentity" has none)
    assert(dec("&nosuchentity; &xyz") == "&nosuchentity; &xyz")
    // single-pass ordering: &amp;#65; must NOT double-decode
    assert(dec("&amp;#65;") == "&#65;")
    // &Tab; is a real reference to an allowed control character
    assert(dec("x&Tab;y") == "x\ty")
  }

  test("legacy semicolon-free subset decodes, text-context longest-match") {
    // bare legacy names decode (106-name HTML5 compat set)
    assert(dec("&amp x &copy y &GT&LT") == "& x © y ><")
    assert(dec("fish &amp chips") == "fish & chips")
    // end-of-string, no lookahead needed
    assert(dec("&amp") == "&")
    // the famous spec example: the longest legacy PREFIX fires inside
    // a longer non-name run, semicolon or not
    assert(dec("I'm &notit; I tell you") == "I'm ¬it; I tell you")
    assert(dec("&ampx") == "&x")
    // a full name; always outranks its own legacy prefix
    assert(dec("&times;bar") == "×bar")
    assert(dec("&timesbar;") == "⨱") // the real HTML5 name
    assert(dec("&timesbar") == "×bar") // no ';' → legacy prefix wins
    // non-legacy spellings stay literal (Ÿ was never Latin-1; mixed
    // case is not in the table)
    assert(dec("&Yuml &Amp &nbsP") == "&Yuml &Amp &nbsP")
    // every legacy name round-trips bare AND with its semicolon form
    val byName = HtmlEntityDecode.Named.toMap
    HtmlEntityDecode.LegacyNames.foreach { n =>
      assert(dec(s"x&$n|") == "x" + byName(n) + "|", n)
      assert(dec(s"x&$n;|") == "x" + byName(n) + "|", n)
    }
  }

  test("numeric references decode without their semicolon in text context") {
    assert(dec("&#65y") == "Ay")
    assert(dec("&#xE9z") == "éz")
    assert(dec("&#x6a") == "j")
    assert(dec("A&#66") == "AB") // end of string
    // digit-less and disallowed forms stay literal (text-identical)
    assert(dec("&# &#x &#2x &#xD800y") == "&# &#x &#2x &#xD800y")
    // the 7-hex-digit cap: the head reconstructs literally, the tail
    // rides as plain text — same final string as full-literal
    assert(dec("&#x123456789;") == "&#x123456789;")
    assert(dec("&#x123456789") == "&#x123456789")
    // single pass still holds: the decoded '&' never re-scans
    assert(dec("&#38lt;") == "&lt;")
  }

  test("malformed or truncated tables fail LOUDLY") {
    def bigTable(extra: String = ""): String =
      (1 to 2100).map(i => f"n$i%04d\t41").mkString("\n") +
        (if (extra.isEmpty) "" else "\n" + extra)
    assert(HtmlEntityDecode.parseTable(bigTable()).size == 2100)
    def failsWith(table: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        HtmlEntityDecode.parseTable(table)
      }
      assert(e.getMessage.contains(frag), s"got: ${e.getMessage}")
    }
    failsWith(bigTable("no-tab-line"), "name<TAB>codepoints")
    failsWith(bigTable("bad name\t41"), "non-alphanumeric name")
    failsWith(bigTable("x\tZZ"), "bad hex codepoint")
    failsWith(bigTable("x\tD800"), "out of range")
    failsWith(bigTable("n0001\t42"), "duplicate names")
    // a truncated fixture must never load silently
    failsWith("a\t41\nb\t42", "truncated fixture")
  }
}
