package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextRedactSpec extends SparkSpec {

  private def red(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextRedact.redactPii(col("t"))).head().getString(0)
  }

  test("each PII class redacts to its token") {
    assert(red("mail bob.smith+x@sub.example.co.uk now") == "mail <EMAIL> now")
    assert(red("see https://ex.org/a/b?q=1&r=2 there") == "see <URL> there")
    assert(red("host 192.168.001.250 up") == "host <IP> up")
    assert(red("call +1 (555) 010-1234 today") == "call <PHONE> today")
    assert(red("call 555-010-9999.") == "call <PHONE>.")
  }

  test("pass order: URLs keep their digits from the IP/phone passes; IPs from the phone pass") {
    // the URL contains both an ip-shaped and a phone-shaped digit run —
    // one URL token must come out, not a half-redacted hybrid
    assert(red("go https://10.0.3.7/call/555-010-1234 now") == "go <URL> now")
    assert(red("ip 10.0.3.7 stays one token") == "ip <IP> stays one token")
  }

  test("clean text is untouched; short digit runs survive") {
    val s = "regular text with year 2024 and version 1.2.3 intact"
    assert(red(s) == s)
  }

  test("matchCount counts per class") {
    import spark.implicits._
    val row = Seq("a@b.co and c@d.org at 10.0.0.1").toDF("t")
      .select(
        TextRedact.matchCount(col("t"), TextRedact.EmailPattern).as("e"),
        TextRedact.matchCount(col("t"), TextRedact.Ipv4Pattern).as("i"))
      .head()
    assert(row.getLong(0) == 2 && row.getLong(1) == 1)
  }

  test("whitespace is the explicit portable class — RE2 semantics on U+000B (\\v)") {
    // no pattern may carry \s: Java's \s includes U+000B, RE2's does
    // not, and a corpus document carrying \v would silently fail the
    // hash gate. With the explicit class, \v is NOT whitespace on
    // either engine — a URL runs straight through it (RE2 behavior).
    Seq(TextRedact.EmailPattern, TextRedact.UrlPattern,
        TextRedact.Ipv4Pattern, TextRedact.PhonePattern)
      .foreach(p => assert(!p.contains("\\s"), s"\\s leaked into pattern: $p"))
    assert(red("see https://x.co/a\u000Bb end") == "see <URL> end")
    // real whitespace still terminates the URL token
    assert(red("see https://x.co/a b end") == "see <URL> b end")
  }

  test("redaction is a codegen projection — no UDF, no shuffle") {
    import spark.implicits._
    val plan = (1 to 10).map(i => s"t$i").toDF("t")
      .select(TextRedact.redactPii(col("t")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEvalPython"))
  }
}
