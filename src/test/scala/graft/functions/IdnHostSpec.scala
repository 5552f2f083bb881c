package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.operators.UrlCuration

class IdnHostSpec extends SparkSpec {
  import spark.implicits._

  private def idn(s: String): Option[String] =
    Seq(Tuple1(s)).toDF("h")
      .select(GraftFunctions.idn_host(col("h")).as("a"))
      .collect().map(r => Option(r.getString(0))).head

  private def canon(s: String): Option[String] =
    Seq(Tuple1(s)).toDF("u")
      .select(UrlCuration.canonicalUrl(col("u")).as("c"))
      .collect().map(r => Option(r.getString(0))).head

  test("unicode hosts map to their punycode A-labels") {
    assert(idn("bücher.de").contains("xn--bcher-kva.de"))
    assert(idn("bücher.example.com").contains("xn--bcher-kva.example.com"))
    assert(idn("münchen.example").contains("xn--mnchen-3ya.example"))
    // the mapping agrees with the JDK call the oracle constants use
    assert(idn("müller.de").map(_.split(":")(0)) ==
      Some(java.net.IDN.toASCII("müller.de")))
  }

  test("ASCII hosts are the untouched fast path — same buffer back") {
    val in = UTF8String.fromString("xn--bcher-kva.de")
    assert(IdnHost.compute(in) eq in) // zero-alloc identity
    assert(idn("plain.example.com").contains("plain.example.com"))
  }

  test("ports ride through; IPv6 literals and bad labels pass unchanged") {
    assert(idn("bücher.de:8080").contains("xn--bcher-kva.de:8080"))
    assert(IdnHost.mapString("[::1]:8080") == "[::1]:8080")
    // an empty label makes IDN.toASCII throw — must pass through, Ü
    // and all, never fail the scan
    assert(IdnHost.mapString("ü..de") == "ü..de")
    assert(idn("") .contains(""))
  }

  test("canonicalUrl: unicode and punycode spellings share one key") {
    val a = canon("http://BÜCHER.example.com/x")
    assert(a == canon("http://xn--bcher-kva.Example.COM/x"))
    assert(a.contains("http://xn--bcher-kva.example.com/x"))
    // www + default port + IDN compose
    assert(canon("http://WWW.Müller.DE:80/p")
      .contains("http://xn--mller-kva.de/p"))
    // domain cap unit follows
    val d = Seq(Tuple1("https://müller.de/a")).toDF("u")
      .select(UrlCuration.domainOf(col("u")).as("d"))
      .head().getString(0)
    assert(d == "xn--mller-kva.de")
  }
}
