package graft.sources.v2

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, IsNotNull}
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

import graft.SparkSpec

class SalesforceBackendSpec extends SparkSpec {

  test("CompiledSoql renders the reference-shaped SOQL (SELECT/WHERE/LIMIT)") {
    val q = CompiledSoql("Opportunity",
      Seq("Id", "StageName", "Amount"),
      Seq(EqualTo("StageName", "alpha"), GreaterThan("Amount", 100.0), IsNotNull("Id")),
      Some(50L))
    assert(q.toSoql ==
      "SELECT Id, StageName, Amount FROM Opportunity " +
        "WHERE StageName = 'alpha' AND Amount > 100.0 AND Id != null LIMIT 50")
    // no filters / no limit → bare SELECT, same as _build_soql_from_spec
    assert(CompiledSoql("Account", Seq("Id"), Nil, None).toSoql ==
      "SELECT Id FROM Account")
  }

  test("EnvCredentials.fromEnv reads the reference's SF_* contract") {
    val full = Map("SF_USERNAME" -> "u", "SF_PASSWORD" -> "p",
      "SF_TOKEN" -> "t", "SF_DOMAIN" -> "test")
    assert(EnvCredentials.fromEnv(full.get) == EnvCredentials("u", "p", "t", "test"))
    // SF_DOMAIN defaults to "login" (extract.py:41)
    assert(EnvCredentials.fromEnv((full - "SF_DOMAIN").get).domain == "login")
    // missing required var → error naming it
    val e = intercept[IllegalArgumentException] {
      EnvCredentials.fromEnv((full - "SF_TOKEN").get)
    }
    assert(e.getMessage.contains("SF_TOKEN"))
  }

  test("LiveSalesforceBackend fails loudly on fetch (zero-egress), carrying the SOQL") {
    val backend = new LiveSalesforceBackend(EnvCredentials("u", "p", "t", "login"))
    val e = intercept[UnsupportedOperationException] {
      backend.fetch(CompiledSoql("Account", Seq("Id"), Nil, None), 0, 10,
        StructType(Seq(StructField("Id", StringType))))
    }
    assert(e.getMessage.contains("SELECT Id FROM Account"))
    assert(e.getMessage.contains("egress"))
  }

  /** Scripted transport: routes each request to a canned response and
    * records every call — the live protocol exercised with zero network. */
  private class FakeTransport(
      handler: (String, String, Map[String, String], Option[String]) => (Int, String))
    extends SalesforceTransport {
    val calls = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Map[String, String], Option[String])]
    override def send(method: String, url: String, headers: Map[String, String],
        body: Option[String]): (Int, String) = {
      calls += ((method, url, headers, body))
      handler(method, url, headers, body)
    }
  }

  private val liveCreds = EnvCredentials("u@example.com", "pw", "tok123", "login")
  private val twoColSchema = StructType(Seq(
    StructField("Id", StringType), StructField("AnnualRevenue", DoubleType)))
  private def rec(id: String, rev: Any) = {
    val revJson = if (rev == null) "null" else rev.toString
    s"""{"attributes":{"type":"Account"},"Id":"$id","AnnualRevenue":$revJson}"""
  }
  private val loginOk =
    (200, """{"access_token":"SESSION-1","instance_url":"https://inst.example/"}""")

  test("LiveSalesforceBackend: login then query — request construction and row mapping") {
    val t = new FakeTransport((method, url, headers, body) =>
      if (url.contains("/oauth2/token")) loginOk
      else (200, s"""{"totalSize":2,"done":true,"records":[${rec("Account-0", 12.5)},${rec("Account-1", null)}]}"""))
    val q = CompiledSoql("Account", Seq("Id", "AnnualRevenue"),
      Seq(IsNotNull("Id")), Some(50L))
    val rows = new LiveSalesforceBackend(liveCreds, t)
      .fetch(q, 0, 10, twoColSchema).toSeq

    assert(rows.map(_.toSeq) == Seq(
      Seq(org.apache.spark.unsafe.types.UTF8String.fromString("Account-0"),
        java.lang.Double.valueOf(12.5)),
      Seq(org.apache.spark.unsafe.types.UTF8String.fromString("Account-1"), null)))
    // login request: token endpoint on the creds domain, password+token
    val (m0, u0, _, b0) = t.calls(0)
    assert(m0 == "POST" && u0 == "https://login.salesforce.com/services/oauth2/token")
    assert(b0.get.contains("grant_type=password") && b0.get.contains("pwtok123"))
    // query request: bearer session, URL-encoded compiled SOQL
    val (m1, u1, h1, _) = t.calls(1)
    assert(m1 == "GET" && u1.startsWith("https://inst.example/services/data/v"))
    assert(h1("Authorization") == "Bearer SESSION-1")
    assert(u1.contains(java.net.URLEncoder.encode(q.toSoql, "UTF-8")))
  }

  test("LiveSalesforceBackend: nextRecordsUrl pagination + Long range slicing") {
    val nextPath = "/services/data/v59.0/query/01g-2000"
    val t = new FakeTransport((_, url, _, _) =>
      if (url.contains("/oauth2/token")) loginOk
      else if (url.endsWith(nextPath))
        (200, s"""{"done":true,"records":[${rec("Account-2", 2.0)},${rec("Account-3", 3.0)}]}""")
      else
        (200, s"""{"done":false,"nextRecordsUrl":"$nextPath","records":[${rec("Account-0", 0.0)},${rec("Account-1", 1.0)}]}"""))
    val q = CompiledSoql("Account", Seq("Id", "AnnualRevenue"), Nil, None)
    val rows = new LiveSalesforceBackend(liveCreds, t)
      .fetch(q, 1, 3, twoColSchema).toSeq
    // global record stream is 0..3; the [1, 3) partition range spans the
    // page boundary
    assert(rows.map(_(0).toString) == Seq("Account-1", "Account-2"))
    // the second query call followed nextRecordsUrl against the instance
    assert(t.calls.map(_._2).count(_.contains("/query")) == 2)
    assert(t.calls.last._2 == s"https://inst.example$nextPath")
  }

  test("LiveSalesforceBackend: auth failure and query errors map to typed exceptions") {
    val authFail = new FakeTransport((_, _, _, _) =>
      (400, """{"error":"invalid_grant","error_description":"authentication failure"}"""))
    val e1 = intercept[SalesforceApiException] {
      new LiveSalesforceBackend(liveCreds, authFail)
        .fetch(CompiledSoql("Account", Seq("Id"), Nil, None), 0, 1,
          StructType(Seq(StructField("Id", StringType)))).toSeq
    }
    assert(e1.status == 400 && e1.errorCode == "invalid_grant")
    assert(e1.getMessage.contains("authentication failure"))

    val sessionDead = new FakeTransport((_, url, _, _) =>
      if (url.contains("/oauth2/token")) loginOk
      else (401, """[{"message":"Session expired or invalid","errorCode":"INVALID_SESSION_ID"}]"""))
    val e2 = intercept[SalesforceApiException] {
      new LiveSalesforceBackend(liveCreds, sessionDead)
        .fetch(CompiledSoql("Account", Seq("Id"), Nil, None), 0, 1,
          StructType(Seq(StructField("Id", StringType)))).toSeq
    }
    assert(e2.status == 401 && e2.errorCode == "INVALID_SESSION_ID")
  }

  test("LiveSalesforceBackend: non-numeric value in a numeric field fails loudly") {
    // same loud-failure principle as missing-records / dropped-cursor:
    // silently nulling an unparseable numeric drops data
    val t = new FakeTransport((_, url, _, _) =>
      if (url.contains("/oauth2/token")) loginOk
      else (200, s"""{"totalSize":1,"done":true,"records":[${rec("Account-0", "\"N/A\"")}]}"""))
    val e = intercept[SalesforceApiException] {
      new LiveSalesforceBackend(liveCreds, t)
        .fetch(CompiledSoql("Account", Seq("Id", "AnnualRevenue"), Nil, None),
          0, 1, twoColSchema).toSeq
    }
    assert(e.errorCode == "MALFORMED_FIELD")
    assert(e.getMessage.contains("AnnualRevenue") && e.getMessage.contains("N/A"))
  }

  test("SimBackend fetch honors the fetch schema (pruning reaches the backend)") {
    val q = CompiledSoql("Account", Seq("Name"), Nil, None)
    val narrow = StructType(Seq(StructField("Name", StringType)))
    val rows = new SimBackend().fetch(q, 0, 5, narrow).toSeq
    assert(rows.length == 5)
    assert(rows.forall(_.length == 1)) // only the requested field synthesized
  }

  test("DSv2 read through the explicit sim backend option matches the default") {
    def read(opts: Map[String, String]) = {
      var r = spark.read.format("graft.sources.v2.SalesforceSimSource")
        .option("object", "Account").option("rows", "100")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load().select("Id", "AnnualRevenue").orderBy("Id").collect().toSeq
    }
    assert(read(Map("backend" -> "sim")) == read(Map.empty))
    val e = intercept[IllegalArgumentException] {
      read(Map("backend" -> "bogus"))
    }
    assert(e.getMessage.contains("bogus"))
  }
}
