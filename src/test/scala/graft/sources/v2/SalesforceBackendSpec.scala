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
