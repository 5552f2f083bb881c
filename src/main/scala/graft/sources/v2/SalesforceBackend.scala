package graft.sources.v2

import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, IsNotNull, LessThan}
import org.apache.spark.sql.types.{DataType, StructType}

/** The live-connector seam (≙ `tasks/extract.py:35-42`): everything the
  * DSv2 reader needs from "Salesforce" behind one typed interface, so the
  * deterministic simulator and a live REST client are interchangeable
  * without touching the scan/pushdown machinery.
  *
  * The compiled query carries the SAME three clauses the reference's
  * hand-built SOQL does (`_build_soql_from_spec`, `extract.py:29-33`):
  * SELECT list, WHERE, LIMIT — here produced by Catalyst's pushdowns
  * instead of string templating.
  */
trait SalesforceBackend extends Serializable {
  /** Full-schema rows for logical range [start, end) of the query's
    * object, in `fullSchema` field order, as Spark internal values
    * (UTF8String / java.lang.Double / null). A live backend would page
    * through `query.toSoql` results; ranges express reader parallelism. */
  def fetch(query: CompiledSoql, start: Long, end: Long,
      fullSchema: StructType): Iterator[Array[Any]]
}

/** The pushed-down query, renderable as the reference-shaped SOQL. */
final case class CompiledSoql(
    objectName: String, fields: Seq[String],
    filters: Seq[Filter], limit: Option[Long],
    groupBy: Seq[String] = Nil) {

  private def lit(v: Any): String = v match {
    case n: Number => n.toString
    // backslashes FIRST, then quotes (SOQL string-literal rules): a value
    // ending in '\' would otherwise re-escape the closing quote —
    // malformed, and in principle injectable, SOQL on the live wire
    case other => s"'${other.toString.replace("\\", "\\\\").replace("'", "\\'")}'"
  }

  private def clause(f: Filter): Option[String] = f match {
    case EqualTo(a, v) => Some(s"$a = ${lit(v)}")
    case GreaterThan(a, v) => Some(s"$a > ${lit(v)}")
    case LessThan(a, v) => Some(s"$a < ${lit(v)}")
    case IsNotNull(a) => Some(s"$a != null")
    case _ => None // un-pushable filters stay Spark-side
  }

  /** `SELECT f1, f2 FROM Obj WHERE c1 AND c2 [GROUP BY g1] LIMIT n` —
    * the exact shape of `_build_soql_from_spec` (`extract.py:29-33`),
    * plus the SOQL aggregate-query form (`GROUP BY`, r13 aggregate
    * pushdown). */
  def toSoql: String = {
    val select = fields.mkString(", ")
    val where = filters.flatMap(clause) match {
      case Nil => ""
      case cs => cs.mkString(" WHERE ", " AND ", "")
    }
    val group =
      if (groupBy.isEmpty) "" else groupBy.mkString(" GROUP BY ", ", ", "")
    val lim = limit.map(n => s" LIMIT $n").getOrElse("")
    s"SELECT $select FROM $objectName$where$group$lim"
  }
}

/** Env-driven credentials, the reference's exact contract
  * (`_login_salesforce`, `extract.py:35-42`): SF_USERNAME / SF_PASSWORD /
  * SF_TOKEN required, SF_DOMAIN defaulting to "login". `env` is
  * injectable for tests. */
final case class EnvCredentials(
    username: String, password: String, securityToken: String, domain: String)

object EnvCredentials {
  def fromEnv(env: String => Option[String] = sys.env.get): EnvCredentials = {
    def required(k: String): String = env(k).getOrElse(
      throw new IllegalArgumentException(
        s"missing required Salesforce credential env var: $k"))
    EnvCredentials(required("SF_USERNAME"), required("SF_PASSWORD"),
      required("SF_TOKEN"), env("SF_DOMAIN").getOrElse("login"))
  }
}

/** Zero-egress stand-in: rows synthesized by the deterministic per-object
  * generator ([[SalesforceSim.cell]]) — residual filtering/projection/
  * limit stay in the reader, exactly where they'd sit over a live wire. */
class SimBackend extends SalesforceBackend {
  override def fetch(query: CompiledSoql, start: Long, end: Long,
      fullSchema: StructType): Iterator[Array[Any]] =
    Iterator.range(start, end).map { i =>
      fullSchema.fields.map(f =>
        SalesforceSim.cell(query.objectName, i, f.name, f.dataType))
    }
}

/** Minimal HTTP seam for the live client: one request in, `(status,
  * body)` out. Injectable, so the protocol logic — login, query
  * construction, `nextRecordsUrl` pagination, error mapping — is
  * unit-testable against a scripted fake with zero network. */
trait SalesforceTransport extends Serializable {
  def send(method: String, url: String, headers: Map[String, String],
      body: Option[String]): (Int, String)
}

/** The default transport refuses the wire: this build is zero-egress, so
  * any attempt to actually reach Salesforce fails loudly instead of
  * pretending. Swap in a real HTTP client (or a test fake) via the
  * [[LiveSalesforceBackend]] constructor. */
object NoEgressTransport extends SalesforceTransport {
  override def send(method: String, url: String, headers: Map[String, String],
      body: Option[String]): (Int, String) =
    throw new UnsupportedOperationException(
      s"$method $url requires network egress; this build is zero-egress — " +
        "use the default sim backend, or inject a real SalesforceTransport")
}

/** An authenticated live session: bearer token + instance base URL (the
  * two values every subsequent REST call needs). */
final case class SalesforceSession(accessToken: String, instanceUrl: String)

/** A non-2xx Salesforce REST response, with the API's own error code
  * (e.g. `invalid_grant`, `INVALID_SESSION_ID`) preserved for callers. */
final class SalesforceApiException(
    val status: Int, val errorCode: String, message: String)
  extends RuntimeException(message)

/** The live client: credentials + compiled SOQL in, internal rows out,
  * over the PUBLIC Salesforce REST contract — OAuth password-flow login
  * (password concatenated with the security token, the same session
  * `simple_salesforce` establishes from the reference's four env values,
  * `extract.py:35-42`), then `GET /services/data/vXX/query?q=<soql>`
  * paged via `nextRecordsUrl` until `done`. The per-record `attributes`
  * envelope is ignored, exactly like the reference (`extract.py:82-83`).
  * All wire I/O goes through the injectable [[SalesforceTransport]];
  * the default transport keeps this build zero-egress. */
class LiveSalesforceBackend(
    creds: EnvCredentials,
    transport: SalesforceTransport = NoEgressTransport,
    apiVersion: String = "59.0") extends SalesforceBackend {

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

  private def errorOf(status: Int, json: JValue, raw: String): SalesforceApiException = {
    // two public error shapes: OAuth `{error, error_description}` and
    // REST `[{errorCode, message}]`
    val (code, msg) = json match {
      case JArray(JObject(fields) :: _) =>
        val m = fields.toMap
        (m.get("errorCode"), m.get("message")) match {
          case (Some(JString(c)), Some(JString(d))) => (c, d)
          case _ => (s"http_$status", raw)
        }
      case obj: JObject =>
        ((obj \ "error"), (obj \ "error_description")) match {
          case (JString(c), JString(d)) => (c, d)
          case _ => (s"http_$status", raw)
        }
      case _ => (s"http_$status", raw)
    }
    new SalesforceApiException(status, code, s"Salesforce API error ($code): $msg")
  }

  /** OAuth password-flow login against the domain's token endpoint. */
  private[v2] def login(): SalesforceSession = {
    val url = s"https://${creds.domain}.salesforce.com/services/oauth2/token"
    val body = s"grant_type=password&username=${enc(creds.username)}" +
      s"&password=${enc(creds.password + creds.securityToken)}"
    val (status, resp) = transport.send("POST", url,
      Map("Content-Type" -> "application/x-www-form-urlencoded"), Some(body))
    val json = scala.util.Try(JsonMethods.parse(resp)).getOrElse(JNothing)
    if (status != 200) throw errorOf(status, json, resp)
    ((json \ "access_token"), (json \ "instance_url")) match {
      case (JString(tok), JString(inst)) =>
        SalesforceSession(tok, inst.stripSuffix("/"))
      case _ => throw errorOf(status, json,
        s"login response missing access_token/instance_url: $resp")
    }
  }

  /** One JSON record → internal row in `fullSchema` field order. */
  private def toRow(rec: JValue, fullSchema: StructType): Array[Any] =
    fullSchema.fields.map { f =>
      (rec \ f.name, f.dataType) match {
        case (JNull | JNothing, _) => null
        case (v, org.apache.spark.sql.types.DoubleType) => v match {
          case JDouble(d) => java.lang.Double.valueOf(d)
          case JInt(i) => java.lang.Double.valueOf(i.toDouble)
          case JLong(l) => java.lang.Double.valueOf(l.toDouble)
          case JDecimal(d) => java.lang.Double.valueOf(d.toDouble)
          // loud failure, like the missing-records/dropped-cursor paths:
          // a non-numeric value in a numeric field is a malformed
          // response, not a null — silently nulling it drops data
          case JString(s) => scala.util.Try(java.lang.Double.valueOf(s.toDouble))
            .getOrElse(throw new SalesforceApiException(200, "MALFORMED_FIELD",
              s"non-numeric value '$s' in numeric field ${f.name}"))
          case other => throw new SalesforceApiException(200, "MALFORMED_FIELD",
            s"non-numeric JSON ${other.getClass.getSimpleName} in numeric field ${f.name}")
        }
        case (JString(s), _) =>
          org.apache.spark.unsafe.types.UTF8String.fromString(s)
        case (v, _) => org.apache.spark.unsafe.types.UTF8String.fromString(
          JsonMethods.compact(JsonMethods.render(v)))
      }
    }.toArray[Any]

  /** NOTE on ranges: the DSv2 scan expresses parallelism as [start, end)
    * row ranges, and the REST query cursor is strictly sequential — so a
    * P-partition live scan replays pages from the top per partition
    * (O(P·pages) requests) and each partition sees its own snapshot. A
    * production live deployment should read with `partitions=1` (one
    * cursor walk, still pipelined into Spark) or slice server-side with
    * PK-chunking WHERE ranges; the sim backend, where ranges are free,
    * keeps full fan-out. */
  override def fetch(query: CompiledSoql, start: Long, end: Long,
      fullSchema: StructType): Iterator[Array[Any]] = {
    val session =
      try login()
      catch { case e: UnsupportedOperationException =>
        // keep the SOQL in the zero-egress failure so the refusal names
        // exactly what WOULD have been sent
        throw new UnsupportedOperationException(
          s"live Salesforce fetch for [${query.toSoql}] as " +
            s"${creds.username}@${creds.domain}: ${e.getMessage}", e)
      }
    val headers = Map("Authorization" -> s"Bearer ${session.accessToken}")
    val firstUrl =
      s"${session.instanceUrl}/services/data/v$apiVersion/query?q=${enc(query.toSoql)}"

    def page(url: String): (Seq[Array[Any]], Option[String]) = {
      val (status, resp) = transport.send("GET", url, headers, None)
      val json = scala.util.Try(JsonMethods.parse(resp)).getOrElse(JNothing)
      if (status != 200) throw errorOf(status, json, resp)
      // a 200 whose body isn't the query shape (e.g. a proxy's HTML
      // error page) must fail loudly — an empty records fallback would
      // be SILENT data loss
      val recs = (json \ "records") match {
        case JArray(rs) => rs.map(toRow(_, fullSchema))
        case _ => throw new SalesforceApiException(status, "malformed_response",
          s"query response from $url has no records array: ${resp.take(200)}")
      }
      // same principle mid-stream: done:false promises another page; a
      // missing/invalid nextRecordsUrl would truncate the table silently
      val next = ((json \ "done"), (json \ "nextRecordsUrl")) match {
        case (JBool(false), JString(u)) =>
          Some(if (u.startsWith("http")) u else session.instanceUrl + u)
        case (JBool(false), other) =>
          throw new SalesforceApiException(status, "malformed_response",
            s"query page from $url has done=false but no usable nextRecordsUrl: $other")
        case _ => None
      }
      (recs, next)
    }

    // lazy page walk: a page is fetched only when the reader pulls into it
    val pages: Iterator[Seq[Array[Any]]] = new Iterator[Seq[Array[Any]]] {
      private var nextUrl: Option[String] = Some(firstUrl)
      override def hasNext: Boolean = nextUrl.isDefined
      override def next(): Seq[Array[Any]] = {
        val (recs, nxt) = page(nextUrl.get)
        nextUrl = nxt
        recs
      }
    }
    sliceLong(pages.flatten, start, end)
  }

  /** Iterator slice with Long bounds (Iterator.slice is Int-bounded;
    * partition ranges are Long). */
  private def sliceLong[A](it: Iterator[A], start: Long, end: Long): Iterator[A] =
    new Iterator[A] {
      private var pos = 0L
      private def skip(): Unit =
        while (pos < start && it.hasNext) { it.next(); pos += 1 }
      override def hasNext: Boolean = { skip(); pos < end && it.hasNext }
      override def next(): A = {
        if (!hasNext) throw new NoSuchElementException("next on exhausted slice")
        pos += 1; it.next()
      }
    }
}
