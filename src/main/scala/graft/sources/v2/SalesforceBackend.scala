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
    filters: Seq[Filter], limit: Option[Long]) {

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

  /** `SELECT f1, f2 FROM Obj WHERE c1 AND c2 LIMIT n` — the exact shape
    * of `_build_soql_from_spec` (`extract.py:29-33`). */
  def toSoql: String = {
    val select = fields.mkString(", ")
    val where = filters.flatMap(clause) match {
      case Nil => ""
      case cs => cs.mkString(" WHERE ", " AND ", "")
    }
    val lim = limit.map(n => s" LIMIT $n").getOrElse("")
    s"SELECT $select FROM $objectName$where$lim"
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

/** The live client slot: typed credentials + the compiled SOQL are all a
  * REST implementation needs. Performing the call requires network
  * egress, which this environment does not have — fetch fails loudly
  * instead of pretending. */
class LiveSalesforceBackend(creds: EnvCredentials) extends SalesforceBackend {
  override def fetch(query: CompiledSoql, start: Long, end: Long,
      fullSchema: StructType): Iterator[Array[Any]] =
    throw new UnsupportedOperationException(
      s"live Salesforce fetch for [${query.toSoql}] as ${creds.username}@" +
        s"${creds.domain} requires network egress; this build is zero-egress — " +
        "use the default sim backend, or implement this method with a REST client")
}
