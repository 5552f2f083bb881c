package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, DedupQueries, HtmlQueries, MixtureQueries, MultimodalQueries, ParityQueries, TemporalJoinQueries, TextQueries, TrainingDataQueries, UrlQueries, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory as runnable plans (one entry per
  * implemented operator family from SURVEY.md §2); `oracleSql` carries the
  * DuckDB-equivalent SQL for every SQL-expressible entry. Query modules
  * live under [[graft.queries]].
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.configure(spark)
    ParityQueries.opportunityByStage(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2 (+ extension). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (ParityQueries.queries ++ DedupQueries.queries ++ TextQueries.queries ++
      WindowQueries.queries ++ AnalyticsQueries.queries ++
      MultimodalQueries.queries ++ MixtureQueries.queries ++
      TemporalJoinQueries.queries ++ TrainingDataQueries.queries ++
      UrlQueries.queries ++ HtmlQueries.queries)
      .map { case (k, f) =>
        k -> { (s: SparkSession, dir: String) => f(GraftSession.configure(s), dir) }
      }

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracles ++ DedupQueries.oracles ++ TextQueries.oracles ++
      WindowQueries.oracles ++ AnalyticsQueries.oracles ++
      MultimodalQueries.oracles ++ MixtureQueries.oracles ++
      TemporalJoinQueries.oracles ++ TrainingDataQueries.oracles ++
      UrlQueries.oracles ++ HtmlQueries.oracles
}
