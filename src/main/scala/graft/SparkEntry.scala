package graft

import graft.analytics.{CorpusQueries, FactorQueries, IngestQueries, RelationalQueries, TimeSeriesQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the complete operator inventory (one entry per
  * implemented operator family from SURVEY.md §2 + the pipeline
  * operators from the builder brief); `oracleSql` holds the DuckDB
  * equivalent for every SQL-expressible entry. Column names are
  * aligned between both sides (the driver compare sorts columns by
  * name before hashing).
  */
object SparkEntry {

  /** Flagship query on sf=0.001: the star-join wide table (SURVEY.md
    * §2.9-2, the screener shape). Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.joinWide(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.entries ++ TimeSeriesQueries.entries ++
      CorpusQueries.entries ++ FactorQueries.entries ++
      IngestQueries.entries ++ graft.streaming.StreamQueries.entries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TimeSeriesQueries.oracles ++
      CorpusQueries.oracles ++ FactorQueries.oracles ++
      IngestQueries.oracles ++ graft.streaming.StreamQueries.oracles
}
