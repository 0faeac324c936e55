package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator surface of the engine (SURVEY.md §2 inventory +
  * training-data-pipeline operators); each entry with an `oracleSql` line is
  * verified by the driver against DuckDB on the same parquet tables.
  */
object SparkEntry {

  /** Flagship: the CDC ingest engine end-to-end (events-derived change log →
    * 4-epoch replay → committed IceTable snapshot) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("c3_cdc_engine_replay")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.CdcQueries.queries ++
      graft.queries.DocQueries.queries ++
      graft.queries.VectorQueries.queries ++
      graft.queries.OperatorQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables — plus, for engine-specific ops (d7, d8, v3, q24),
    * on Spark-exported intermediates (two-step oracle, see OracleAux).
    * EVERY query has a value oracle; q24's is a bounds check (the DuckDB
    * side re-selects the exported sketch estimates only where they sit
    * within documented error of exact recomputation). */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.CdcQueries.oracles ++
      graft.queries.DocQueries.oracles ++
      graft.queries.VectorQueries.oracles ++
      graft.queries.OperatorQueries.oracles
}
