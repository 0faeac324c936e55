package graft.queries

import org.apache.spark.sql.DataFrame

/**
 * Two-step oracle support for engine-hash-specific operators (VERDICT r1
 * "oracle the rows-only queries"): a query exports its hash-level
 * INTERMEDIATE (e.g. the minhash signature table) to parquet, and the
 * DuckDB oracle SQL consumes that export (via the `__AUX__` placeholder,
 * substituted with the verify out-dir by `graft.Verify`) to re-derive the
 * final answer. Everything downstream of the engine-specific hash —
 * banding, bucket joins, bit votes, dedup pairs — is then value-checked.
 *
 * Outside `graft.Verify` (benchmarks, normal use) `dir` is None and the
 * export is a no-op.
 */
object OracleAux {
  @volatile var dir: Option[String] = None

  /** placeholder oracle SQL uses for the export directory */
  val Placeholder = "__AUX__"

  /** materialize `df` for the oracle when enabled; returns `df` unchanged.
    * Exports live under a DOT-prefixed dir so directory globs over the
    * verify out-dir (driver + dev loop) never mistake them for query
    * outputs. */
  def export(df: DataFrame, name: String): DataFrame = {
    dir.foreach(d =>
      df.write.mode("overwrite").parquet(s"$d/.aux/$name"))
    df
  }
}
