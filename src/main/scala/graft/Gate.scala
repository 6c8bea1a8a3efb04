package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-gate query: a Spark implementation plus (when SQL-expressible)
  * a DuckDB oracle statement over the same parquet tables. Keeping the pair
  * side by side is what keeps column names / rounding / ordering in sync —
  * the driver hash-compares values after sorting columns by name.
  */
final case class Gate(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
)

object Gate {
  /** Registry assembled from the per-module gate lists. */
  def all: Seq[Gate] =
    queries.CoreQueries.gates ++
      queries.IngestQueries.gates ++
      queries.ExtQueries.gates ++
      queries.DataOpsQueries.gates ++
      queries.AnalyticsQueries.gates ++
      queries.ScaleQueries.gates
}
