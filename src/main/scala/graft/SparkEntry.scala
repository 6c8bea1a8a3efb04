package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The gate registry itself lives in [[Gate.all]]; queries are implemented
  * in `graft.queries.*` on top of the engine modules (`graft.billing`,
  * `graft.ext`).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's A1 daily rollup (via the events→billing adapter),
    * i.e. scan → project → partial/final hash aggregate → top-level sort.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_daily_rollup")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Gate.all.map(g => g.name -> g.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (hash-based LSH / stub-decode gates) → rows-only check.
    */
  def oracleSql: Map[String, String] =
    Gate.all.flatMap(g => g.oracle.map(g.name -> _)).toMap
}
