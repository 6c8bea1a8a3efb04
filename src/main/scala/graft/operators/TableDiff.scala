package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level reconciliation of two table snapshots by primary key — the
  * audit primitive behind "did the backfill change history?" and
  * "what did this delivery actually do?" questions the reference answers
  * by re-reading whole DuckDB tables (its full-recompute design makes
  * diffing implicit; an incremental store needs it explicit).
  *
  * Scale shape: each side is reduced map-side to (key, md5-of-projection)
  * — 16-byte digests, never the row payload — then a single full outer
  * shuffle join on the key classifies every key as added / removed /
  * changed / unchanged. Cost is one shuffle of key+digest pairs
  * regardless of row width; with both snapshots bucketed by key the
  * exchange disappears entirely (same contract as q_bucketed_join).
  */
object TableDiff {

  /** (k, status) for every key present in either snapshot; `cols` is the
    * value projection compared (hashed with a field separator so
    * ("ab","c") never collides with ("a","bc")).
    */
  def diff(a: DataFrame, b: DataFrame, key: String,
      cols: Seq[String]): DataFrame = {
    def digested(df: DataFrame, out: String) =
      df.select(col(key).as("k"),
        md5(concat_ws("\u0001", cols.map(c => col(c).cast("string")): _*))
          .as(out))
    digested(a, "ha").join(digested(b, "hb"), Seq("k"), "full_outer")
      .select(col("k"),
        when(col("ha").isNull, "added")
          .when(col("hb").isNull, "removed")
          .when(col("ha") =!= col("hb"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Diff rolled up to per-status counts — the usual reporting shape. */
  def diffSummary(a: DataFrame, b: DataFrame, key: String,
      cols: Seq[String]): DataFrame =
    diff(a, b, key, cols).groupBy("status").agg(count(lit(1)).as("n"))
}
