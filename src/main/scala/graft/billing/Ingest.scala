package graft.billing

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch ingestion: CSV scan, Hive-partition discovery, backfill windows,
  * and the idempotent dedup-append (reference `pipeline/assets/ingest.py`,
  * `pipeline/s3_utils.py`; SURVEY §2.1, §2.3, §2.9).
  */
object Ingest {

  /** S1: CSV scan with the fixed billing schema (header row, explicit types —
    * the engine core never infers; reference `ingest.py:237-240` uses
    * read_csv_auto, whose inferred columns bind to the fixed DDL by
    * position with implicit casts, which explicit-schema reads reproduce).
    * Globs work directly (S8: `data/raw/billing-*.csv`, `ingest.py:199`).
    */
  def readCsv(spark: SparkSession, paths: String*): DataFrame =
    spark.read
      .option("header", "true")
      .schema(Schemas.billing)
      .csv(paths: _*)

  /** S1 variant for schema-drift detection only (never in the load path). */
  def readCsvInferred(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(paths: _*)

  /** Schema drift report: diff an inferred file schema against the fixed
    * billing DDL. The reference binds inferred columns to the DDL *by
    * position with implicit casts* (`ingest.py:249-257`), which silently
    * absorbs drift; this surfaces it instead (new columns, missing
    * columns, type changes) so an operator can decide.
    */
  final case class SchemaDrift(added: Seq[String], missing: Seq[String],
      retyped: Seq[(String, String, String)]) {
    def isDrifted: Boolean =
      added.nonEmpty || missing.nonEmpty || retyped.nonEmpty
  }

  def schemaDrift(spark: SparkSession, paths: String*): SchemaDrift = {
    val inferred = readCsvInferred(spark, paths: _*).schema
    val fixed = Schemas.billing
    val inf = inferred.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val fix = fixed.fields.map(f => f.name -> f.dataType.simpleString).toMap
    SchemaDrift(
      added = inferred.fieldNames.filterNot(fix.contains).toSeq,
      missing = fixed.fieldNames.filterNot(inf.contains).toSeq,
      retyped = fixed.fields.toSeq.flatMap { f =>
        inf.get(f.name)
          .filter(_ != f.dataType.simpleString)
          .map(t => (f.name, f.dataType.simpleString, t))
      })
  }

  /** S4/S6: Hive-partitioned tree `root/year=YYYY/month=MM/day=DD/` CSVs.
    * Spark's built-in partition discovery materializes year/month/day as
    * int columns and prunes them at the scan — this single call replaces
    * the reference's 190 lines of hand-rolled listing/path-generation
    * (`s3_utils.py:47-157,329-410`). Filters on the partition columns
    * never touch excluded files (verified via `PartitionFilters` in
    * `.explain`).
    */
  def readHiveTree(spark: SparkSession, root: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("basePath", root)
      .schema(Schemas.billingNoPartitionCols)
      .csv(s"$root/year=*/month=*/day=*")
      // partition discovery yields the 3 cols; order them per the DDL
      .select(Schemas.billing.fieldNames.map(col): _*)

  /** T6: backfill window — a partition-column predicate, which Catalyst
    * turns into partition pruning (reads exactly the date range the
    * reference enumerates as explicit paths, `s3_utils.py:329-410`).
    */
  def backfill(df: DataFrame, fromDate: String, toDate: String): DataFrame =
    df.filter(
      make_date(col("year"), col("month"), col("day"))
        .between(to_date(lit(fromDate)), to_date(lit(toDate))))

  /** J1: idempotent dedup-append. New rows = staged rows with no match in
    * the existing table on the 4-column natural key (`ingest.py:248-257`).
    *
    * Implemented as a LEFT ANTI join with plain `===` equality — NULL key
    * columns never match (SQL equi-join semantics), so NULL-keyed rows are
    * re-inserted on every run *exactly like the reference* (its
    * `LEFT JOIN … WHERE r.resource_id IS NULL` has the same property).
    * Deliberately NOT `<=>`: that would "fix" a behavior the oracle has.
    *
    * Scale: the existing side only needs the key columns — project before
    * the join so the shuffle carries 4 columns, not 14. AQE broadcasts the
    * key set when it is small; otherwise a shuffled hash join on the key.
    */
  def newRows(staged: DataFrame, existing: DataFrame,
      key: Seq[String] = Schemas.dedupKey): DataFrame = {
    val existingKeys = existing.select(key.map(col): _*)
    staged.join(existingKeys, key, "left_anti")
  }

  /** In-batch duplicate collapse (the reference's UNIQUE constraint also
    * guards against dupes *within* one staged file): exact dedup on the
    * natural key, keeping an arbitrary-but-single row per key.
    */
  def dedupWithinBatch(staged: DataFrame,
      key: Seq[String] = Schemas.dedupKey): DataFrame =
    staged.dropDuplicates(key)
}
