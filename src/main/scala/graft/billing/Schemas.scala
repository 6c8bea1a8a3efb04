package graft.billing

import org.apache.spark.sql.types._

/** Fixed schemas for the billing data model.
  *
  * The reference declares these as DuckDB DDL (raw_billing at
  * `pipeline/assets/ingest.py:174-192`, processed_files at
  * `ingest.py:164-172`); here they are `StructType` constants so CSV
  * ingestion never relies on inference in the engine core (SURVEY §1.3-1.4).
  */
object Schemas {

  /** raw_billing: one row per billing event. `user_id` is intentionally
    * StringType — the reference README documents integer but the executed
    * DDL says VARCHAR (`ingest.py:178`); the DDL is authoritative.
    */
  val billing: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("resource_id", StringType),
    StructField("user_id", StringType),
    StructField("credit_usage", DoubleType),
    StructField("region", StringType),
    StructField("service_tier", StringType),
    StructField("operation_type", StringType),
    StructField("success", BooleanType),
    StructField("resource_type", StringType),
    StructField("invoice_id", StringType),
    StructField("currency", StringType),
    StructField("year", IntegerType),
    StructField("month", IntegerType),
    StructField("day", IntegerType),
  ))

  /** Partition columns live in the Hive path for the partitioned layout;
    * the CSV payload then carries only the first 11 columns.
    */
  val billingNoPartitionCols: StructType =
    StructType(billing.fields.dropRight(3))

  /** Natural dedup key of raw_billing (`ingest.py:190,251-255`). */
  val dedupKey: Seq[String] =
    Seq("timestamp", "resource_id", "user_id", "invoice_id")

  /** processed_files ingest ledger (`ingest.py:164-172`). */
  val processedFiles: StructType = StructType(Seq(
    StructField("filename", StringType, nullable = false),
    StructField("file_hash", StringType),
    StructField("processed_at", TimestampType),
    StructField("record_count", LongType),
  ))

  /** Typed edge for consumers who want compile-time field checks. */
  final case class BillingRecord(
      timestamp: java.sql.Timestamp,
      resource_id: String,
      user_id: String,
      credit_usage: Double,
      region: String,
      service_tier: String,
      operation_type: String,
      success: Boolean,
      resource_type: String,
      invoice_id: String,
      currency: String,
      year: Int,
      month: Int,
      day: Int,
  )
}
