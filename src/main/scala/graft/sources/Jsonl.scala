package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** Newline-delimited JSON ingest — the lingua franca of crawl and
  * training-data corpora (one document object per line), which the
  * reference's CSV-only loaders never needed. Reads are SCHEMA'D, never
  * inferred: at 100 TB schema inference is a full extra pass over the
  * data before the real one, and a drifting upstream silently changes
  * column types mid-corpus; a declared schema makes both impossible.
  *
  * [[read]] is the crawl posture — PERMISSIVE with a corrupt-record
  * capture column, so a malformed line (truncated upload, interleaved
  * log junk, schema-violating producer) becomes a quarantinable ROW
  * instead of a dead task five hours into the job. [[strict]] is the
  * curated-delivery posture — FAILFAST, where one bad line means the
  * delivery is bad and should be rejected whole.
  *
  * Scale shape: line-splittable (no multiline), so a 100 TB corpus
  * parallelizes by HDFS/S3 block exactly like CSV; the parse runs
  * inside the scan with column pruning intact.
  */
object Jsonl {

  /** Schema'd permissive scan: rows that parse land in `schema`'s
    * columns; rows that don't land whole in `corruptCol` (null
    * elsewhere), ready for a quarantine sink or a parse-failure-rate
    * quality signal.
    */
  def read(spark: SparkSession, schema: StructType,
      corruptCol: String = "_corrupt")(paths: String*): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(schema.add(corruptCol, StringType))
      .json(paths: _*)

  /** [[read]]'s Structured Streaming twin: a JSONL landing zone
    * tailed as a file stream, same permissive quarantine semantics per
    * micro-batch — the arrival half of a streaming corpus ingest (pair
    * with [[graft.ext.Ingest.admit]] in `foreachBatch`).
    */
  def readStream(spark: SparkSession, schema: StructType,
      corruptCol: String = "_corrupt")(path: String): DataFrame =
    spark.readStream
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .option("recursiveFileLookup", "true")
      .option("maxFilesPerTrigger", "1")
      .schema(schema.add(corruptCol, StringType))
      .json(path)

  /** Schema'd strict scan: the first malformed line fails the read —
    * the right posture for deliveries with a correctness contract.
    */
  def strict(spark: SparkSession, schema: StructType)(
      paths: String*): DataFrame =
    spark.read
      .option("mode", "FAILFAST")
      .schema(schema)
      .json(paths: _*)
}
