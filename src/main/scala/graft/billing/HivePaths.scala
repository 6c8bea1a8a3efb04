package graft.billing

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hive `year=YYYY/month=MM/day=DD` path building and parsing as column
  * expressions (reference `pipeline/s3_utils.py:47-61,329-410`; SURVEY
  * S5/S6/F7). For real reads Spark's partition discovery replaces all of
  * this — these expressions exist for parity tests and for emitting
  * partitioned layouts.
  */
object HivePaths {

  /** `year=2025/month=04/day=07` from integer columns (zero-padded exactly
    * like the reference's f-strings at `s3_utils.py:383-385`).
    */
  def pathFor(year: Column, month: Column, day: Column): Column =
    concat(
      lit("year="), year.cast("string"),
      lit("/month="), lpad(month.cast("string"), 2, "0"),
      lit("/day="), lpad(day.cast("string"), 2, "0"))

  /** Inverse: the reference's `([^=]+)=([^=]+)` key=value parse, as regex
    * extraction per component.
    */
  def yearOf(path: Column): Column =
    regexp_extract(path, "year=(\\d+)", 1).cast("int")
  def monthOf(path: Column): Column =
    regexp_extract(path, "month=(\\d+)", 1).cast("int")
  def dayOf(path: Column): Column =
    regexp_extract(path, "day=(\\d+)", 1).cast("int")
}
