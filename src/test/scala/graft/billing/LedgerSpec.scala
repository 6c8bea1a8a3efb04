package graft.billing

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.SparkSpec

class LedgerSpec extends SparkSpec {
  import spark.implicits._

  test("F3: distributed md5 matches MessageDigest") {
    val dir = tmpDir("ledger_md5")
    val content = "hello,billing\n1,2\n"
    Files.writeString(Paths.get(dir, "a.csv"), content)
    val got = Ledger.hashFiles(spark, s"$dir/*.csv")
      .select("file_hash").as[String].collect()(0)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(content.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got == expected)
  }

  test("T4: toProcess keeps new files and modified files, skips unchanged") {
    val ledger = Seq(
      ("f1.csv", "hash1", Timestamp.valueOf("2025-01-01 00:00:00"), 10L),
      ("f2.csv", "hash2", Timestamp.valueOf("2025-01-01 00:00:00"), 20L),
    ).toDF("filename", "file_hash", "processed_at", "record_count")
    val candidates = Seq(
      ("f1.csv", "hash1"),    // unchanged → skip
      ("f2.csv", "hashX"),    // rewritten → process
      ("f3.csv", "hash3"),    // new → process
    ).toDF("filename", "file_hash")
    val got = Ledger.toProcess(candidates, ledger)
      .select("filename").as[String].collect().sorted
    assert(got.toSeq == Seq("f2.csv", "f3.csv"))
  }

  test("T4: upsert is last-wins per filename (INSERT OR REPLACE)") {
    val ledger = Seq(
      ("f1.csv", "hash1", Timestamp.valueOf("2025-01-01 00:00:00"), 10L),
    ).toDF("filename", "file_hash", "processed_at", "record_count")
    val updates = Seq(
      ("f1.csv", "hashNew", Timestamp.valueOf("2025-01-02 00:00:00"), 12L),
      ("f2.csv", "hash2", Timestamp.valueOf("2025-01-02 00:00:00"), 5L),
    ).toDF("filename", "file_hash", "processed_at", "record_count")
    val got = Ledger.upsert(ledger, updates).orderBy("filename").collect()
    assert(got.length == 2)
    assert(got(0).getAs[String]("file_hash") == "hashNew")
    assert(got(0).getAs[Long]("record_count") == 12L)
  }

  test("T4: update wins over ledger at equal processed_at") {
    val t = Timestamp.valueOf("2025-01-01 00:00:00")
    val ledger = Seq(("f1.csv", "old", t, 1L))
      .toDF("filename", "file_hash", "processed_at", "record_count")
    val updates = Seq(("f1.csv", "new", t, 2L))
      .toDF("filename", "file_hash", "processed_at", "record_count")
    val got = Ledger.upsert(ledger, updates).collect()(0)
    assert(got.getAs[String]("file_hash") == "new")
  }
}
