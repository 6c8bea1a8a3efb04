package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.TextAnalysis

class WinnowHashesSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "The quick brown fox jumps over the lazy dog",
    "  leading and   irregular\twhitespace\n everywhere  ",
    "MiXeD CaSe TeXt WiTh PUNCTUATION!!! and numbers 12345",
    "short",
    "tiny",
    "a",
    "",
    "    ",
    "exactly20characters!",
    "repetition repetition repetition repetition repetition",
    // supplementary-plane chars: 2 UTF-16 units but 1 code point each —
    // pins the code-point gram contract against the Spark-substr HOF
    "emoji 🎉 in the middle 🚀 and math 𝕏 alphanumerics 𝕐𝕑 here",
    "🎉🚀🎉🚀🎉🚀🎉🚀🎉🚀",
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("compiled expression equals the interpreted HOF reference") {
    for (k <- Seq(3, 5, 20); w <- Seq(2, 4)) {
      val df = texts.toDF("id", "t")
      val fast = df.select(col("id"),
          TextAnalysis.winnowingFingerprintsFast(col("t"), k, w).as("fps"))
        .as[(Long, Seq[Long])].collect().toMap
      val hof = df.select(col("id"),
          TextAnalysis.winnowingFingerprints(col("t"), k, w,
            hash = TextAnalysis.md5Hash48).as("fps"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(fast == hof, s"mismatch at k=$k w=$w")
    }
  }

  test("equivalence holds on the real document fixture") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val fast = docs.select(col("doc_id"),
        TextAnalysis.winnowingFingerprintsFast(col("text")).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    val hof = docs.select(col("doc_id"),
        TextAnalysis.winnowingFingerprints(col("text"),
          hash = TextAnalysis.md5Hash48).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fast == hof)
  }

  test("shared substrings of length >= w+k-1 share a fingerprint") {
    val a = "completely different prefix THE COMMON SHARED PASSAGE HERE x"
    val b = "another unrelated beginning THE COMMON SHARED PASSAGE HERE y"
    val df = Seq((1L, a), (2L, b)).toDF("id", "t")
    val fps = df.select(col("id"),
        TextAnalysis.winnowingFingerprintsFast(col("t"), 5, 4).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty)
  }
}
