package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  test("docs sharing a long substring share a winnowing fingerprint; " +
    "disjoint docs don't") {
    val shared = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, s"prefix alpha $shared suffix one"),
      (2L, s"totally different start $shared and another ending"),
      (3L, "no overlap here at all with anything else whatsoever"),
    ).toDF("id", "t")
    val fps = docs.select(col("id"),
      explode(TextAnalysis.winnowingFingerprints(col("t"))).as("fp"))
    val pairs = fps.as("a").join(fps.as("b"),
      col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("fingerprinting is deterministic and bounded by gram count") {
    val got = Seq("a tiny doc", "a tiny doc").toDF("t")
      .select(TextAnalysis.winnowingFingerprints(col("t")).as("fps"))
      .as[Seq[Long]].collect()
    assert(got(0) == got(1))
    assert(got(0).nonEmpty)
  }

  test("bpe tokens split words, numbers, and punctuation runs") {
    val got = Seq("Hello, world42!  it's x9").toDF("t")
      .select(TextAnalysis.bpeTokens(col("t"))).as[Seq[String]].collect()(0)
    assert(got == Seq("hello", ",", " world", "42", "!", " it", "'s", " x", "9"))
  }
}
