package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: whitespace split, lower-cased, trimmed") {
    val got = Seq("  The QUICK  fox ").toDF("t")
      .select(TextAnalysis.tokens(col("t"))).as[Seq[String]].collect()(0)
    assert(got == Seq("the", "quick", "fox"))
  }

  test("fingerprint is invariant to case and whitespace runs") {
    val got = Seq(
      ("a", "The  quick\tfox"),
      ("b", "the quick fox"),
      ("c", "the quick foxes"),
    ).toDF("id", "t")
      .select(TextAnalysis.fingerprint(col("t")).as("fp"))
      .as[String].collect()
    assert(got(0) == got(1))
    assert(got(0) != got(2))
  }

  test("language ID picks the profile with most stopword hits; " +
    "ties resolve to earlier profile") {
    val got = Seq(
      "the cat and the dog of a house",       // en
      "le chat et la maison de un jardin",    // fr
      "el gato y los perros que un una",      // es
      "der hund und die katze von ein haus",  // de
      "xyzzy plugh",                          // no hits → first profile
    ).toDF("t").select(TextAnalysis.languageId(
      TextAnalysis.tokens(col("t")))).as[String].collect()
    assert(got.toSeq == Seq("en", "fr", "es", "de", "en"))
  }

  test("quality score: repetitive text scores below diverse text") {
    val scores = Seq(
      ("diverse", "the cat and a dog of it is in the yard with more words"),
      ("spam", "buy buy buy buy buy buy buy buy buy buy buy buy buy"),
    ).toDF("id", "t")
      .select(col("id"), TextAnalysis.qualityScore(
        TextAnalysis.tokens(col("t"))).as("q"))
      .as[(String, Double)].collect().toMap
    assert(scores("diverse") > scores("spam"))
  }

  test("word shingles: n-grams for long docs, whole doc when shorter than n") {
    val got = Seq("a b c d", "a b").toDF("t")
      .select(TextAnalysis.wordShingles(
        TextAnalysis.tokens(col("t")), 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b"))
  }

  test("token count on the driver documents table is positive") {
    val n = graft.Tables.documents(spark, sf0001)
      .select(TextAnalysis.tokenCount(col("text")).as("n"))
      .agg(min("n")).as[Int].collect()(0)
    assert(n > 0)
  }
}
