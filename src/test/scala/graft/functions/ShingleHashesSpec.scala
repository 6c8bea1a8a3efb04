package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import graft.SparkSpec
import graft.ext.TextAnalysis

class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  private def hashes(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.select(Bridge.toColumn(
      ShingleHashes(Bridge.toExpr(col("toks")), n)).as("hs"))

  test("cardinality matches the distinct string-shingle set") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a",                    // heavy duplicate grams
      "one two",                      // shorter than n
      "solo",                         // single token
      "x y z x y z x y"               // periodic
    ).toDF("t").select(TextAnalysis.tokens(col("t")).as("toks"))
    val viaExpr = hashes(docs, 3)
      .select(size(col("hs"))).as[Int].collect().toSeq
    val viaStrings = docs
      .select(size(array_distinct(
        TextAnalysis.wordShingles(col("toks"), 3)))).as[Int].collect().toSeq
    assert(viaExpr == viaStrings)
  }

  test("equal token windows hash equal; different windows differ") {
    val one = Seq("p q r p q r").toDF("t")
      .select(TextAnalysis.tokens(col("t")).as("toks"))
    // windows: (p q r), (q r p), (r p q), (p q r) -> 3 distinct
    assert(hashes(one, 3).select(size(col("hs"))).as[Int].head() == 3)
  }

  test("interpreted eval agrees with the codegen'd path") {
    val df = Seq("alpha beta gamma delta epsilon").toDF("t")
      .select(TextAnalysis.tokens(col("t")).as("toks"))
    val gen = hashes(df, 2).as[Seq[Long]].head()
    val row = df.select(col("toks")).head()
    val interp = ShingleHashes.distinctGramHashes(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        row.getSeq[String](0).map(
          org.apache.spark.unsafe.types.UTF8String.fromString).toArray),
      2).toSeq
    assert(gen == interp)
  }

  test("SQL registration works") {
    Seq("a b c d").toDF("t").createOrReplaceTempView("sh_v")
    val n = spark.sql(
      """SELECT size(graft_shingle_hashes(split(t, ' '), 2)) AS n
        |FROM sh_v""".stripMargin).as[Int].head()
    assert(n == 3)
  }

  test("SQL builder: foldable n accepted, bad arity a readable error") {
    Seq("a b c d").toDF("t").createOrReplaceTempView("sh_v2")
    // foldable-but-not-literal n (1+1) must work
    val n = spark.sql(
      """SELECT size(graft_shingle_hashes(split(t, ' '), 1 + 1)) AS n
        |FROM sh_v2""".stripMargin).as[Int].head()
    assert(n == 3)
    val oneArg = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes(split(t, ' ')) FROM sh_v2")
        .collect()
    }
    assert(oneArg.getMessage.contains("takes 2 arguments"))
    val nonFoldable = intercept[Exception] {
      spark.sql(
        "SELECT graft_shingle_hashes(split(t, ' '), length(t)) FROM sh_v2")
        .collect()
    }
    assert(nonFoldable.getMessage.contains("foldable"))
  }
}
