package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec
import graft.ext.TextAnalysis

/** Fixtures spell combining marks / format characters as unicode escape
  * sequences so an editor or formatter can never silently NFC the source
  * file and turn the decomposed inputs into no-ops.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(df: org.apache.spark.sql.DataFrame) =
    df.select(Bridge.toColumn(
      NfcNormalize(Bridge.toExpr(col("t")))).as("n"))

  test("composes decomposed sequences; already-NFC text is unchanged") {
    val rows = Seq(
      "cafe\u0301",                 // e + combining acute
      "caf\u00E9",                  // precomposed already
      "A\u030Angstro\u0308m"            // ring/diaeresis from marks
    ).toDF("t")
    val got = nfc(rows).as[String].collect().toSeq
    assert(got == Seq("caf\u00E9", "caf\u00E9", "\u00C5ngstr\u00F6m"))
  }

  test("interpreted eval agrees with the codegen'd path") {
    val s = "ligature \uFB01 + mark e\u0301 + emoji \uD83D\uDE00"
    val gen = nfc(Seq(s).toDF("t")).as[String].head()
    val interp =
      NfcNormalize.compute(UTF8String.fromString(s)).toString
    assert(gen == interp)
    // NFC (unlike NFKC) preserves compatibility chars like the ligature
    assert(gen.contains("\uFB01") && gen.contains("\u00E9") &&
      gen.contains("\uD83D\uDE00"))
  }

  test("normalizeText: NFC + strip Cf/controls + collapse whitespace") {
    val messy =
      "  cafe\u0301\u200B  del\t\tgado x\u0001y \uFEFFz  "
    val got = Seq(messy).toDF("t")
      .select(TextAnalysis.normalizeText(col("t")).as("n"))
      .as[String].head()
    assert(got == "caf\u00E9 del gado xy z")
  }

  test("normalizeText is idempotent and non-BMP safe") {
    val docs = Seq("  a\u200D\uD83D\uDE00  b  ", "plain ascii", "")
      .toDF("t")
    val once = docs.select(TextAnalysis.normalizeText(col("t")).as("t"))
    val twice = once.select(TextAnalysis.normalizeText(col("t")).as("t"))
    assert(once.as[String].collect().toSeq ==
      twice.as[String].collect().toSeq)
  }
}
