package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints as a native expression: normalize →
  * hash every character k-gram (48-bit md5 prefix, the oracle-checkable
  * hash) → sliding-window minima → first-occurrence distinct, all in one
  * compiled pass per row.
  *
  * The HOF spelling ([[graft.ext.TextAnalysis.winnowingFingerprints]])
  * evaluates its `transform`/`zip_with` lambdas INTERPRETED per gram,
  * with the gram array inlined once per shifted slice — measured
  * ~100 µs/gram, which turned the sf0.1 corpus into a two-minute scan
  * (masked in bench by `count()` pruning the unused column; exposed the
  * moment a consumer exploded the fingerprints). This expression does
  * the identical arithmetic in compiled code: same trim-spaces →
  * `\s+`→' ' → lowercase normalization, same md5-prefix value as
  * `conv(substring(md5(g),1,12),16,10)`, same window-order minima and
  * first-occurrence dedup — equivalence is spec-pinned against the HOF
  * reference and the q_winnow_fp / q_winnow_overlap oracles.
  */
case class WinnowHashes(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"k=$k, w=$w must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_hashes"

  override def nullSafeEval(input: Any): Any =
    WinnowHashes.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    // one static call per ROW keeps the row inside whole-stage codegen;
    // the per-gram loops run in the compiled helper
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowHashes$$.MODULE$$.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowHashes {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Mirror of `lower(regexp_replace(trim(text), "\\s+", " "))`: Spark's
    * `trim` strips 0x20 only (NOT Java's `String.trim`, which also eats
    * control chars), the regex is Java-semantics either way, and
    * lowercase is locale-independent.
    */
  private def normalize(s: UTF8String): String =
    ws.matcher(s.trim().toLowerCase.toString).replaceAll(" ")

  /** First 6 md5 bytes as an unsigned big-endian long — the exact value
    * of `conv(substring(md5(g),1,12),16,10)` (12 hex chars = 48 bits,
    * always positive). Shared with [[CdcCuts]].
    */
  private[functions] def md548(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val norm = normalize(text)
    // Gram windows are CODE POINTS (the HOF reference's Spark
    // `length`/`substr` semantics), not UTF-16 units — same contract as
    // [[CdcCuts.compute]]; the all-BMP fast path avoids the array copy.
    val n = norm.codePointCount(0, norm.length)
    val grams: Array[Long] =
      if (n < k) Array(md548(md, norm))
      else if (n == norm.length)
        Array.tabulate(n - k + 1)(i => md548(md, norm.substring(i, i + k)))
      else {
        val cps = norm.codePoints().toArray
        Array.tabulate(n - k + 1)(i => md548(md, new String(cps, i, k)))
      }
    val nWin = math.max(grams.length - (w - 1), 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < nWin) {
      var m = grams(j)
      var l = 1
      while (l < w && j + l < grams.length) {
        if (grams(j + l) < m) m = grams(j + l)
        l += 1
      }
      seen.add(m)
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}
