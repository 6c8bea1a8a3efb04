package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries as a native expression: the 1-based
  * END position of every w-char gram whose 48-bit md5-prefix hash is 0
  * (mod m), excluding a cut that coincides with the end of the text —
  * exactly the cut rule [[graft.ext.TextAnalysis.cdcChunks]] defines.
  *
  * Rationale mirrors [[WinnowHashes]]: the HOF spelling
  * (`transform(sequence(...), i => md5(substr(text, i, w)) ...)`)
  * evaluates its lambda INTERPRETED per character position — a
  * per-position md5 through interpreted expression dispatch is the same
  * ~100 µs/gram trap the winnowing path measured. This expression does
  * the identical arithmetic in one compiled loop per row (one static
  * call keeps the row inside whole-stage codegen); equivalence to the
  * HOF reference is spec-pinned on arbitrary strings, and the
  * q_cdc_chunks oracle value-checks the cuts end to end.
  */
case class CdcCuts(child: Expression, w: Int, m: Int)
    extends UnaryExpression {

  require(w >= 1 && m >= 1, s"w=$w, m=$m must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_cuts"

  override def nullSafeEval(input: Any): Any =
    CdcCuts.compute(input.asInstanceOf[UTF8String], w, m)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcCuts$$.MODULE$$.compute($c, $w, $m)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcCuts {

  /** Positions and gram windows are CODE POINTS, not UTF-16 units: the
    * spec-pinned HOF reference uses Spark `length`/`substr` (code-point
    * semantics), the chunk fold slices by code points, and the DuckDB
    * oracle counts code points — a UTF-16 walk would shift every cut
    * after a supplementary-plane character (emoji, rare CJK) and break
    * the chunks-partition-the-text invariant. The all-BMP fast path
    * (the overwhelmingly common case) keeps the original allocation-free
    * substring loop.
    */
  def compute(text: UTF8String, w: Int, m: Int): GenericArrayData = {
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    if (n < w) return new GenericArrayData(Array.emptyIntArray)
    val md = MessageDigest.getInstance("MD5")
    val buf = new scala.collection.mutable.ArrayBuffer[Int]()
    if (n == s.length) {
      var i = 0
      while (i <= n - w) {
        if (WinnowHashes.md548(md, s.substring(i, i + w)) % m == 0) {
          val cut = i + w // 1-based end position of the gram at 0-based i
          if (cut < n) buf += cut
        }
        i += 1
      }
    } else {
      val cps = s.codePoints().toArray
      var i = 0
      while (i <= n - w) {
        if (WinnowHashes.md548(md, new String(cps, i, w)) % m == 0) {
          val cut = i + w
          if (cut < n) buf += cut
        }
        i += 1
      }
    }
    new GenericArrayData(buf.toArray)
  }
}
