package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Distinct hashed word-n-gram shingles of a token array, as ONE
  * codegen'd pass: each token's bytes are XXH64'd once, gram hashes roll
  * over a window of those per-token hashes, and the output is the sorted
  * distinct gram-hash array. The higher-order-function spelling
  * (`transform(sequence(...), i => xxhash64(slice(toks, i, n)))`)
  * evaluates its lambda interpreted per gram and re-hashes every token's
  * bytes n times; this expression is the text-dedup hot loop (100 TB of
  * corpus flows through it), so it stays inside whole-stage codegen with
  * one byte-scan per token. Hash values are internal to the engine (only
  * set semantics reach any oracle), so the rolling combine just has to be
  * deterministic and collision-resistant.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    UnsafeArrayData.fromPrimitiveArray(
      ShingleHashes.distinctGramHashes(toks, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val helper = ShingleHashes.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($helper.distinctGramHashes($c, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ShingleHashes {
  private val Seed = 0x9747b28cL

  /** One pass: per-token XXH64 (one byte-scan each), rolling gram combine,
    * sort + dedup. Shared by interpreted eval and generated code.
    */
  def distinctGramHashes(toks: ArrayData, n: Int): Array[Long] = {
    val nTok = toks.numElements()
    val tokHash = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      val t = toks.getUTF8String(i)
      tokHash(i) =
        if (t == null) Seed
        else XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
          t.numBytes(), Seed)
      i += 1
    }
    val nGram = math.max(nTok - n + 1, 1)
    val grams = new Array[Long](nGram)
    var g = 0
    while (g < nGram) {
      var h = Seed
      var j = g
      val end = math.min(g + n, nTok)
      while (j < end) { h = XXH64.hashLong(tokHash(j), h); j += 1 }
      grams(g) = h
      g += 1
    }
    java.util.Arrays.sort(grams)
    var uniq = if (nGram > 0) 1 else 0
    var k = 1
    while (k < nGram) {
      if (grams(k) != grams(k - 1)) { grams(uniq) = grams(k); uniq += 1 }
      k += 1
    }
    java.util.Arrays.copyOf(grams, uniq)
  }
}
