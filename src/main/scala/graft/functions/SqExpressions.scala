package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** SQ8 encoder as a native codegen'd expression: for a d-dim
  * array<double> vector, emits the d 8-bit levels of the UNIT-normalized
  * vector against the per-dimension [lo, hi] ranges —
  * `floor(255·(x_i/‖v‖ − lo_i)/max(hi_i − lo_i, 1e-12) + 0.5)`.
  *
  * This is the corpus-sized hot path of [[graft.ext.SqIndex]]: the HOF
  * spelling (`transform` with an index lambda + `element_at` per range)
  * evaluates interpreted per element; the encoder touches every vector
  * of the corpus once at build and once per appended delta, so it lives
  * inside whole-stage codegen like [[PqEncode]]. Semantics are
  * bit-identical to the HOF spelling (same norm fold, same multiply/
  * divide order, `Math.floor(x + 0.5)`), which the q_sq_topk gate pins
  * end to end against the DuckDB oracle.
  *
  * The 2·d range doubles ride along as reference objects — embedded
  * once per generated class, never per row.
  */
case class SqEncode(child: Expression, lo: Array[Double],
    hi: Array[Double]) extends UnaryExpression {

  require(lo.length == hi.length && lo.nonEmpty,
    s"range arrays must match: ${lo.length} vs ${hi.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_sq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = math.min(v.numElements(), lo.length)
    var s = 0.0
    var i = 0
    while (i < v.numElements()) {
      val x = v.getDouble(i); s += x * x; i += 1
    }
    val nv = math.sqrt(s)
    val codes = new Array[Int](dim)
    i = 0
    while (i < dim) {
      val ux = v.getDouble(i) / nv
      val den = math.max(hi(i) - lo(i), 1e-12)
      codes(i) = math.floor(255.0 * (ux - lo(i)) / den + 0.5).toInt
      i += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sqLo", lo, "double[]")
    val hiRef = ctx.addReferenceObj("sqHi", hi, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nv = ctx.freshName("nv")
      val dim = ctx.freshName("dim")
      val ux = ctx.freshName("ux")
      val den = ctx.freshName("den")
      val codes = ctx.freshName("codes")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $v.numElements(); $i++) {
         |  double __x = $v.getDouble($i);
         |  $s += __x * __x;
         |}
         |double $nv = java.lang.Math.sqrt($s);
         |int $dim = java.lang.Math.min($v.numElements(), $loRef.length);
         |int[] $codes = new int[$dim];
         |for (int $i = 0; $i < $dim; $i++) {
         |  double $ux = $v.getDouble($i) / $nv;
         |  double $den = java.lang.Math.max($hiRef[$i] - $loRef[$i], 1e-12);
         |  $codes[$i] = (int) java.lang.Math.floor(
         |    255.0 * ($ux - $loRef[$i]) / $den + 0.5);
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Compressed-domain score for the SQ8 scan: given a row's code array
  * and the UNIT-normalized query, returns
  * `Σ_i qu_i · (lo_i + code_i·(hi_i − lo_i)/255)` — the asymmetric
  * dequantize-and-dot in one pass, THE inner loop of every
  * (corpus row × query) pair. Sum order and arithmetic match the
  * `DotProduct(qu, transform(code, dequant))` spelling bit-for-bit.
  */
case class SqAdc(left: Expression, right: Expression, lo: Array[Double],
    hi: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(lo.length == hi.length && lo.nonEmpty,
    s"range arrays must match: ${lo.length} vs ${hi.length}")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
    right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<double>), got " +
        s"${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq_adc"

  override def nullSafeEval(codeAny: Any, quAny: Any): Any = {
    val code = codeAny.asInstanceOf[ArrayData]
    val qu = quAny.asInstanceOf[ArrayData]
    val dim = math.min(math.min(code.numElements(), qu.numElements()),
      lo.length)
    var s = 0.0
    var i = 0
    while (i < dim) {
      val xh = lo(i) + code.getInt(i).toDouble * (hi(i) - lo(i)) / 255.0
      s += qu.getDouble(i) * xh
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sqLo", lo, "double[]")
    val hiRef = ctx.addReferenceObj("sqHi", hi, "double[]")
    nullSafeCodeGen(ctx, ev, (code, qu) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val dim = ctx.freshName("dim")
      val xh = ctx.freshName("xh")
      s"""
         |int $dim = java.lang.Math.min(
         |  java.lang.Math.min($code.numElements(), $qu.numElements()),
         |  $loRef.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $dim; $i++) {
         |  double $xh = $loRef[$i]
         |    + (double) $code.getInt($i) * ($hiRef[$i] - $loRef[$i]) / 255.0;
         |  $s += $qu.getDouble($i) * $xh;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
