package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encoder as a native codegen'd expression: for a
  * d-dim array<double> vector, emits the m 1-based ids of the nearest
  * subspace centroids over the UNIT-normalized vector — the whole
  * normalize → per-subspace argmin pipeline in one generated loop nest.
  *
  * This is the corpus-sized hot path of [[graft.ext.PqIndex.build]]: the
  * HOF spelling (`transform`/`aggregate` per subspace) evaluates its
  * lambdas interpreted per element and re-walks the vector m times; at
  * 100 TB the encoder touches every vector once, so it must live inside
  * whole-stage codegen like [[DotProduct]]. Semantics are bit-identical
  * to the HOF spelling: norm is the same left-to-right multiply-add sum,
  * normalization divides by sqrt(norm) per element, distances accumulate
  * (c_t − v_t)² in subspace order, and ties pick the FIRST minimum
  * (matching `array_position(dists, array_min(dists))`).
  *
  * The codebook rides along as a flattened reference object
  * (`[(j·k + c)·dsub + t]` layout), not as literals — 8k doubles embed
  * once per generated class, never per row.
  *
  * `normalize = false` skips the unit-normalization and encodes the
  * input array as-is — the residual-encoding path of
  * [[graft.ext.IvfPqIndex]], where the child is already a residual in
  * unit space (re-normalizing a residual would corrupt it).
  */
case class PqEncode(child: Expression, m: Int, dsub: Int,
    codebook: Array[Double], normalize: Boolean = true)
    extends UnaryExpression {

  private val k: Int = codebook.length / (m * dsub)
  require(m >= 1 && dsub >= 1 && k >= 1 && codebook.length == m * k * dsub,
    s"codebook length ${codebook.length} != m*k*dsub = ${m * k * dsub}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = m * dsub
    var nv = 1.0
    if (normalize) {
      var s = 0.0
      var i = 0
      while (i < dim) { val x = v.getDouble(i); s += x * x; i += 1 }
      nv = math.sqrt(s)
    }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = codebook((j * k + c) * dsub + t) -
            v.getDouble(j * dsub + t) / nv
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best + 1
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val s = ctx.freshName("s")
      val nv = ctx.freshName("nv")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val codes = ctx.freshName("codes")
      val dim = m * dsub
      val normCode =
        if (normalize)
          s"""
             |double $s = 0.0;
             |for (int $i = 0; $i < $dim; $i++) {
             |  double __x = $v.getDouble($i);
             |  $s += __x * __x;
             |}
             |double $nv = java.lang.Math.sqrt($s);
           """.stripMargin
        else s"double $nv = 1.0;"
      s"""
         |$normCode
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d = 0.0;
         |    for (int $t = 0; $t < $dsub; $t++) {
         |      double $diff = $cb[($j * $k + $c) * $dsub + $t]
         |        - $v.getDouble($j * $dsub + $t) / $nv;
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$j] = $best + 1;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance lookup for the PQ scan: given a row's code array
  * (1-based ids, array<int>) and the query's per-subspace distance
  * tables (array<array<double>>), returns Σ_j dt(j)(code(j)−1) — the
  * approximate distance, i.e. m array reads and adds per (corpus row ×
  * query). This is THE compressed-domain inner loop (the reason PQ
  * exists), so like [[PqEncode]] it must not run as an interpreted HOF
  * lambda. Sum order and the 1-based indexing match the
  * `aggregate(zip_with(dt, code, element_at))` spelling bit-for-bit.
  */
case class PqAdc(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
    right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<array<double>>), got " +
        s"${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(codeAny: Any, dtAny: Any): Any = {
    val code = codeAny.asInstanceOf[ArrayData]
    val dt = dtAny.asInstanceOf[ArrayData]
    val m = math.min(code.numElements(), dt.numElements())
    var s = 0.0
    var j = 0
    while (j < m) {
      s += dt.getArray(j).getDouble(code.getInt(j) - 1)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, dt) => {
      val j = ctx.freshName("j")
      val mm = ctx.freshName("m")
      val s = ctx.freshName("s")
      s"""
         |int $mm = java.lang.Math.min($code.numElements(), $dt.numElements());
         |double $s = 0.0;
         |for (int $j = 0; $j < $mm; $j++) {
         |  $s += $dt.getArray($j).getDouble($code.getInt($j) - 1);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
