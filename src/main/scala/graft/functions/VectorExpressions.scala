package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native dot product over two array<double> columns, with whole-stage
  * codegen (`doGenCode` emits the tight multiply-add loop). The
  * higher-order-function spelling (`aggregate(zip_with(...))`) evaluates
  * its lambdas on the interpreted path per element; for similarity search
  * the dot product is the innermost loop over (corpus × queries × dim),
  * so it must stay inside generated code. Fold order is sequential
  * left-to-right, matching both the HOF spelling and DuckDB's
  * list_dot_product — results are bit-identical, so the oracle pairing is
  * unaffected.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { sum += x.getDouble(i) * y.getDouble(i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registers the graft SQL functions; attach with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or the
  * `spark.sql.extensions=graft.functions.GraftExtensions` conf, after
  * which `SELECT graft_dot(a, b)` works in plain SQL (reference entry
  * point 3 — ad-hoc SQL over the store, SURVEY §3.3).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName,
        "graft_shingle_hashes"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"graft_shingle_hashes(toks, n) takes 2 arguments, got ${exprs.length}")
        // accept any foldable integral n (e.g. 1+2), not only a bare literal
        val nExpr = exprs(1)
        if (!nExpr.foldable) throw new IllegalArgumentException(
          s"graft_shingle_hashes(toks, n): n must be foldable, got $nExpr")
        nExpr.eval() match {
          case n: Number => ShingleHashes(exprs.head, n.intValue())
          case other => throw new IllegalArgumentException(
            s"graft_shingle_hashes(toks, n): n must be integral, got $other")
        }
      }))
    // opt-in BETWEEN-join rewrite (spark.graft.autoRangeJoin.binWidth)
    e.injectOptimizerRule(graft.plans.AutoRangeJoinRule)
  }
}
