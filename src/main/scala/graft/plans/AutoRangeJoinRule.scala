package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrites a naive point-in-interval inner join
  * (`L ⋈ R ON p >= s AND p <= e`, integral columns, point and bounds on
  * opposite sides) into the binned equi-join of
  * [[graft.operators.RangeJoin.pointInterval]] — Spark would otherwise
  * plan a broadcast nested loop with an O(|L|×|R|) predicate, the classic
  * 100 TB cliff for BETWEEN joins users write naively.
  *
  * Rewritten shape:
  * {{{
  *   Project(origOutput,
  *     Filter(origCond,                       // exact bounds re-check
  *       Join(point + floor(p/w) AS bin,
  *            Generate(explode(sequence(floor(s/w), floor(e/w)))) over R,
  *            Inner, bin = bin)))
  * }}}
  * Each point lives in exactly one bin and each interval explodes to
  * distinct bins, so no pair duplicates and no distinct() is needed.
  *
  * Opt-in: set `spark.graft.autoRangeJoin.binWidth` to a positive bin
  * width (same units as the point column; ≈ typical interval length).
  * The match is deliberately narrow — exactly the two bound conjuncts,
  * integral types, strict side separation — so no other join shape can
  * be touched. Registered via
  * [[graft.functions.GraftExtensions]] (`injectOptimizerRule`); the
  * operator-optimization batch runs to fixed point, and the rewritten
  * join's equi condition no longer matches, so the rule is idempotent.
  */
case class AutoRangeJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val confKey = "spark.graft.autoRangeJoin.binWidth"

  private def isIntegral(x: Expression): Boolean = x.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = spark.conf.get(confKey, "0").toLong
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        matchPointInterval(left, right, cond)
          .map { case (p, s, e) => rewrite(j, p, s, e, w) }
          .getOrElse(j)
    }
  }

  /** Exactly `(s <= p) AND (p <= e)` modulo conjunct order and comparison
    * direction, with p's references on one side and s/e's on the other.
    */
  private def matchPointInterval(left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[(Expression, Expression, Expression)] = {
    def oneSided(p: Expression, s: Expression, e: Expression) = {
      val pL = p.references.subsetOf(left.outputSet)
      val pR = p.references.subsetOf(right.outputSet)
      val seL = (s.references ++ e.references).subsetOf(left.outputSet)
      val seR = (s.references ++ e.references).subsetOf(right.outputSet)
      (pL && seR) || (pR && seL)
    }
    cond match {
      case And(c1, c2) =>
        // normalize each conjunct to (lo, hi) meaning lo <= hi
        val bounds = Seq(c1, c2).map {
          case LessThanOrEqual(a, b)    => Some((a, b))
          case GreaterThanOrEqual(a, b) => Some((b, a))
          case _                        => None
        }
        bounds match {
          case Seq(Some((lo1, hi1)), Some((lo2, hi2))) =>
            // p is the shared endpoint: hi of one conjunct, lo of the other
            Seq((hi1, lo1, hi2), (hi2, lo2, hi1)).collectFirst {
              case (p, s, e)
                  if p.semanticEquals(if (p eq hi1) lo2 else lo1) &&
                    Seq(p, s, e).forall(isIntegral) &&
                    oneSided(p, s, e) && p.deterministic &&
                    s.deterministic && e.deterministic =>
                (p, s, e)
            }
          case _ => None
        }
      case _ => None
    }
  }

  private def rewrite(j: Join, p: Expression, s: Expression,
      e: Expression, w: Long): LogicalPlan = {
    val pointOnLeft = p.references.subsetOf(j.left.outputSet)
    val (pointSide, ivalSide) =
      if (pointOnLeft) (j.left, j.right) else (j.right, j.left)
    def bin(x: Expression): Expression =
      Floor(Divide(Cast(x, DoubleType), Literal(w.toDouble)))
    val binP = Alias(bin(p), "__graft_bin_p")()
    val pointPlan = Project(pointSide.output :+ binP, pointSide)
    // Sequence is TimeZoneAwareExpression: without an explicit zone it
    // stays unresolved (ResolveTimeZone only runs in the analyzer)
    val gen = Explode(Sequence(bin(s), bin(e), Some(Literal(1L)),
      Some(spark.sessionState.conf.sessionLocalTimeZone)))
    val binI = AttributeReference("__graft_bin_i", LongType,
      nullable = gen.elementSchema.head.nullable)()
    // An inverted interval (s > e) matches no point under the original
    // BETWEEN, but Sequence with an explicit +1 step throws on start >
    // stop — filter such rows out first (NULL bounds also drop here,
    // matching the original condition's three-valued no-match).
    val ivalFiltered = Filter(LessThanOrEqual(s, e), ivalSide)
    val ivalPlan = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(binI), child = ivalFiltered)
    val (newLeft, newRight) =
      if (pointOnLeft) (pointPlan, ivalPlan) else (ivalPlan, pointPlan)
    val equiJoin = Join(newLeft, newRight, Inner,
      Some(EqualTo(binP.toAttribute, binI)), j.hint)
    Project(j.output, Filter(j.condition.get, equiJoin))
  }
}
