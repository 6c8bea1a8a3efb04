package graft.ext

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multinomial NB against hand-computed log-space arithmetic, plus the
  * determinism contracts (tie-break, OOV floor, single-label margin).
  */
class ClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val train = Seq(
    ("spam", "buy pills now"),
    ("spam", "buy now now"),
    ("ham", "meeting notes attached"),
    ("ham", "notes for the meeting"))

  test("nbTrain counts, smoothing, and priors match hand computation") {
    val m = Classify.nbTrain(train.toDF("y", "t"), col("y"), col("t"))
    val pri = m.priors.as[(String, Double)].collect().toMap
    assert(math.abs(pri("spam") - math.log(0.5)) < 1e-12)
    assert(math.abs(pri("ham") - math.log(0.5)) < 1e-12)
    val like = m.likelihood.as[(String, String, Double)].collect()
      .map { case (l, t, p) => (l, t) -> p }.toMap
    // spam tokens: buy buy pills now now now (tot 6); vocab V=8
    assert(math.abs(like(("spam", "now")) - math.log(4.0 / 14)) < 1e-12)
    assert(math.abs(like(("spam", "buy")) - math.log(3.0 / 14)) < 1e-12)
    // ham tokens: meeting notes attached notes for the meeting (tot 7)
    assert(math.abs(like(("ham", "meeting")) - math.log(3.0 / 15)) < 1e-12)
    val oov = m.oov.as[(String, Double)].collect().toMap
    assert(math.abs(oov("spam") - math.log(1.0 / 14)) < 1e-12)
    assert(math.abs(oov("ham") - math.log(1.0 / 15)) < 1e-12)
  }

  test("nbPredict classifies, applies the OOV floor, and reports margin") {
    val m = Classify.nbTrain(train.toDF("y", "t"), col("y"), col("t"))
    val docs = Seq((1L, "buy now"), (2L, "meeting notes zzz"))
      .toDF("id", "t")
    val got = Classify.nbPredict(m, docs, col("id"), col("t"))
      .orderBy("id").as[(Long, String, Double, Double)].collect()
    // doc 1: spam = ln(.5)+ln(3/14)+ln(4/14); ham = ln(.5)+2·ln(1/15)
    val s1 = math.log(0.5) + math.log(3.0 / 14) + math.log(4.0 / 14)
    val h1 = math.log(0.5) + 2 * math.log(1.0 / 15)
    assert(got(0)._2 == "spam")
    assert(math.abs(got(0)._3 - round6(s1)) < 1e-9)
    assert(math.abs(got(0)._4 - round6(s1 - h1)) < 1e-9)
    // doc 2: ham = ln(.5)+ln(3/15)+ln(3/15)+ln(1/15) (zzz unseen)
    val h2 = math.log(0.5) + 2 * math.log(3.0 / 15) + math.log(1.0 / 15)
    assert(got(1)._2 == "ham")
    assert(math.abs(got(1)._3 - round6(h2)) < 1e-9)
  }

  test("exact score ties break by label ascending") {
    // symmetric corpus: both labels give any test doc identical scores
    val sym = Seq(("a", "x y"), ("b", "x y")).toDF("y", "t")
    val m = Classify.nbTrain(sym, col("y"), col("t"))
    val got = Classify.nbPredict(m, Seq((1L, "x")).toDF("id", "t"),
      col("id"), col("t")).as[(Long, String, Double, Double)].collect()
    assert(got.head._2 == "a")
    assert(got.head._4 == 0.0)
  }

  test("single-label model yields margin 0.0, not null") {
    val one = Seq(("only", "x y z")).toDF("y", "t")
    val m = Classify.nbTrain(one, col("y"), col("t"))
    val got = Classify.nbPredict(m, Seq((1L, "x q")).toDF("id", "t"),
      col("id"), col("t")).as[(Long, String, Double, Double)].collect()
    assert(got.head._2 == "only" && got.head._4 == 0.0)
  }

  test("nbMerge of batch partials equals counting the union") {
    val a = Seq(("x", "p q p"), ("y", "r")).toDF("y", "t")
    val b = Seq(("x", "q s"), ("z", "p")).toDF("y", "t")
    val merged = Classify.nbMerge(
      Classify.nbCount(a, col("y"), col("t")),
      Classify.nbCount(b, col("y"), col("t")))
    val whole = Classify.nbCount(a.unionByName(b), col("y"), col("t"))
    def tc(c: Classify.NbCounts) = c.termCounts
      .as[(String, String, Long)].collect().toSet
    def dc(c: Classify.NbCounts) = c.docCounts
      .as[(String, Long)].collect().toSet
    assert(tc(merged) == tc(whole) && dc(merged) == dc(whole))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
