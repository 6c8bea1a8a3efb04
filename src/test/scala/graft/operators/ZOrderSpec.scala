package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonLocal(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits)
      z |= (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    z
  }

  test("interleave matches the reference Morton encoding (bijective)") {
    val rnd = new scala.util.Random(11)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), ((1L << 21) - 1, (1L << 21) - 1)) ++
      Seq.fill(60)((rnd.nextInt(1 << 21).toLong, rnd.nextInt(1 << 21).toLong))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.interleave(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == mortonLocal(a, b, 21), s"($a,$b)")
    }
    // bijective on the sampled set → no two inputs collide
    assert(got.map(_._3).distinct.length == got.length)
  }

  test("quantileBucket balances a power-law column into 2^bits ranks") {
    val rnd = new scala.util.Random(3)
    // heavy-tailed: most mass tiny, rare huge values
    val vals = Seq.fill(4000)(math.pow(10, rnd.nextDouble() * 6).toLong)
    val df = vals.toDF("v")
    val bucketed = df.select(
      ZOrder.quantileBucket(df, col("v"), bits = 3).as("b"), col("v"))
    val counts = bucketed.groupBy("b").count()
      .as[(Int, Long)].collect().toMap
    assert(counts.keys.forall(b => b >= 0 && b <= 8))
    // roughly balanced: every occupied bucket within 3x of the ideal 500
    assert(counts.size >= 6, s"too few occupied buckets: $counts")
    assert(counts.values.forall(n => n <= 1500), s"skewed buckets: $counts")
    // monotone: bucket rank ordered like the value
    val pairs = bucketed.as[(Int, Long)].collect()
    val byB = pairs.groupBy(_._1).map { case (b, xs) =>
      b -> (xs.map(_._2).min, xs.map(_._2).max) }.toSeq.sortBy(_._1)
    byB.sliding(2).foreach {
      case Seq((_, (_, hiPrev)), (_, (loNext, _))) =>
        assert(hiPrev <= loNext, s"buckets not monotone: $byB")
      case _ =>
    }
  }

  test("clustered layout shrinks per-file spans on both dimensions") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(4000)((rnd.nextInt(1 << 14).toLong,
      rnd.nextInt(1 << 14).toLong))
    val dir = tmpDir("zorder_spec")
    ZOrder.cluster(rows.toDF("x", "y"), col("x"), col("y"), nFiles = 16,
      bits = 14)
      .write.mode("overwrite").parquet(dir)
    val spans = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("x"), col("y"))
      .groupBy("f")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .as[(String, Long, Long)].collect()
    assert(spans.length == 16)
    val full = (1 << 14).toDouble
    // a random unclustered 1/16th of the data would span ~the full domain
    // on both axes; Z-clustering must cut the AVERAGE span well below it
    val avgX = spans.map(_._2).sum / spans.length.toDouble
    val avgY = spans.map(_._3).sum / spans.length.toDouble
    assert(avgX < 0.6 * full, s"x spans not clustered: avg $avgX of $full")
    assert(avgY < 0.6 * full, s"y spans not clustered: avg $avgY of $full")
  }
}
