package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the single right row with the
  * greatest `rightTime` ≤ `leftTime` within the same key group (the
  * point-in-time lookup of financial/event pipelines).
  *
  * Implementation is the union + running-`last(ignoreNulls)` window trick
  * rather than a range join: both sides are tagged and unioned, sorted
  * within each key by (time, side) — right rows first at equal times so
  * `≤` semantics hold — and every left row picks up the most recent
  * right payload carried by the window. Cost at scale: ONE shuffle on the
  * key (same as any grouped op) and a linear in-partition pass — no
  * quadratic time-range explosion, no custom physical operator, AQE/skew
  * handling apply as usual. (Preference order (a): composed built-ins —
  * SURVEY §2.10.)
  */
object AsOfJoin {

  /** @param keys      equi-join key columns present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right` (may differ in name)
    * @param payload   right-side columns to carry (must not clash with
    *                  left column names)
    * @return all left rows and columns, plus `payload` columns and
    *         `<rightTime>_matched` (all NULL when no prior right row)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val matchedTime = s"${rightTime}_matched"
    val carried = payload :+ matchedTime

    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        payload.map(col) :+ col(rightTime).as(matchedTime): _*)
      .select((keys ++ Seq("__t", "__side") ++ carried).map(col) ++
        leftCols.filterNot(c => keys.contains(c))
          .map(c => lit(null).as(s"__l_$c")): _*)

    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        carried.map(c => lit(null).as(c)) ++
        leftCols.filterNot(c => keys.contains(c))
          .map(c => col(c).as(s"__l_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withCarry = carried.foldLeft(taggedRight.unionByName(taggedLeft)) {
      case (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }

    withCarry.filter(col("__side") === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(s"__l_$c").as(c)) ++
        carried.map(col): _*)
  }
}
