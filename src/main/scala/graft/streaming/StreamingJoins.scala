package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (Structured Streaming's symmetric hash join).
  *
  * Scale design: both inputs carry watermarks and the join condition
  * bounds BOTH event times, so each side's buffered state is dropped as
  * soon as the other side's watermark passes the bound — state stays
  * O(join window × arrival rate) no matter how long the streams run.
  * An unbounded condition (or missing watermark) would buffer the whole
  * stream forever; Spark accepts it for inner joins, so the discipline
  * has to live in the operator, which is why this module exists.
  */
object StreamingJoins {

  /** Pairs every click with the same user's errors arriving within
    * `windowSec` seconds after it. Inputs need (user_id, event_id, ts);
    * with `Trigger.AvailableNow` over finite input the inner-join output
    * equals the batch join — which is what lets a DuckDB oracle check a
    * genuinely streaming plan.
    */
  /** Stream-static join: streaming facts against a static dimension.
    * The static side is broadcast per micro-batch (no state store at
    * all — the scale-relevant contrast with a stream-stream join), so
    * arbitrarily long streams enrich against a dimension with constant
    * memory. The dimension is re-resolved each batch, which is also the
    * standard slowly-refreshing-dimension pattern.
    */
  def enrichWithDim(facts: DataFrame, dim: DataFrame,
      key: Seq[String]): DataFrame =
    facts.join(broadcast(dim), key)

  def clickErrorPairs(clicks: DataFrame, errors: DataFrame,
      windowSec: Int): DataFrame =
    joinImpl(clicks, errors, windowSec, "inner")

  /** Left-outer variant: matched pairs emit as they join; a click with
    * no error in its window emits ONCE with null error — when the global
    * watermark passes `cts + windowSec` and its buffered state is
    * evicted (so "no match" has become final, not merely
    * not-yet-arrived). Clicks the final watermark never clears stay
    * unemitted; the gate's oracle mirrors exactly that emission rule,
    * making the state-eviction semantics themselves hash-checked.
    */
  def clickErrorPairsOuter(clicks: DataFrame, errors: DataFrame,
      windowSec: Int): DataFrame =
    joinImpl(clicks, errors, windowSec, "leftOuter")

  private def joinImpl(clicks: DataFrame, errors: DataFrame,
      windowSec: Int, joinType: String): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("cts"))
      .withWatermark("cts", "10 minutes")
    val e = errors
      .select(col("user_id").as("e_user"), col("event_id").as("error_id"),
        col("ts").as("ets"))
      .withWatermark("ets", "10 minutes")
    c.join(e, expr(
      s"user_id = e_user AND ets >= cts AND ets <= cts + interval $windowSec seconds"),
      joinType)
      .select(col("user_id"), col("click_id"), col("error_id"),
        (unix_micros(col("ets")) - unix_micros(col("cts"))).as("delta_us"))
  }
}
