package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-STREAM windowed join — the q73-funnel step as a continuous
  * operator, and the one Structured Streaming join mode the rest of the
  * streaming surface doesn't exercise (StreamDecontam is stream-static).
  *
  * Click→purchase attribution: an inner join of two live event streams
  * on the user key with an event-time range bound. The range condition
  * plus per-side watermarks is what makes this runnable forever: the
  * engine derives how long each side's rows can still match (a click
  * older than watermark − horizon can never join a future purchase) and
  * evicts buffered state past that bound — so join state is bounded by
  * rate × horizon, not by stream history. Without the time bound the
  * same join would buffer both streams unboundedly; Spark rejects it in
  * append mode for exactly that reason. */
object StreamAttribution {

  /** Purchases attributed to a preceding click by the same user within
    * `horizon`. Both inputs need (user_id, event_id, ts). */
  def attribute(clicks: DataFrame, purchases: DataFrame,
      horizon: String = "30 minutes",
      watermark: String = "10 seconds"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"interval $horizon"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }
}
