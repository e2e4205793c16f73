package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The broker order-lifecycle state machine (Alpaca.py:735-771
  * `_replace_poll_after_delete`, :776-860 `_replace_order_cancel_and_
  * post`, :893+ `replace_order`) restated as a DETERMINISTIC batch
  * fold over an order-event stream — the same move q65 made for the
  * catalog lifecycle: the reference's imperative cancel→poll→repost
  * loop becomes per-order aggregation + column logic, so the terminal
  * states are reproducible and oracle-checkable.
  *
  * Event stream schema: `(order_id, seq, kind, qty, price)` with kinds
  * `create` (qty, limit price), `fill` (executed qty — partial fills
  * sum), `reject`, `cancel_request`, `replace_request` (new limit
  * price). Transition rules, exactly the reference's poll outcomes:
  *
  *  - fills reaching the created qty → `filled`; a pending replace is
  *    ABORTED ("order filled during cancel; not posting replacement",
  *    Alpaca.py:758-760)
  *  - `reject` → `rejected`; a pending replace is aborted
  *    (Alpaca.py:763-766)
  *  - `replace_request` on a live order → original `canceled` plus a
  *    replacement order (`new`) for the REMAINING qty at the new
  *    price (`_order_remaining_qty`, Alpaca.py:800-804) under a
  *    derived id
  *  - `cancel_request` alone → `canceled`
  *  - partial fills → `partially_filled`; otherwise `accepted`
  *
  * One hash aggregation on order_id + a filtered projection for the
  * replacements — state per order is O(1), no window, no per-order
  * iteration, so the fold scales to any order volume.
  */
object OrderLifecycle {

  def finalStates(events: DataFrame,
      replacementIdOffset: Long = 1000000L): DataFrame = {
    val agg = events.groupBy(col("order_id")).agg(
      max(when(col("kind") === "create", col("qty"))).as("qty"),
      max(when(col("kind") === "create", col("price"))).as("limit_price"),
      coalesce(sum(when(col("kind") === "fill", col("qty"))), lit(0L))
        .as("filled_qty"),
      max(when(col("kind") === "cancel_request", lit(1)).otherwise(lit(0)))
        .as("has_cancel"),
      max(when(col("kind") === "reject", lit(1)).otherwise(lit(0)))
        .as("has_reject"),
      // last replace wins (struct max orders by seq first)
      max(when(col("kind") === "replace_request", struct(col("seq"), col("price"))))
        .as("last_replace"))
    val st = agg.withColumn("status",
      when(col("filled_qty") >= col("qty"), "filled")
        .when(col("has_reject") === 1, "rejected")
        .when(col("last_replace").isNotNull, "canceled")
        .when(col("has_cancel") === 1, "canceled")
        .when(col("filled_qty") > 0, "partially_filled")
        .otherwise("accepted"))
    val originals = st.select(
      col("order_id"), col("qty"), col("limit_price"), col("filled_qty"),
      col("status"), lit(null).cast("long").as("replaced_from"))
    // repost fires ONLY when the original reached canceled (not
    // filled/rejected during the poll) — remaining qty, new price
    val replacements = st
      .filter(col("status") === "canceled" && col("last_replace").isNotNull)
      .select(
        (col("order_id") + lit(replacementIdOffset)).as("order_id"),
        (col("qty") - col("filled_qty")).as("qty"),
        col("last_replace.price").as("limit_price"),
        lit(0L).as("filled_qty"),
        lit("new").as("status"),
        col("order_id").as("replaced_from"))
    originals.unionByName(replacements)
  }
}
