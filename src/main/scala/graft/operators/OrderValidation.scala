package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order creation/replacement parameter validation
  * (Alpaca.py:99-120 `_replace_recreate_kind`, :193-202
  * `_replace_cancel_post_kw`, :776-860 `_replace_order_cancel_and_post`,
  * :635-667 `create_order` parameter domains) as pure column
  * predicates — the reference throws `ValueError` per order object;
  * the engine classifies every order of a batch in one codegen'd
  * projection, no row-at-a-time exceptions, so a 100 TB order-audit
  * backfill is a single scan.
  *
  * Input columns: `order_id, order_class, n_legs, symbol, otype, tif,
  * limit_price, order_qty, filled_qty, qty_requested,
  * client_order_id_len`. Added columns:
  *
  *  - `recreate_kind` — the cancel+post classification, exactly the
  *    reference's precedence: `mleg` first; `oco`/`bracket` rejected;
  *    `simple` rejected if the snapshot carries legs; any other class
  *    falls back to `simple` when a symbol and no legs are present,
  *    else rejected as unsupported;
  *  - `type_ok` / `tif_ok` — enum-domain checks on order type and
  *    (defaulted) time-in-force; `tif_eff` applies the reference's
  *    `or "day"` default chain;
  *  - `limit_price_ok` — cancel+post always requires `limit_price`;
  *  - `remaining` / `remaining_ok` / `new_qty` / `qty_clamped` — the
  *    remaining-quantity gate and the min(requested, remaining) clamp
  *    (`new_qty` is null when the gate fails: the reference raises
  *    before computing it);
  *  - `coid_len` — `client_order_id` truncated at 128 chars;
  *  - `replace_ok` — the conjunction: would this replace POST?
  */
object OrderValidation {

  val OrderTypes: Seq[String] =
    Seq("market", "limit", "stop", "stop_limit", "trailing_stop")
  val TimeInForce: Seq[String] = Seq("gtc", "ioc", "fok", "day", "opg")

  private def in(c: Column, dom: Seq[String]): Column =
    dom.map(c === _).reduce(_ || _)

  def validate(orders: DataFrame): DataFrame = {
    val oc = col("order_class")
    // Python truthiness: a missing AND an empty-string symbol both fail
    // `if symbol` (Alpaca.py:118, :871) — isNotNull alone would accept "".
    val hasSymbol = col("symbol").isNotNull && col("symbol") =!= ""
    val withKind = orders.withColumn("recreate_kind",
      when(oc === "mleg", "mleg")
        .when(oc === "oco" || oc === "bracket", "reject_oco_bracket")
        .when(oc === "simple" && col("n_legs") > 0, "reject_simple_with_legs")
        .when(oc === "simple", "simple")
        .when(hasSymbol && col("n_legs") === 0, "simple")
        .otherwise("reject_unsupported"))
    withKind
      .withColumn("type_ok", in(col("otype"), OrderTypes))
      .withColumn("tif_eff", coalesce(col("tif"), lit("day")))
      .withColumn("tif_ok", in(col("tif_eff"), TimeInForce))
      .withColumn("limit_price_ok", col("limit_price").isNotNull)
      .withColumn("remaining", col("order_qty") - col("filled_qty"))
      .withColumn("remaining_ok", col("remaining") > 0)
      .withColumn("new_qty",
        when(col("remaining_ok"), least(col("qty_requested"), col("remaining"))))
      .withColumn("qty_clamped",
        col("remaining_ok") && col("qty_requested") > col("remaining"))
      .withColumn("coid_len",
        least(col("client_order_id_len"), lit(128L)).cast("long"))
      .withColumn("replace_ok",
        col("limit_price_ok") && col("remaining_ok") && col("tif_ok") &&
        (col("recreate_kind") === "mleg" ||
          (col("recreate_kind") === "simple" &&
            // the reference defaults a missing type to limit
            // (Alpaca.py:865 `ot = ... or "limit"`) and rejects
            // falsy symbols, so null otype passes and "" fails
            coalesce(col("otype"), lit("limit")) === "limit" &&
            col("symbol").isNotNull && col("symbol") =!= "")))
  }
}
