package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's analytics-enrichment pipeline (§3.2 /
  * Organizers.py:125-292 `Calc_Risks`) as one declarative Spark
  * transform: per price basis (close, midpoint, weighted midpoint,
  * bid, ask) compute BS IV, binomial IV and greeks, then the
  * ±inf/NaN→0 cleanup.
  *
  * The kernels are deterministic Scala UDFs — the one place the
  * engine leaves codegen, exactly as SURVEY §2.9 prescribes (no Spark
  * built-in exists). The UDF returns ONE struct per price basis so
  * each row pays a single kernel invocation per basis, not one per
  * output column; Catalyst expands the struct into columns for free.
  */
object RiskKernels {

  import BlackScholes._

  /** (isCall?, price, S, K, t, r, q) → (bsIv, binIv, delta, gamma,
    * theta, vega, rho, dollarDelta). Null-safe: any null input yields
    * zeros, mirroring the reference's fillna(0).
    */
  final case class Risk(bs_iv: Double, binomial_iv: Double, delta: Double,
      gamma: Double, theta: Double, vega: Double, rho: Double,
      dollar_delta: Double)

  def riskOf(right: String, price: java.lang.Double, s: java.lang.Double,
      k: java.lang.Double, t: java.lang.Double, r: java.lang.Double,
      q: java.lang.Double): Risk = {
    if (right == null || price == null || s == null || k == null ||
      t == null || r == null || q == null)
      return Risk(0, 0, 0, 0, 0, 0, 0, 0)
    val isCall = right.nonEmpty && Character.toUpperCase(right.charAt(0)) == 'C'
    val iv = bsImpliedVol(isCall, price, s, k, t, r, q)
    val binIv = binomialImpliedVol(isCall, price, s, k, t, r, q)
    val g =
      if (iv > 0.0) bsGreeks(isCall, s, k, t, r, q, iv)
      else Greeks(0, 0, 0, 0, 0)
    def z(x: Double) = if (java.lang.Double.isFinite(x)) x else 0.0
    Risk(z(iv), z(binIv), z(g.delta), z(g.gamma), z(g.theta), z(g.vega),
      z(g.rho), z(g.delta * s))
  }

  private val riskUdf = udf(riskOf _)

  /** Self-verification of the risk kernel, per row: each boolean holds
    * whenever the kernels are internally consistent, independent of
    * the input data — which makes the whole enrichment oracle-checkable
    * (the DuckDB oracle asserts TRUE) even though root-finding itself
    * is not SQL-expressible.
    *
    *  - `bs_roundtrip_ok`    — bsPrice(bs_iv) recovers the input price
    *    to 1e-6 (bisection tolerance 1e-10 on σ; vega bounds the price
    *    error well inside 1e-6), or the solve was out-of-bounds (iv=0).
    *  - `binomial_roundtrip_ok` — same through the CRR tree (American
    *    exercise: the tree price is monotone in σ, so bisection's root
    *    is exact; no BS-vs-binomial closeness is asserted because the
    *    early-exercise premium over vega is data-dependent).
    *  - `delta_in_range` / `gamma_nonneg` / `vega_nonneg` — greeks
    *    sanity on solved rows.
    *  - `dollar_delta_exact` — Dollar_Delta ≡ Delta × S bit-for-bit.
    */
  final case class RiskCheck(bs_roundtrip_ok: Boolean,
      binomial_roundtrip_ok: Boolean, delta_in_range: Boolean,
      gamma_nonneg: Boolean, vega_nonneg: Boolean,
      dollar_delta_exact: Boolean)

  def verifyRisk(right: String, price: Double, s: Double, k: Double,
      t: Double, r: Double, q: Double, risk: Risk): RiskCheck = {
    val isCall = right != null && right.nonEmpty &&
      Character.toUpperCase(right.charAt(0)) == 'C'
    val bsOk = risk.bs_iv == 0.0 ||
      math.abs(bsPrice(isCall, s, k, t, r, q, risk.bs_iv) - price) < 1e-6
    val binOk = risk.binomial_iv == 0.0 ||
      math.abs(binomialPrice(isCall, s, k, t, r, q, risk.binomial_iv) - price) < 1e-6
    val solved = risk.bs_iv > 0.0
    val deltaOk = !solved ||
      (if (isCall) risk.delta >= 0.0 && risk.delta <= 1.0
       else risk.delta >= -1.0 && risk.delta <= 0.0)
    RiskCheck(bsOk, binOk, deltaOk,
      !solved || risk.gamma >= 0.0, !solved || risk.vega >= 0.0,
      risk.dollar_delta == risk.delta * s)
  }

  final case class RiskVerified(risk: Risk, check: RiskCheck)

  /** Null inputs yield the zero Risk, which is trivially consistent. */
  def riskVerifiedOf(right: String, price: java.lang.Double,
      s: java.lang.Double, k: java.lang.Double, t: java.lang.Double,
      r: java.lang.Double, q: java.lang.Double): RiskVerified = {
    val risk = riskOf(right, price, s, k, t, r, q)
    if (right == null || price == null || s == null || k == null ||
      t == null || r == null || q == null)
      RiskVerified(risk, RiskCheck(bs_roundtrip_ok = true,
        binomial_roundtrip_ok = true, delta_in_range = true,
        gamma_nonneg = true, vega_nonneg = true, dollar_delta_exact = true))
    else RiskVerified(risk, verifyRisk(right, price, s, k, t, r, q, risk))
  }

  private val riskVerifiedUdf = udf(riskVerifiedOf _)

  /** [[calcRisks]] for one un-prefixed basis, plus the [[RiskCheck]]
    * self-verification booleans — one kernel invocation per row. */
  def calcRisksVerified(df: DataFrame, priceCol: String): DataFrame = {
    val v = riskVerifiedUdf(col("right"), col(priceCol),
      col("underlier_price"), col("strike"), col("year_frac"),
      col("rf_rate"), col("div_yield"))
    val riskCols = Seq("bs_iv", "binomial_iv", "delta", "gamma", "theta",
      "vega", "rho", "dollar_delta").map(f => f -> col(s"__v.risk.$f"))
    val checkCols = Seq("bs_roundtrip_ok", "binomial_roundtrip_ok",
      "delta_in_range", "gamma_nonneg", "vega_nonneg", "dollar_delta_exact")
      .map(f => f -> col(s"__v.check.$f"))
    (riskCols ++ checkCols)
      .foldLeft(df.withColumn("__v", v)) { case (d, (n, c)) => d.withColumn(n, c) }
      .drop("__v")
  }

  /** U4 — missing-vol rescue (Organizers.py:172-185): rows whose
    * primary-price IV solved to 0 are re-solved with a fallback price
    * column (the reference retries with the midpoint). Declarative
    * `when` over a second kernel call on the SAME row — no second
    * pass over the data, no union.
    */
  def rescueMissingVol(df: DataFrame, ivCol: String,
      fallbackPriceCol: String): DataFrame = {
    val rescued = riskUdf(col("right"), col(fallbackPriceCol),
      col("underlier_price"), col("strike"), col("year_frac"),
      col("rf_rate"), col("div_yield"))
    df.withColumn(ivCol,
      when(col(ivCol) === 0.0, rescued("bs_iv")).otherwise(col(ivCol)))
  }

  /** Enrich `df` with IV/greeks columns for each (prefix → price
    * column) basis, like Organizers' close/midpoint/weighted-midpoint/
    * bid/ask passes (Organizers.py:162-271).
    *
    * Expects columns: right ('C'/'P'), underlier_price, strike,
    * year_frac, rf_rate, div_yield.
    */
  def calcRisks(df: DataFrame, bases: Map[String, String]): DataFrame =
    bases.foldLeft(df) { case (d, (prefix, priceCol)) =>
      val r = riskUdf(col("right"), col(priceCol), col("underlier_price"),
        col("strike"), col("year_frac"), col("rf_rate"), col("div_yield"))
      val tag = if (prefix.isEmpty) "" else s"${prefix}_"
      d.withColumn(s"__r_$prefix", r)
        .withColumn(s"${tag}bs_iv", col(s"__r_$prefix.bs_iv"))
        .withColumn(s"${tag}binomial_iv", col(s"__r_$prefix.binomial_iv"))
        .withColumn(s"${tag}delta", col(s"__r_$prefix.delta"))
        .withColumn(s"${tag}gamma", col(s"__r_$prefix.gamma"))
        .withColumn(s"${tag}theta", col(s"__r_$prefix.theta"))
        .withColumn(s"${tag}vega", col(s"__r_$prefix.vega"))
        .withColumn(s"${tag}rho", col(s"__r_$prefix.rho"))
        .withColumn(s"${tag}dollar_delta", col(s"__r_$prefix.dollar_delta"))
        .drop(s"__r_$prefix")
    }
}
