package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.BlackScholes._

class BlackScholesSpec extends AnyFunSuite {

  test("normCdf matches known values to 1e-9") {
    assert(math.abs(normCdf(0.0) - 0.5) < 1e-12)
    assert(math.abs(normCdf(1.0) - 0.8413447460685429) < 1e-9)
    assert(math.abs(normCdf(-1.96) - 0.024997895148220435) < 1e-9)
    assert(math.abs(normCdf(3.0) - 0.9986501019683699) < 1e-9)
  }

  test("bsPrice matches the canonical textbook value") {
    // S=100 K=100 t=1 r=5% q=0 sigma=20%: call = 10.450583572185565
    val c = bsPrice(isCall = true, 100, 100, 1.0, 0.05, 0.0, 0.2)
    assert(math.abs(c - 10.450583572185565) < 1e-9)
    val p = bsPrice(isCall = false, 100, 100, 1.0, 0.05, 0.0, 0.2)
    // put-call parity: C - P = S e^{-qt} - K e^{-rt}
    assert(math.abs((c - p) - (100 - 100 * math.exp(-0.05))) < 1e-9)
  }

  test("implied vol inverts bsPrice across moneyness/expiry grid") {
    for {
      sigma <- Seq(0.08, 0.2, 0.55, 1.2)
      k <- Seq(60.0, 95.0, 100.0, 140.0)
      t <- Seq(0.02, 0.25, 1.0, 2.5)
      isCall <- Seq(true, false)
    } {
      val price = bsPrice(isCall, 100, k, t, 0.04, 0.01, sigma)
      val floor = bsPrice(isCall, 100, k, t, 0.04, 0.01, 1e-9)
      // skip numerically unidentifiable points (vega ~ 0: deep ITM,
      // near expiry — price indistinguishable from intrinsic)
      if (price > 1e-6 && price - floor > 1e-7) {
        val iv = bsImpliedVol(isCall, price, 100, k, t, 0.04, 0.01)
        assert(math.abs(iv - sigma) < 1e-6,
          s"sigma=$sigma k=$k t=$t call=$isCall got=$iv")
      }
    }
  }

  test("out-of-bounds prices coerce to zero vol like the reference") {
    assert(bsImpliedVol(isCall = true, -1.0, 100, 100, 1, 0.05, 0.0) == 0.0)
    assert(bsImpliedVol(isCall = true, 0.0, 100, 100, 1, 0.05, 0.0) == 0.0)
    // below discounted intrinsic
    assert(bsImpliedVol(isCall = true, 1.0, 100, 50, 1, 0.05, 0.0) == 0.0)
    // above no-arb cap
    assert(bsImpliedVol(isCall = true, 150.0, 100, 100, 1, 0.05, 0.0) == 0.0)
  }

  test("binomial European-limit converges to Black-Scholes") {
    val bs = bsPrice(isCall = true, 100, 110, 0.5, 0.03, 0.0, 0.3)
    val bin = binomialPrice(isCall = true, 100, 110, 0.5, 0.03, 0.0, 0.3, 500)
    assert(math.abs(bs - bin) < 0.02) // American call, no dividend = European
  }

  test("american put carries early-exercise premium") {
    val eu = bsPrice(isCall = false, 100, 120, 1.0, 0.08, 0.0, 0.2)
    val am = binomialPrice(isCall = false, 100, 120, 1.0, 0.08, 0.0, 0.2, 200)
    assert(am > eu)
    assert(am >= 20.0) // at least immediate exercise value
  }

  test("greeks: delta bounds, gamma positive, put-call delta parity") {
    val g = bsGreeks(isCall = true, 100, 100, 1.0, 0.05, 0.0, 0.2)
    val gp = bsGreeks(isCall = false, 100, 100, 1.0, 0.05, 0.0, 0.2)
    assert(g.delta > 0 && g.delta < 1)
    assert(gp.delta > -1 && gp.delta < 0)
    assert(math.abs((g.delta - gp.delta) - 1.0) < 1e-9) // e^{-qt}=1
    assert(g.gamma > 0 && math.abs(g.gamma - gp.gamma) < 1e-12)
    assert(g.vega > 0 && math.abs(g.vega - gp.vega) < 1e-12)
    // finite-difference check of delta
    val eps = 1e-4
    val up = bsPrice(isCall = true, 100 + eps, 100, 1.0, 0.05, 0.0, 0.2)
    val dn = bsPrice(isCall = true, 100 - eps, 100, 1.0, 0.05, 0.0, 0.2)
    assert(math.abs((up - dn) / (2 * eps) - g.delta) < 1e-6)
  }
}
