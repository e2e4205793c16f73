package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.dsv2.{DayTransport, FixtureTransport, ThetaStatus, TransportRegistry}

/** R5/R6 — the reference's HTTP exception taxonomy
  * (ThetaExceptions.py:5–139) and exponential-backoff retry policy
  * (v2.py:528–533 `backoff.expo, max_tries=5` on the transient
  * triple), re-expressed in the scan path. Covers: the full
  * status→class mapping, the retryable subset, the deterministic
  * backoff schedule, fail-fast on permanent errors, and the DSv2
  * end-to-end behavior with an injected flaky transport.
  */
object ThetaTransportSpec {
  /** JVM-global fetch counter for the flaky-transport test — static so
    * the per-task deserialized transport copies all hit ONE map.
    */
  val perDay = new java.util.concurrent.ConcurrentHashMap[Int, AtomicInteger]()
}

class ThetaTransportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import ThetaStatus._

  test("every status code maps to its reference exception class") {
    val cases: Seq[(Int, Class[_])] = Seq(
      404 -> classOf[ThetaNoImplementation],
      429 -> classOf[ThetaDataOSLimit],
      470 -> classOf[ThetaDataGeneral],
      471 -> classOf[ThetaDataPermission],
      472 -> classOf[ThetaDataNotFound],
      473 -> classOf[ThetaDataInvalidParameter],
      474 -> classOf[ThetaDataDisconnected],
      475 -> classOf[ThetaDataParseError],
      476 -> classOf[ThetaDataWrongIP],
      477 -> classOf[ThetaDataNoPageFound],
      570 -> classOf[ThetaDataLargeData],
      571 -> classOf[ThetaDataServerRestart],
      572 -> classOf[ThetaDataUncaughtException],
      418 -> classOf[ThetaDataUnknownError],
      503 -> classOf[ThetaDataUnknownError])
    cases.foreach { case (code, cls) =>
      val e = intercept[RuntimeException](raiseForStatus(code, "ctx"))
      assert(e.getClass == cls, s"status $code mapped to ${e.getClass}")
      assert(isThetaError(e), s"status $code not recognized as taxonomy member")
      assert(e.getMessage.contains("ctx"), "context must ride in the message")
    }
    raiseForStatus(200, "ok") // must not throw
  }

  test("only the reference's transient triple is retryable") {
    def errOf(code: Int): Throwable =
      intercept[RuntimeException](raiseForStatus(code, "x"))
    assert(Seq(429, 474, 571).map(errOf).forall(isRetryable))
    assert(!Seq(404, 470, 471, 472, 473, 475, 476, 477, 570, 572, 418)
      .map(errOf).exists(isRetryable))
    assert(!isRetryable(new RuntimeException("not ours")))
  }

  test("backoff schedule is expo off the base; success stops the clock") {
    val sleeps = collection.mutable.ListBuffer[Long]()
    val calls = new AtomicInteger(0)
    // fails 3 times transiently, then succeeds: 4 calls, 3 sleeps
    val out = retryWithBackoff(maxTries = 5, baseDelayMs = 100, sleep = sleeps += _) {
      if (calls.incrementAndGet() <= 3) raiseForStatus(429, "flaky")
      "ok"
    }
    assert(out == "ok" && calls.get() == 4)
    assert(sleeps.toList == List(100L, 200L, 400L), "expo schedule")

    // no failure: exactly one call, zero sleeps
    sleeps.clear()
    assert(retryWithBackoff(maxTries = 5, sleep = sleeps += _)("fine") == "fine")
    assert(sleeps.isEmpty)
  }

  test("a retryable error past maxTries propagates; non-retryable fails fast") {
    val calls = new AtomicInteger(0)
    intercept[ThetaDataOSLimit] {
      retryWithBackoff(maxTries = 3, sleep = _ => ()) {
        calls.incrementAndGet(); raiseForStatus(429, "always")
      }
    }
    assert(calls.get() == 3, "exactly maxTries attempts")

    calls.set(0)
    intercept[ThetaDataPermission] {
      retryWithBackoff(maxTries = 5, sleep = _ => ()) {
        calls.incrementAndGet(); raiseForStatus(471, "denied")
      }
    }
    assert(calls.get() == 1, "permanent errors must not retry")
  }

  test("DSv2 scan retries a transient transport and returns complete data") {
    // Per-day call counter, JVM-GLOBAL (companion object): the scan
    // ships the resolved transport INSTANCE into each task, so a
    // counter captured in the instance would be a per-task serialized
    // copy and the driver-side assertions below would pass vacuously
    // over an empty map. Tasks share this JVM on the local master, so
    // the static map sees every fetch. (Under a forked-executor
    // master the counts would be per-executor — this spec pins the
    // retry contract, which is master-independent, on local.)
    // NOTE: the counter (and TransportRegistry itself) is JVM-global
    // mutable state. Safe because ScalaTest runs tests WITHIN a suite
    // sequentially (no ParallelTestExecution here) and every suite
    // registers under its own unique transport name; a second suite
    // clearing THIS counter concurrently would break the asserts —
    // keep `perDay` private to this spec.
    val nDays = 3 // drives BOTH the scan option and the count asserts below
    val perDay = ThetaTransportSpec.perDay
    perDay.clear()
    TransportRegistry.register("spec-flaky", new DayTransport {
      override def fetch(root: String, dayNum: Int): (Int, String) = {
        val n = ThetaTransportSpec.perDay
          .computeIfAbsent(dayNum, _ => new AtomicInteger(0))
          .incrementAndGet()
        if (n == 1) (429, "") else if (n == 2) (571, "")
        else FixtureTransport.fetch(root, dayNum)
      }
    })
    try {
      def read(t: Option[String]) = {
        val r = spark.read.format("graft.sources.dsv2.ThetaCsvSource")
          .option("root", "AAPL").option("days", nDays.toString)
          .option("start", "2024-01-02")
        // client-side sort: an orderBy would add a RangePartitioner
        // SAMPLE pass over the scan, fetching every day twice
        t.fold(r)(n => r.option("transport", n)).load()
          .collect().map(_.toString).toSeq.sorted
      }
      assert(read(Some("spec-flaky")) == read(None),
        "flaky-then-ok transport must yield the clean fixture rows")
      // vacuity guard first: an empty map means the counter stopped
      // being shared with the tasks and the count assert proves nothing
      assert(perDay.size() == nDays,
        s"expected $nDays counted days, got ${perDay.size()}")
      assert(perDay.values().stream().allMatch(_.get() == 3),
        "each day must have been fetched exactly 3 times")
    } finally TransportRegistry.remove("spec-flaky")
  }

  test("DSv2 scan fails fast with the typed error on a permanent status") {
    TransportRegistry.register("spec-notfound", new DayTransport {
      override def fetch(root: String, dayNum: Int): (Int, String) = (472, "")
    })
    try {
      val e = intercept[org.apache.spark.SparkException] {
        spark.read.format("graft.sources.dsv2.ThetaCsvSource")
          .option("root", "AAPL").option("days", "1").option("start", "2024-01-02")
          .option("transport", "spec-notfound").load().count()
      }
      // the typed class and the split's identity must surface in the
      // task failure chain so an operator can tell rerunnable from not
      val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => t.getClass.getSimpleName + ": " + t.getMessage).mkString(" | ")
      assert(chain.contains("ThetaDataNotFound") && chain.contains("root=AAPL"),
        s"typed error lost in: $chain")
    } finally TransportRegistry.remove("spec-notfound")
  }
}
