package graft.sources.dsv2

import java.util.concurrent.ConcurrentHashMap

/** The reference's HTTP error taxonomy and retry policy (R5/R6),
  * re-expressed for the Spark scan path — the one reference behavior
  * class that previously had no engine analog.
  *
  * Semantics from the reference (cited for behavior, not code):
  *  - ThetaExceptions.py:5–139 `raise_thetadata_exception`: maps the
  *    endpoint's status codes to 15 typed exceptions (404 not
  *    implemented, 429 OS limit, 470–477 client/session classes,
  *    570–572 server classes, 200 ok, anything else unknown).
  *  - v2.py:528–533 (and 7 sibling decorators): `backoff.expo` with
  *    `max_tries=5` retries exactly the transient subset
  *    {OSLimit(429), Disconnected(474), ServerRestart(571)}; every
  *    other class fails fast.
  *
  * Engine placement: the retry loop runs INSIDE the partition reader
  * ([[DayCsvReader]]), per fetch — a transient endpoint hiccup costs
  * one split a few capped sleeps, not a Spark task failure. A
  * non-retryable error (or a retryable one past `maxTries`) raises
  * the typed exception, which fails the task and surfaces to the
  * driver with the split's (root, day) in the message — at cluster
  * scale Spark's own task retry (`spark.task.maxFailures`) is then
  * the outer, coarser loop, and the typed class tells an operator
  * whether re-running can ever help (`ThetaDataPermission` no,
  * `ThetaDataOSLimit` yes). Backoff sleeps are capped (expo 2^k off
  * a small base) so a stuck endpoint degrades a task by seconds, not
  * unboundedly.
  */
object ThetaStatus {

  sealed abstract class ThetaError(msg: String) extends RuntimeException(msg)
  final class ThetaNoImplementation(m: String) extends ThetaError(m)
  final class ThetaDataOSLimit(m: String) extends ThetaError(m)
  final class ThetaDataGeneral(m: String) extends ThetaError(m)
  final class ThetaDataPermission(m: String) extends ThetaError(m)
  final class ThetaDataNotFound(m: String) extends ThetaError(m)
  final class ThetaDataInvalidParameter(m: String) extends ThetaError(m)
  final class ThetaDataDisconnected(m: String) extends ThetaError(m)
  final class ThetaDataParseError(m: String) extends ThetaError(m)
  final class ThetaDataWrongIP(m: String) extends ThetaError(m)
  final class ThetaDataNoPageFound(m: String) extends ThetaError(m)
  final class ThetaDataLargeData(m: String) extends ThetaError(m)
  final class ThetaDataServerRestart(m: String) extends ThetaError(m)
  final class ThetaDataUncaughtException(m: String) extends ThetaError(m)
  final class ThetaDataUnknownError(m: String) extends ThetaError(m)

  /** Status → typed error; 200 returns normally (the reference's
    * `raise_thetadata_exception` contract, same codes).
    */
  def raiseForStatus(code: Int, context: String): Unit = code match {
    case 200 => ()
    case 404 => throw new ThetaNoImplementation(s"feature not implemented: $context")
    case 429 => throw new ThetaDataOSLimit(s"OS limit reached, retry: $context")
    case 470 => throw new ThetaDataGeneral(s"general error: $context")
    case 471 => throw new ThetaDataPermission(s"permission denied: $context")
    case 472 => throw new ThetaDataNotFound(s"data not found: $context")
    case 473 => throw new ThetaDataInvalidParameter(s"invalid parameter: $context")
    case 474 => throw new ThetaDataDisconnected(s"disconnected: $context")
    case 475 => throw new ThetaDataParseError(s"parse error: $context")
    case 476 => throw new ThetaDataWrongIP(s"wrong IP: $context")
    case 477 => throw new ThetaDataNoPageFound(s"no page found: $context")
    case 570 => throw new ThetaDataLargeData(s"data too large: $context")
    case 571 => throw new ThetaDataServerRestart(s"server restarting, retry: $context")
    case 572 => throw new ThetaDataUncaughtException(s"uncaught endpoint exception: $context")
    case c   => throw new ThetaDataUnknownError(s"unknown status $c: $context")
  }

  /** The reference's transient subset — the ONLY classes its backoff
    * decorators retry (v2.py:530).
    */
  def isRetryable(e: Throwable): Boolean = e match {
    case _: ThetaDataOSLimit | _: ThetaDataDisconnected |
         _: ThetaDataServerRestart => true
    case _ => false
  }

  /** Any member of the taxonomy (the reference's
    * `is_thetadata_exception`).
    */
  def isThetaError(e: Throwable): Boolean = e.isInstanceOf[ThetaError]

  /** `backoff.expo`-style retry: up to `maxTries` attempts, sleeping
    * base·2^k between attempt k and k+1, ONLY for [[isRetryable]]
    * errors — everything else (and a retryable error on the last
    * attempt) propagates. `sleep` is injectable so the schedule is
    * unit-testable without wall-clock time; the default sleeps.
    */
  def retryWithBackoff[T](maxTries: Int = 5, baseDelayMs: Long = 100,
      sleep: Long => Unit = Thread.sleep)(op: => T): T = {
    require(maxTries >= 1, s"maxTries must be >= 1, got $maxTries")
    var attempt = 0
    while (true) {
      try return op
      catch {
        case e: Throwable if isRetryable(e) && attempt < maxTries - 1 =>
          sleep(baseDelayMs << attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Pluggable per-day transport for [[DayCsvReader]]: returns
  * (statusCode, csvBody). The default [[FixtureTransport]] always
  * answers 200 with the deterministic dry-run CSV
  * (utils.py:617–638); a live deployment swaps in an HTTP GET; tests
  * inject failure scripts via [[TransportRegistry]].
  */
trait DayTransport extends Serializable {
  def fetch(root: String, dayNum: Int): (Int, String)
}

object FixtureTransport extends DayTransport {
  /** Deterministic canned CSV (mock_responses.py shape): hourly bars
    * from 09:30, header + rows.
    */
  def csv(root: String, dayNum: Int): String = {
    val rows = (0 until ThetaCsvSource.barsPerDay).map { h =>
      val minOfDay = 570 + h * 30
      val base = 100.0 + (dayNum % 50) + h * 0.25
      f"$minOfDay%d,${base}%.2f,${base + 0.8}%.2f,${base - 0.6}%.2f,${base + 0.3}%.2f,${(dayNum % 1000) * 10 + h}%d"
    }
    "ms_of_day,open,high,low,close,volume\n" + rows.mkString("\n")
  }
  override def fetch(root: String, dayNum: Int): (Int, String) = (200, csv(root, dayNum))
}

/** Named transports for tests. The scan option `transport=<name>`
  * selects one; unset means fixture. Resolution happens ONCE, on the
  * driver, at partition-planning time — the resolved Serializable
  * instance ships inside each [[DayPartition]], so injected
  * transports work under forked-executor masters (local-cluster, a
  * real cluster) whose executor JVMs never saw `register`.
  */
object TransportRegistry {
  private val byName = new ConcurrentHashMap[String, DayTransport]()
  def register(name: String, t: DayTransport): Unit = byName.put(name, t)
  def remove(name: String): Unit = byName.remove(name)
  def resolve(name: Option[String]): DayTransport =
    name.map { n =>
      val t = byName.get(n)
      require(t != null, s"unknown transport '$n' — register it first")
      t
    }.getOrElse(FixtureTransport)
}
