package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CoreOps._

/** Property tests for the resample/dedup invariants (SURVEY §5 test
  * plan): OHLC ordering, bucket containment, volume conservation
  * under re-bucketing, dedup idempotence.
  */
class ResamplePropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Drive a generator over 5 deterministic seeds (ScalaCheck without
    * the scalatest bridge, which isn't in the offline dep set).
    */
  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    (1 to 5).foreach { i =>
      val v = g.pureApply(Gen.Parameters.default.withSize(60), Seed(i.toLong))
      body(v)
    }

  private val base = Timestamp.valueOf("2024-03-04 00:00:00").getTime

  private val tickGen = for {
    key <- Gen.oneOf("A", "B")
    offMin <- Gen.choose(0L, 3 * 24 * 60L)
    value <- Gen.choose(-1000, 100000).map(_ / 100.0)
  } yield (key, new Timestamp(base + offMin * 60000), value)

  private val ticksGen = Gen.nonEmptyListOf(tickGen)

  test("OHLC ordering: low <= open, close <= high in every bucket") {
    forAll(ticksGen) { ticks =>
      val df = ticks.zipWithIndex
        .map { case ((k, t, v), i) => (k, t, v, i.toLong) }
        .toDF("key", "ts", "value", "seq")
      val r = resampleOhlc(df, "ts", "1 hour", Seq("key"),
        Seq(("value", "value", AggFirst)), "seq")
        .withColumnRenamed("value", "open")
      val checks = resampleOhlc(df, "ts", "1 hour", Seq("key"),
        Seq(("value", "value", AggLast)), "seq").withColumnRenamed("value", "close")
        .join(r, Seq("bucket", "key"))
        .join(df.groupBy(window($"ts", "1 hour")("start").as("bucket"), $"key")
          .agg(max($"value").as("high"), min($"value").as("low")),
          Seq("bucket", "key"))
      val bad = checks.filter(
        $"low" > $"open" || $"low" > $"close" ||
          $"high" < $"open" || $"high" < $"close").count()
      assert(bad == 0)
    }
  }

  test("bucket containment + count conservation") {
    forAll(ticksGen) { ticks =>
      val df = ticks.zipWithIndex
        .map { case ((k, t, v), i) => (k, t, v, i.toLong) }
        .toDF("key", "ts", "value", "seq")
      val buckets = df.groupBy(window($"ts", "30 minutes")("start").as("bucket"), $"key")
        .agg(count(lit(1)).as("n"))
      // counts conserve
      assert(buckets.agg(sum($"n")).head().getLong(0) == ticks.length)
      // every bucket start is 30-minute aligned
      val misaligned = buckets
        .filter((unix_timestamp($"bucket") % 1800) =!= 0).count()
      assert(misaligned == 0)
    }
  }

  test("volume conservation under re-bucketing (1h of 15m == direct 1h)") {
    forAll(ticksGen) { ticks =>
      val df = ticks.zipWithIndex
        .map { case ((k, t, v), i) => (k, t, v, i.toLong) }
        .toDF("key", "ts", "value", "seq")
      val fine = df.groupBy(window($"ts", "15 minutes")("start").as("b15"), $"key")
        .agg(sum($"value".cast("decimal(30,4)")).as("v"))
      val re = fine.groupBy(window($"b15", "1 hour")("start").as("bucket"), $"key")
        .agg(sum($"v").cast("double").as("volume"))
      val direct = df.groupBy(window($"ts", "1 hour")("start").as("bucket"), $"key")
        .agg(sum($"value".cast("decimal(30,4)")).cast("double").as("volume"))
      assert(re.join(direct, Seq("bucket", "key"))
        .filter(re("volume") =!= direct("volume")).count() == 0)
      assert(re.count() == direct.count())
    }
  }

  test("dedupKeepLast is idempotent and keeps one row per key") {
    forAll(ticksGen) { ticks =>
      val df = ticks.zipWithIndex
        .map { case ((k, t, v), i) => (k, t, v, i.toLong) }
        .toDF("key", "ts", "value", "seq")
      val once = dedupKeepLast(df, Seq("key", "ts"), Seq("seq"))
      val twice = dedupKeepLast(once, Seq("key", "ts"), Seq("seq"))
      assert(once.count() ==
        df.select($"key", $"ts").distinct().count())
      assert(once.collect().toSet == twice.collect().toSet)
    }
  }

  test("chunked gap grid: multi-year sparse key, any chunk size, same result") {
    // two observations ~30 years apart: the daily grid spans ~11k
    // buckets; chunk sizes straddling divisor/non-divisor/edge cases
    // must all produce the identical complete grid with correct ffill
    val rows = Seq(
      ("K", Timestamp.valueOf("1994-01-03 10:00:00"), 5.0, 0L),
      ("K", Timestamp.valueOf("2024-02-29 15:30:00"), 7.0, 1L),
      ("L", Timestamp.valueOf("2024-02-28 09:00:00"), 9.0, 2L)
    ).toDF("key", "ts", "value", "seq")
    def run(chunk: Int) = resampleWithGaps(rows, "ts", "1 day", Seq("key"),
      Seq(("close", "value", AggLast), ("volume", "value", AggSum)), "seq",
      ffillCols = Seq("close"), zeroCols = Seq("volume"), gridChunk = chunk)
      .orderBy($"key", $"bucket")
      .collect().toSeq
    val expectedDays =
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse("1994-01-03"),
        java.time.LocalDate.parse("2024-02-29")) + 1
    val reference = run(1 << 30) // single chunk = unchunked grid
    assert(reference.count(_.getString(0) == "K") == expectedDays)
    assert(reference.count(_.getString(0) == "L") == 1)
    // every gap bucket carries the forward-filled close, zero volume
    val kGaps = reference.filter(r => r.getString(0) == "K" && r.getDouble(3) == 0.0)
    assert(kGaps.size == expectedDays - 2)
    assert(kGaps.forall(_.getDouble(2) == 5.0))
    for (chunk <- Seq(1, 16, 4096, 11011, 11012))
      assert(run(chunk) == reference, s"gridChunk=$chunk diverged")
  }
}
