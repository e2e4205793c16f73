package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MisraGries.misraGries

/** The Misra–Gries frequent-items sketch: the frequency guarantee
  * (every item with count > n/(m+1) survives), count lower bounds,
  * and partitioning invariance of the propose-then-recount
  * composition q91 uses. Data is seeded and the vocabulary is far
  * larger than the sketch (decrements and merge subtractions actually
  * fire), unlike the near-uniform 31-token documents corpus.
  */
class FrequentItemsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val m = 16

  // ~6000 background tokens over a 500-word vocabulary + 3 planted
  // heavy hitters well above the n/(m+1) threshold.
  private val tokens: Seq[String] = {
    val rnd = new scala.util.Random(7)
    val bg = Seq.fill(6000)(s"w${rnd.nextInt(500)}")
    val planted = Seq.fill(900)("alpha") ++ Seq.fill(700)("beta") ++
      Seq.fill(550)("gamma")
    rnd.shuffle(bg ++ planted)
  }

  private def sketch(partitions: Int): Map[String, Long] =
    tokens.toDF("tok").repartition(partitions)
      .agg(misraGries($"tok", m).as("c"))
      .select(explode($"c").as("p"))
      .select($"p.item".as("item"), $"p.cnt".as("cnt"))
      .as[(String, Long)].collect().toMap

  private val exact: Map[String, Long] =
    tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
  private val n = tokens.size.toLong

  test("every item above n/(m+1) survives the sketch (any partitioning)") {
    val mustSurvive = exact.filter { case (_, c) => c * (m + 1) > n }.keySet
    assert(mustSurvive == Set("alpha", "beta", "gamma")) // data sanity
    for (parts <- Seq(1, 4, 13)) {
      val got = sketch(parts).keySet
      assert(mustSurvive.subsetOf(got),
        s"parts=$parts lost ${mustSurvive -- got}")
      assert(got.size <= m, s"parts=$parts kept ${got.size} > m")
    }
  }

  test("sketch counts are lower bounds on true frequency") {
    sketch(7).foreach { case (item, cnt) =>
      assert(cnt <= exact(item), s"$item sketch count $cnt > true ${exact(item)}")
      assert(cnt > 0)
    }
  }

  test("grouped aggregation: per-group sketches are independent") {
    // Per-language vocabularies: each group gets its own m-counter
    // buffer, so one group's flood cannot evict another's heavy hitter.
    val rnd3 = new scala.util.Random(3)
    val rows = Seq.fill(3000)(("en", s"e${rnd3.nextInt(300)}")) ++
      Seq.fill(400)(("en", "hot_en")) ++
      Seq.fill(40)(("fr", "hot_fr")) ++ Seq.tabulate(30)(i => ("fr", s"f$i"))
    val got = rows.toDF("lang", "tok").repartition(6)
      .groupBy($"lang").agg(misraGries($"tok", m).as("c"))
      .select($"lang", explode($"c").as("p"))
      .select($"lang", $"p.item".as("item"))
      .as[(String, String)].collect().toSet
    assert(got.contains(("en", "hot_en")), "en heavy hitter lost")
    assert(got.contains(("fr", "hot_fr")), "fr heavy hitter lost")
    assert(got.count(_._1 == "fr") <= m && got.count(_._1 == "en") <= m)
  }

  test("binary items count by value, not reference (heavy hitter survives)") {
    // Array[Byte] map keys would compare by reference and never merge
    // counters — the ByteKey wrapper must make each distinct byte
    // sequence ONE counter across rows and across partition merges.
    for (parts <- Seq(1, 5)) {
      val got = tokens.toDF("tok").repartition(parts)
        .agg(misraGries(encode($"tok", "UTF-8"), m).as("c"))
        .select(explode($"c").as("p"))
        .select(decode($"p.item", "UTF-8").as("item"), $"p.cnt".as("cnt"))
        .as[(String, Long)].collect().toMap
      assert(Set("alpha", "beta", "gamma").subsetOf(got.keySet),
        s"parts=$parts lost a binary heavy hitter: ${got.keySet}")
      assert(got.size <= m)
      got.foreach { case (item, cnt) => assert(cnt <= exact(item)) }
    }
  }

  test("nested item types are rejected up front") {
    val e = intercept[Exception] {
      tokens.toDF("tok")
        .agg(misraGries(struct($"tok"), m).as("c")).collect()
    }
    assert(e.getMessage.contains("atomic item types"), e.getMessage)
  }

  test("propose-then-recount equals the exact heavy-hitter set") {
    val expected = exact.collect {
      case (t, c) if c * (m + 1) > n => (t, c)
    }.toSet
    for (parts <- Seq(3, 11)) {
      val toks = tokens.toDF("tok").repartition(parts)
      val cand = toks.agg(misraGries($"tok", m).as("c"))
        .select(explode($"c").as("p")).select($"p.item".as("tok"))
      val got = toks.join(broadcast(cand), Seq("tok"), "left_semi")
        .groupBy($"tok").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" * (m + 1) > n)
        .as[(String, Long)].collect().toSet
      assert(got == expected, s"parts=$parts")
    }
  }
}
