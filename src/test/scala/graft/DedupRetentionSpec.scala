package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** q128 retention semantics against q82's independently-computed
  * clusters: one `keep` per cluster and it is the longest member
  * (ties → min doc_id), every `drop` points at its cluster's keeper,
  * `unique` exactly covers the docs outside every cluster, and the
  * verdict table covers the corpus bijectively. The driver's DuckDB
  * gate covers value parity; this spec pins the policy.
  */
class DedupRetentionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("retention verdicts are cluster-consistent and keep the longest member") {
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toMap
    val clusters = TextQueries.dedupClusters(spark, dir)
      .select($"component", $"doc_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (c, a) => c -> a.map(_._2).toSet }
    val out = TextQueries.dedupRetention(spark, dir)
      .select($"doc_id", $"component", $"kept_doc", $"n_chars", $"verdict")
      .as[(Long, Long, Long, Long, String)].collect()

    assert(out.map(_._1).toSeq.sorted == docs.keys.toSeq.sorted,
      "one verdict per corpus document")
    val clustered = clusters.values.flatten.toSet
    out.foreach { case (id, comp, kept, n, verdict) =>
      assert(n == docs(id), s"doc $id n_chars passthrough")
      if (clustered(id)) {
        val members = clusters(comp)
        assert(members(id), s"doc $id assigned to q82 component $comp")
        val expectKeep = members.toSeq
          .map(m => (docs(m), m)).sortBy(t => (-t._1, t._2)).head._2
        assert(kept == expectKeep, s"component $comp keeper")
        assert(verdict == (if (id == expectKeep) "keep" else "drop"),
          s"doc $id verdict")
      } else {
        assert(verdict == "unique" && comp == id && kept == id,
          s"singleton $id must self-keep")
      }
    }
    // fixture exercises all three verdicts
    val byVerdict = out.groupBy(_._5).view.mapValues(_.length).toMap
    assert(byVerdict.keySet == Set("unique", "keep", "drop"), byVerdict.toString)
  }
}
