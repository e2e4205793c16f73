package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Components

/** Probe-scale attestation of the star-escalation tier (a `main`,
  * like [[Bench]]): the alternating large-star/small-star algorithm
  * exists precisely for graphs nothing in the oracle corpus ever
  * produces — a long chain whose id placement defeats min-label
  * propagation — so this harness manufactures one at 10⁵–10⁶ edges,
  * forces the fast-path budget to trip, and records what the
  * escalation actually costs: star rounds, wall seconds, result
  * exactness, and the concurrent persistent-RDD high-water mark
  * (which exercises the eager checkpoint reclamation across tens of
  * real rounds — the loop would otherwise hold one materialized frame
  * per round).
  *
  * The adversarial placement: nodes of a PATH get ids alternating
  * between the low and high half (position p → p/2 when even, else
  * n-1-(p-1)/2), so every second position is a local minimum and
  * min-label propagation advances each component-min O(1) positions
  * per round past them — diameter-bound, unwinnable for any constant
  * fast budget. Star rounds are O(log² n) for ANY placement (Kiveris
  * et al., SoCC 2014), which is the claim this probe attests with a
  * measured round count.
  *
  * Prints ONE JSON line:
  * {"n":…,"edges":…,"escalated":…,"star_rounds":…,"wall_s":…,
  *  "distinct_comps":…,"comp_min":…,"labeled_nodes":…,
  *  "max_persistent_rdds":…}
  */
object StarProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // path over adversarially-placed ids (see object doc); edge count
    // = n-1. Pure column arithmetic — deterministic at any scale.
    // halving stays exact in double up to 2^52, far beyond any probe n
    def place(c: org.apache.spark.sql.Column) =
      floor(when(c % 2 === 0, c / 2)
        .otherwise(lit(n - 1) - (c - 1) / 2)).cast("long")
    val pos = spark.range(n - 1).select($"id".as("p"))
    val edges = pos.select(place($"p").as("i"), place($"p" + 1).as("j"))

    // storage high-water sampler: the eager reclamation claim is
    // "bounded concurrent materialized frames at ANY round count"
    @volatile var maxRdds = 0
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        maxRdds = math.max(maxRdds, spark.sparkContext.getPersistentRDDs.size)
        Thread.sleep(100)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val t0 = System.nanoTime()
    val labels = Components.minLabelComponents(edges, iters = iters)
    // exactness: the path connects every node, so ONE component whose
    // label is the global min id 0, covering all n nodes
    val agg = labels.agg(
      countDistinct($"comp").as("k"),
      min($"comp").as("m"),
      count(lit(1)).as("c")).collect()(0)
    val wallS = (System.nanoTime() - t0) / 1e9
    sampling = false

    val json =
      s"""{"n":$n,"edges":${n - 1},"escalated":${Components.lastEscalated},""" +
        s""""star_rounds":${Components.lastStarRounds},""" +
        s""""wall_s":${BenchCore.jnum(wallS, 1)},""" +
        s""""distinct_comps":${agg.getLong(0)},"comp_min":${agg.getLong(1)},""" +
        s""""labeled_nodes":${agg.getLong(2)},"max_persistent_rdds":$maxRdds}"""
    println(json)
    val out = java.nio.file.Paths.get("target", "star_probe.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, json.getBytes("UTF-8"))
    SessionDefaults.stopAndReap(spark)
  }
}
