package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{EnvCatalog, Store}

class StoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("insertIgnore appends only new keys") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val incoming = Seq((2L, "B"), (3L, "c")).toDF("k", "v")
    val out = Store.insertIgnore(existing, incoming, Seq("k"))
      .orderBy("k").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("batchUpdate rewrites only matching rows") {
    val t = Seq((1L, "open", 10.0), (2L, "done", 20.0)).toDF("k", "status", "x")
    val out = Store.batchUpdate(t, $"status" === "open",
        Map("x" -> ($"x" * 2), "status" -> lit("closed")))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((1L, "closed", 20.0), (2L, "done", 20.0)))
  }

  test("filteredDelete keeps the complement, null-safe") {
    val t = Seq((1L, Some("x")), (2L, None), (3L, Some("y"))).toDF("k", "v")
    val out = Store.filteredDelete(t, $"v" === "x").orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 3L)) // null cond row kept
  }

  test("presaveFilter lowercases, drops all-null rows, dups, dup columns") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("a")),
      (None, None), (Some(2L), None)
    ).toDF("K", "V")
    val out = Store.presaveFilter(df)
    assert(out.columns.toSeq == Seq("k", "v"))
    assert(out.count() == 2) // dup dropped, all-null dropped
  }

  test("EnvCatalog resolves prod/base/registry rules") {
    val reg = Seq(
      ("portfolio_dev1", "portfolio", "dev", null.asInstanceOf[String], "me", true),
      ("portfolio_old", "portfolio", "dev", null.asInstanceOf[String], "me", false),
      ("vol_stage", "vol_surface", "stage", null.asInstanceOf[String], "me", true)
    ).toDF("database_name", "base_name", "environment", "branch_name",
      "created_by", "is_active")
    val cat = new EnvCatalog(reg)
    assert(cat.resolve("master_config", "dev").contains("master_config"))
    assert(cat.resolve("portfolio", "prod").contains("portfolio"))
    assert(cat.resolve("portfolio", "dev").contains("portfolio_dev1")) // active only
    assert(cat.resolve("vol_surface", "dev").isEmpty)
    assert(cat.resolve("vol_surface", "stage").contains("vol_stage"))
  }

  test("diffEnvironments reports bases missing from target") {
    val reg = Seq(
      ("a_dev", "a", "dev", null.asInstanceOf[String], "me", true),
      ("b_dev", "b", "dev", null.asInstanceOf[String], "me", true),
      ("a_stage", "a", "stage", null.asInstanceOf[String], "me", true)
    ).toDF("database_name", "base_name", "environment", "branch_name",
      "created_by", "is_active")
    val missing = new EnvCatalog(reg).diffEnvironments("dev", "stage")
      .as[String].collect()
    assert(missing.toSeq == Seq("b"))
  }

  test("register + softDelete lifecycle") {
    val reg = Seq(("x_dev", "x", "dev", null.asInstanceOf[String], "me", true))
      .toDF("database_name", "base_name", "environment", "branch_name",
        "created_by", "is_active")
    val cat = new EnvCatalog(reg)
    val reg2 = cat.register("y_dev", "y", "dev", "me")
    assert(reg2.count() == 2)
    // re-register same name is ignored (INSERT IGNORE semantics)
    assert(new EnvCatalog(reg2).register("y_dev", "y", "dev", "me").count() == 2)
    val reg3 = new EnvCatalog(reg2).softDelete("y_dev")
    assert(new EnvCatalog(reg3).resolve("y", "dev").isEmpty)
  }

  test("writePartitionedBars lays out (key, date) directories and prunes") {
    import java.sql.Timestamp
    val bars = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (1L, Timestamp.valueOf("2024-01-02 10:00:00"), 2.0),
      (2L, Timestamp.valueOf("2024-01-01 11:00:00"), 3.0)
    ).toDF("root", "ts", "px")
    val dir = java.nio.file.Files.createTempDirectory("bars").toString
    Store.writePartitionedBars(bars, dir, "root", "ts")
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("root="))
    assert(dirs.toSet == Set("root=1", "root=2"))
    // partition pruning: only the matching directory is scanned
    val pruned = spark.read.parquet(dir)
      .filter($"root" === 1L && $"date" === "2024-01-01")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == 1)
    assert(scan.contains("PartitionFilters"), scan)
  }
}
