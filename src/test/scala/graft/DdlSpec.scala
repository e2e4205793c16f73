package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.sources.Store
import graft.sources.Store.ColumnSpec

/** C3 — dict-driven DDL parity (SQLHelpers.py:560-646): the type map,
  * its validation errors, and the Enum value-domain enforcement that
  * replaces MySQL's ENUM CHECK on a store without constraints.
  */
class DdlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val userSpecs = Seq(
    ColumnSpec("id", "Integer", primaryKey = true, nullable = false),
    ColumnSpec("name", "String", length = Some(100), nullable = false),
    ColumnSpec("signup_date", "Date"),
    ColumnSpec("status", "Enum", values = Some(Seq("active", "inactive"))),
    ColumnSpec("last_login_time", "Time"),
    ColumnSpec("created_at", "DateTime"),
    ColumnSpec("updated_at", "Timestamp"))

  test("buildSchema mirrors the reference type map and flags") {
    val s = Store.buildSchema(userSpecs)
    assert(s("id").dataType == IntegerType && !s("id").nullable)
    assert(s("id").metadata.getBoolean("primaryKey"))
    assert(s("name").dataType == StringType)
    assert(s("name").metadata.getLong("maxLength") == 100L)
    assert(s("signup_date").dataType == DateType && s("signup_date").nullable)
    assert(s("status").dataType == StringType)
    assert(s("status").metadata.getStringArray("enumValues").toSeq ==
      Seq("active", "inactive"))
    assert(s("last_login_time").dataType == StringType)
    assert(s("created_at").dataType == TimestampType)
    assert(s("updated_at").dataType == TimestampType)
  }

  test("buildSchema raises the reference's validation errors") {
    val noLen = intercept[IllegalArgumentException](
      Store.buildSchema(Seq(ColumnSpec("name", "String"))))
    assert(noLen.getMessage.contains("Length must be specified"))
    val noVals = intercept[IllegalArgumentException](
      Store.buildSchema(Seq(ColumnSpec("status", "Enum"))))
    assert(noVals.getMessage.contains("Values must be specified"))
    val unknown = intercept[IllegalArgumentException](
      Store.buildSchema(Seq(ColumnSpec("x", "Blob"))))
    assert(unknown.getMessage.contains("Unsupported column type"))
  }

  test("enum domain: violations reported per (column, value); NULL passes") {
    val schema = Store.buildSchema(Seq(
      ColumnSpec("id", "Integer"),
      ColumnSpec("status", "Enum", values = Some(Seq("active", "inactive")))))
    val df = Seq(
      (1, "active"), (2, "inactive"), (3, "purged"), (4, "purged"),
      (5, "ACTIVE"), (6, null.asInstanceOf[String])).toDF("id", "status")
    val bad = Store.enumViolations(df, schema)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(bad == Set(("status", "purged", 2L), ("status", "ACTIVE", 1L)))

    val e = intercept[IllegalArgumentException](
      Store.assertEnumDomains(df, schema))
    assert(e.getMessage.contains("purged") && e.getMessage.contains("x2"))
    // the clean slice passes, NULL included
    Store.assertEnumDomains(df.filter($"id" =!= 3 && $"id" =!= 4 && $"id" =!= 5), schema)
    // a schema with no enum columns never flags anything
    assert(Store.enumViolations(df,
      Store.buildSchema(Seq(ColumnSpec("id", "Integer")))).isEmpty)
  }
}
