package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  test("GraftExtensions injects both native functions") {
    // A fresh-session integration isn't possible here (the suite JVM
    // already holds an active session and getOrCreate ignores
    // withExtensions); the SQL execution path for both functions is
    // covered in NativeExpressionsSpec via FunctionRegistry. This
    // asserts the extensions hook itself applies cleanly.
    val ext = new SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    // second application is idempotent from the engine's side
    new graft.plans.GraftExtensions().apply(ext)
  }
}
