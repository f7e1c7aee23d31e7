package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registry query executes on sf0.001 and yields rows;
  * every oracle key refers to a real query. The full value-level check
  * runs through Verify + the DuckDB oracle (driver t2 / tools/).
  */
class RegistrySpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("every oracle key has a matching query") {
    val missing = Registry.oracles.keySet -- Registry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  Registry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001 and returns rows") {
      assert(fn(TestSpark.spark, sf).count() > 0)
    }
  }
}
