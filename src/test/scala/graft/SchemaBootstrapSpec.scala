package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SchemaBootstrap

class SchemaBootstrapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("titleize: camelCase, snake_case, dotted") {
    assert(SchemaBootstrap.titleize("filerName") == "Filer Name")
    assert(SchemaBootstrap.titleize("schedule_a1_count") == "Schedule A1 Count")
    assert(SchemaBootstrap.titleize("loan.highestBalance") ==
      "Loan Highest Balance")
    assert(SchemaBootstrap.titleize("id") == "Id")
  }

  test("makeColumns leaves types blank; write-if-absent honors existing") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("filingId", "filerName")
    assert(SchemaBootstrap.makeColumns(df) ==
      Seq(("", "filingId", "Filing Id"), ("", "filerName", "Filer Name")))
    val p = java.nio.file.Files.createTempDirectory("graft_schema")
      .resolve("t_schema.csv")
    assert(SchemaBootstrap.writeSchemaCsvIfAbsent(df, p))
    val first = java.nio.file.Files.readString(p)
    assert(first.startsWith("dataTypeName,fieldName,name\n,filingId,Filing Id"))
    // a second call must NOT overwrite (hand-edits are the contract)
    assert(!SchemaBootstrap.writeSchemaCsvIfAbsent(
      Seq((1L, "y")).toDF("other", "cols"), p))
    assert(java.nio.file.Files.readString(p) == first)
  }
}
