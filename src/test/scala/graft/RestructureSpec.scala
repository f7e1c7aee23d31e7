package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Restructure

class RestructureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val officeType = ArrayType(StructType(Seq(
    StructField("code", StringType), StructField("title", StringType))))

  private def officesDf = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("offices", officeType)))
    val rows = Seq(
      Row(1L, Seq(Row("SFO", "Office A"), Row("OAK", ""))),
      Row(2L, Seq()),
      Row(3L, null),
      Row(4L, Seq(Row(null, "T"))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
  }

  test("X1 serialize: k:v pairs in field order, ''/null → None, '|' join") {
    val got = Restructure.serializeStructArray(officesDf, "offices")
      .orderBy("id").select("offices").as[String].collect()
    assert(got(0) == "code:SFO,title:Office A|code:OAK,title:None")
    assert(got(1) == "")            // empty array → empty string
    assert(got(2) == "")            // null array → concat_ws over null
    assert(got(3) == "code:None,title:T")
  }

  test("X2 explode_outer: empty/null arrays keep the parent row with null children") {
    val got = Restructure.explodeStructArray(officesDf, "offices")
    assert(got.columns.toSeq == Seq("id", "code", "title"))
    val byId = got.collect().groupBy(_.getLong(0))
    assert(byId(1L).length == 2)
    assert(byId(2L).length == 1 && byId(2L).head.isNullAt(1))
    assert(byId(3L).length == 1 && byId(3L).head.isNullAt(1))
    // row-count invariant: Σ max(1, arrayLen)
    assert(got.count() == 2 + 1 + 1 + 1)
  }

  test("X3 prefix rename: x → realPropertyX (first letter uppercased)") {
    val got = Restructure.explodeStructArray(officesDf, "offices",
      Some("realProperty"))
    assert(got.columns.toSeq ==
      Seq("id", "realPropertyCode", "realPropertyTitle"))
  }

  test("P1 flattenStruct: nested structs become dotted columns; arrays kept") {
    val df = spark.read.json(Seq(
      """{"a": {"b": {"c": 1}, "d": "x"}, "top": 2, "arr": [1,2]}""").toDS())
    val got = Restructure.flattenStruct(df)
    assert(got.columns.sorted.toSeq == Seq("a.b.c", "a.d", "arr", "top"))
    val row = got.select(col("`a.b.c`"), col("`a.d`")).collect().head
    assert(row.getLong(0) == 1L && row.getString(1) == "x")
  }

  test("F7 sink rename: dots stripped, camelCase → snake_case") {
    assert(Restructure.toSinkName("loan.address") == "loanaddress")
    assert(Restructure.toSinkName("filerName") == "filer_name")
    assert(Restructure.toSinkName("scheduleA1Count") == "schedule_a1_count")
    assert(Restructure.toSinkName("already_snake") == "already_snake")
  }
}
