package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins

class JoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("J1: left-outer keeps unmatched fact rows; dim columns null there") {
    val fact = Seq(("F1", 10), ("F2", 20), ("F3", 30)).toDF("filingId", "v")
    val dim = Seq(("F1", "Jane"), ("F2", "Ada")).toDF("filingId", "filerName")
    val got = Joins.filerToSchedule(fact, dim, "filingId",
      Seq("filingId", "filerName")).orderBy("filingId").collect()
    assert(got.length == 3)
    assert(got(2).getString(0) == "F3" && got(2).isNullAt(2))
  }

  test("J1 plans as a broadcast hash join (no shuffle of the fact side)") {
    val fact = TestSpark.spark.range(1000).toDF("filingId")
    val dim = TestSpark.spark.range(10).toDF("filingId")
    val plan = Joins.filerToSchedule(fact, dim, "filingId", Seq("filingId"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan was:\n$plan")
  }
}
