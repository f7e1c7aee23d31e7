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

  test("asofJoin: latest right row at-or-before each left time, per key") {
    val left = Seq(("u1", 10L, "a"), ("u1", 25L, "b"), ("u1", 30L, "c"),
        ("u2", 20L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq(("u1", 10L, 100L), ("u1", 20L, 200L), ("u2", 99L, 900L))
      .toDF("k", "t", "v")
    val got = Joins.asofJoin(left, right, "k", "t", Seq("v"))
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(got.toSeq == Seq(
      ("u1", 10L, "a", 100L),   // equal time matches (inclusive boundary)
      ("u1", 25L, "b", 200L),   // latest at-or-before 25 is t=20
      ("u1", 30L, "c", 200L),   // carried forward past the last right row
      ("u2", 20L, "d", -1L)))   // u2's only right row is in the future
  }

  test("asofJoin: multiple value columns carried together; left cols kept") {
    val left = Seq((1L, 5L, "keep")).toDF("k", "t", "note")
    val right = Seq((1L, 3L, 7L, "x"), (1L, 4L, 8L, "y"))
      .toDF("k", "t", "a", "b")
    val got = Joins.asofJoin(left, right, "k", "t", Seq("a", "b")).collect()
    assert(got.length == 1)
    val r = got(0)
    val byName = r.schema.fieldNames.zipWithIndex.toMap
    assert(r.getString(byName("note")) == "keep")
    assert(r.getLong(byName("a")) == 8L && r.getString(byName("b")) == "y")
  }

  test("asofJoin rejects value columns that collide with left columns") {
    val df = Seq((1L, 1L)).toDF("k", "t")
    intercept[IllegalArgumentException] {
      Joins.asofJoin(df, df.withColumn("k2", $"k"), "k", "t", Seq("k"))
    }
  }

  test("rangeJoin: inclusive containment; multi-bucket interval matches once") {
    // bucket width 10: interval [5, 27] covers buckets 0..2
    val intervals = Seq(("A", 5L, 27L), ("B", 28L, 30L)).toDF("iv", "s", "e")
    val points = Seq((1L, 4L), (2L, 5L), (3L, 15L), (4L, 27L), (5L, 28L))
      .toDF("pid", "t")
    val got = Joins.rangeJoin(points, "t", intervals, "s", "e", 10L)
      .select("pid", "iv").orderBy("pid", "iv").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(
      (2L, "A"),    // start boundary inclusive
      (3L, "A"),    // interior, middle bucket — exactly once despite 3 buckets
      (4L, "A"),    // end boundary inclusive
      (5L, "B")))   // second interval; pid=1 (t=4) matches nothing
  }

  test("rangeJoin drops empty intervals and rejects column collisions") {
    val bad = Seq(("X", 9L, 3L)).toDF("iv", "s", "e")
    val pts = Seq((1L, 5L)).toDF("pid", "t")
    assert(Joins.rangeJoin(pts, "t", bad, "s", "e", 10L).count() == 0)
    intercept[IllegalArgumentException] {
      Joins.rangeJoin(pts, "t", bad.withColumnRenamed("iv", "pid"),
        "s", "e", 10L)
    }
  }

  test("rangeJoin plans a hash join on the bucket, never a nested loop") {
    val intervals = spark.range(1000)
      .selectExpr("id AS iv", "id * 100 AS s", "id * 100 + 250 AS e")
    val points = spark.range(5000).selectExpr("id AS pid", "id * 20 AS t")
    val plan = Joins.rangeJoin(points, "t", intervals, "s", "e", 100L)
      .queryExecution.executedPlan.toString
    val finalPlan = plan.split("\\+- == Initial Plan ==")(0)
    assert(!finalPlan.contains("NestedLoop") && !finalPlan.contains("Cartesian"),
      s"range join must not plan as a nested loop:\n$finalPlan")
    assert(finalPlan.contains("Join") || finalPlan.contains("join"),
      s"expected a join in:\n$finalPlan")
  }

  test("asofJoin plans ONE shuffle on the key (union-and-carry, no theta join)") {
    val left = spark.range(100).selectExpr("id % 10 AS k", "id AS t")
    val right = spark.range(50)
      .selectExpr("id % 10 AS k", "id AS t", "id * 2 AS v")
    val plan = Joins.asofJoin(left, right, "k", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    val finalPlan = plan.split("\\+- == Initial Plan ==")(0)
    assert(!finalPlan.contains("NestedLoop") && !finalPlan.contains("Cartesian"),
      s"as-of must not plan as a theta/cross join:\n$finalPlan")
    val shuffles = "Exchange hashpartitioning".r
      .findAllIn(finalPlan).length
    assert(shuffles <= 1, s"expected at most one key shuffle, got $shuffles:\n$finalPlan")
  }
}
