package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class TopKPushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The canonical pattern: rank per key, keep rank <= k. */
  private def topK(k: Int) = {
    val w = Window.partitionBy("key").orderBy(col("v").desc, col("id"))
    spark.range(1000)
      .selectExpr("id", "id % 7 AS key", "(id * 37) % 100 AS v")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  test("filter(row_number <= k) plans as TopKPerKeyExec, no Sort/Window") {
    val plan = topK(3).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey "), s"pushdown did not fire:\n$plan")
    assert(plan.contains("TopKPerKeyPartial"),
      s"map-side partial pruning missing:\n$plan")
    val finalPlan = plan.split("\\+- == Initial Plan ==")(0)
    assert(!finalPlan.contains("WindowExec") && !finalPlan.contains("Sort "),
      s"stock sort/window survived:\n$finalPlan")
  }

  test("pushdown result == stock window result (rule disabled)") {
    val got = topK(3).orderBy("key", "rank").collect().map(_.toSeq).toSeq
    val ruleName = graft.plans.RewriteWindowTopK.ruleName
    spark.conf.set("spark.sql.optimizer.excludedRules", ruleName)
    try {
      val stock = topK(3)
      val stockPlan = stock.queryExecution.executedPlan.toString
      assert(!stockPlan.contains("TopKPerKey "),
        "rule exclusion failed; comparison would be vacuous")
      assert(got == stock.orderBy("key", "rank").collect().map(_.toSeq).toSeq)
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("rank = 1 (dedup idiom) and cast-wrapped rank both fire; ties keep one row") {
    val w = Window.partitionBy("key").orderBy("id")
    val df = spark.range(100).selectExpr("id", "id % 10 AS key")
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") === 1L)
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey "))
    val rows = df.collect().map(r => (r.getLong(1), r.getLong(0))).sorted.toSeq
    assert(rows == (0L until 10L).map(k => (k, k)).toSeq)
  }

  test("null order values rank identically to stock window semantics") {
    val w = Window.partitionBy("key")
      .orderBy(col("v").desc_nulls_last, col("id"))
    def q = spark.range(200)
      .selectExpr("id", "id % 5 AS key",
        "CASE WHEN id % 7 = 0 THEN NULL ELSE (id * 13) % 50 END AS v")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 4)
    val viaPushdown = q
    assert(viaPushdown.queryExecution.executedPlan.toString
      .contains("TopKPerKey "))
    val got = viaPushdown.orderBy("key", "rank").collect().map(_.toSeq).toSeq
    spark.conf.set("spark.sql.optimizer.excludedRules",
      graft.plans.RewriteWindowTopK.ruleName)
    try assert(got == q.orderBy("key", "rank").collect().map(_.toSeq).toSeq)
    finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("non-matching shapes are left to stock planning") {
    // rank() (not row_number), multi-expression windows, non-literal k,
    // and predicates on other columns must NOT rewrite.
    val w = Window.partitionBy("key").orderBy("id")
    val base = spark.range(100).selectExpr("id", "id % 10 AS key")
    val rankFn = base.withColumn("r", rank().over(w)).where(col("r") <= 2)
    assert(!rankFn.queryExecution.executedPlan.toString
      .contains("TopKPerKey "))
    val multi = base.withColumn("r", row_number().over(w))
      .withColumn("c", count(lit(1)).over(Window.partitionBy("key")))
      .where(col("r") <= 2)
    assert(multi.collect().length == 20) // correct either way
    val otherPred = base.withColumn("r", row_number().over(w))
      .where(col("r") <= 2 && col("id") > 50)
    assert(!otherPred.queryExecution.executedPlan.toString
      .contains("TopKPerKey "))
    assert(otherPred.collect().forall(_.getLong(0) > 50))
  }

  test("large k and global (unpartitioned) windows are not rewritten") {
    val base = spark.range(100).selectExpr("id", "id % 10 AS key")
    val bigK = base.withColumn("r",
        row_number().over(Window.partitionBy("key").orderBy("id")))
      .where(col("r") <= 100000)
    assert(!bigK.queryExecution.executedPlan.toString
      .contains("TopKPerKey "))
    assert(bigK.count() == 100)
    val global = base.withColumn("r", row_number().over(Window.orderBy("id")))
      .where(col("r") <= 5)
    assert(!global.queryExecution.executedPlan.toString
      .contains("TopKPerKey "))
    assert(global.count() == 5)
  }
}
