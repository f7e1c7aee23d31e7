package graft

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.scalatest.funsuite.AnyFunSuite

/** A deliberately broken codegen expression: `doGenCode` emits invalid
  * Java, so whole-stage codegen MUST fail to compile and Spark falls
  * back to interpreted eval (which works — `nullSafeEval` is fine).
  * This is exactly the failure mode of the historical `MinhashSigExpr`
  * nullability bug: correct results, silently interpreted. */
case class BrokenCodegenExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    input.asInstanceOf[Int] + 1
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"this is not java ($c)")
  override protected def withNewChildInternal(
      newChild: Expression): BrokenCodegenExpr = copy(child = newChild)
}

/** Proves the [[CodegenHealth]] gate trips: a generated-Java compile
  * failure increments the counter (and is visible even though Spark
  * recovers via interpreted fallback and the query returns correct
  * rows), while a clean query leaves it untouched. */
class CodegenHealthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("clean query leaves the codegen-failure counter untouched") {
    // Touch the session BEFORE install(): Spark's logging init replaces
    // the log4j2 configuration, so the filter must land on the live one
    // (install is per-configuration idempotent, but order still avoids
    // a window where a failure could go uncounted).
    import spark.implicits._
    CodegenHealth.install()
    CodegenHealth.reset()
    val n = spark.range(100).select(($"id" * 2).as("x"))
      .filter($"x" > 10).count()
    assert(n == 94)
    assert(CodegenHealth.count == 0,
      s"clean query tripped the gate: ${CodegenHealth.last}")
  }

  test("a broken doGenCode trips the gate while results stay correct " +
      "(the silent interpreted-fallback class of bug)") {
    // Touch the session BEFORE install(): Spark's logging init replaces
    // the log4j2 configuration, so the filter must land on the live one
    // (install is per-configuration idempotent, but order still avoids
    // a window where a failure could go uncounted).
    import spark.implicits._
    CodegenHealth.install()
    CodegenHealth.reset()
    val df = spark.range(10).select($"id".cast("int").as("i"))
    val out = df.select(
      Bridge.column(BrokenCodegenExpr(Bridge.expression($"i"))).as("j"))
      .collect().map(_.getInt(0)).sorted
    // interpreted fallback still computes the right answer...
    assert(out.toSeq == (1 to 10))
    // ...which is precisely why a log-seam gate is needed: only the
    // counter knows the generated Java never compiled
    assert(CodegenHealth.count > 0,
      "compile failure was not observed by CodegenHealth")
    assert(CodegenHealth.last.nonEmpty)
  }

  test("signature classification matches Spark 4.1.2's actual log text") {
    CodegenHealth.reset()
    // WholeStageCodegenExec.doExecute's COMPILE-FAILURE fallback WARN
    // (string constant verified in spark-sql_2.13-4.1.2.jar) — gates.
    CodegenHealth.observe(
      "Whole-stage codegen disabled for plan (id=3):\n *(3) HashAggregate")
    assert(CodegenHealth.count == 1 && CodegenHealth.sizeFallbacks == 0,
      "compile-failure fallback warning must gate")
    // The hugeMethodLimit SIZE fallback INFO — healthy plan, never gates.
    CodegenHealth.observe(
      "Found too long generated codes and JIT optimization might not " +
      "work: the bytecode size (9000) is above the limit 8000, and " +
      "the whole-stage codegen was disabled for this plan (id=3).")
    assert(CodegenHealth.count == 1 && CodegenHealth.sizeFallbacks == 1,
      "size fallback must count in the benign bucket only")
    CodegenHealth.reset()
  }

  test("a real hugeMethodLimit size fallback lands in sizeFallbacks, " +
      "not the gate (INFO observable through the raised logger level)") {
    import spark.implicits._
    CodegenHealth.install()
    CodegenHealth.reset()
    spark.conf.set("spark.sql.codegen.hugeMethodLimit", "1")
    try {
      val n = spark.range(1000).select(($"id" * 2).as("x"))
        .filter($"x" > 10).count()
      assert(n == 994)
      assert(CodegenHealth.count == 0,
        s"healthy size fallback tripped the gate: ${CodegenHealth.last}")
      assert(CodegenHealth.sizeFallbacks > 0,
        "size fallback was not observed — is the " +
        "WholeStageCodegenExec logger at INFO?")
    } finally {
      spark.conf.unset("spark.sql.codegen.hugeMethodLimit")
      CodegenHealth.reset()
    }
  }
}
