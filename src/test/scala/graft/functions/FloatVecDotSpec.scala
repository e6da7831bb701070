package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.similarity.Similarity

class FloatVecDotSpec extends SparkTestBase {
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private val vecs = Seq.fill(200)(
    (Array.fill(64)(rng.nextFloat() * 2 - 1),
      Array.fill(64)(rng.nextFloat() * 2 - 1))).toDF("a", "b")

  test("native expression is bit-identical to the HOF fold") {
    val both = vecs.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotFold(col("a"), col("b")).as("fold")).collect()
    assert(both.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("null input yields null; length mismatch uses common prefix") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f, 5.0f))),
      (None, Some(Array(1.0f)))).toDF("a", "b")
    val out = df.select(Similarity.dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 1.0 * 3 + 2.0 * 4)
    assert(out(1).isNullAt(0))
  }

  test("participates in whole-stage codegen (no fallback)") {
    // a bare local Seq collapses to LocalTableScan (no codegen stage), so
    // force an exchange; AQE finalizes the plan only on execution, so run
    // the query before inspecting it
    val df = vecs.repartition(2)
      .select(Similarity.dot(col("a"), col("b")).as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // AQE's simpleString renders WholeStageCodegen stages as "*(n)"
    assert(plan.contains("WholeStageCodegen") ||
      plan.contains("*(1) Project"), plan)
    // and the expression itself must not be a CodegenFallback
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[FloatVecDot]))
  }
}
