package graft.functions

import graft.SparkTestSession
import graft.llm.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.6f)),
    (3L, Array.fill(64)(0.123f), Array.fill(64)(-0.456f)))
    .toDF("id", "a", "b")

  test("native dot product is bit-identical to the fold form") {
    val r = vecs.select(
      VectorExpressions.dotNative($"a", $"b").as("native"),
      Similarity.dotFold($"a", $"b").as("fold")).collect()
    r.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
    assert(r.head.getDouble(0) === (4.0 + 10.0 + 18.0))
  }

  test("null arrays yield null; cosine of identical vectors is 1") {
    val withNull = Seq((1L, Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("id", "a", "b")
    assert(withNull.select(VectorExpressions.dotNative($"a", $"b")).head.isNullAt(0))
    val c = vecs.select(VectorExpressions.cosineNative($"a", $"a")).collect()
    c.foreach(row => assert(math.abs(row.getDouble(0) - 1.0) < 1e-12))
  }

  test("expression participates in whole-stage codegen") {
    // a range-backed plan with codegen-friendly array construction (a
    // local Seq constant-folds; transform() lambdas are CodegenFallback)
    val df = spark.range(100).select(
      array((col("id") + 1).cast("float"), (col("id") + 2).cast("float")).as("a"),
      array((col("id") * 2).cast("float"), (col("id") - 1).cast("float")).as("b"))
    val q = df.select(VectorExpressions.dotNative($"a", $"b").as("d"))
    val wsc = q.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.exists(_.toString.contains("vector_dot")),
      q.queryExecution.executedPlan.toString)
    assert(q.count() === 100)
  }

  test("vector_dot is registered as a SQL function via SparkSessionExtensions") {
    vecs.createOrReplaceTempView("vx")
    val r = spark.sql("SELECT vector_dot(a, b) AS d FROM vx WHERE id = 1").head.getDouble(0)
    assert(r === 32.0)
  }
}
