package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot matches the builtin fold bit-for-bit") {
    val df = Seq((Array(1.5, -2.0, 3.25), Array(0.5, 4.0, -1.0)))
      .toDF("a", "b")
    val native = df.select(VectorFunctions.dotProduct($"a", $"b"))
      .as[Double].head()
    val fold = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0),
        (s, x) => s + x)).as[Double].head()
    assert(native === fold)
    assert(native === 1.5 * 0.5 + -2.0 * 4.0 + 3.25 * -1.0)
  }

  test("interpreted eval path (no codegen) agrees") {
    // DotProduct.nullSafeEval is the non-codegen fallback — exercise it
    // directly on catalyst ArrayData
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    val a = ArrayData.toArrayData(Array(2.0, 3.0))
    val b = ArrayData.toArrayData(Array(4.0, 5.0))
    val e = DotProduct(Literal.create(null), Literal.create(null))
    assert(e.nullSafeEval(a, b) === 2.0 * 4.0 + 3.0 * 5.0)
  }

  test("mismatched lengths use the common prefix") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(10.0, 10.0))).toDF("a", "b")
    assert(df.select(VectorFunctions.dotProduct($"a", $"b"))
      .as[Double].head() === 30.0)
  }

  test("null input yields null") {
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    assert(df.select(VectorFunctions.dotProduct($"a", $"b"))
      .as[Option[Double]].head().isEmpty)
  }

  test("type mismatch is rejected at analysis") {
    val df = Seq((Array("x"), Array(1.0))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorFunctions.dotProduct($"a", $"b")).collect()
    }
  }
}
