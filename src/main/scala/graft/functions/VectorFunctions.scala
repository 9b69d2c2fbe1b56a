package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The embedding hot path (similarity search, near-dup mining) computes
  * millions of 64-dim dot products; the builtin composition
  * (`aggregate(zip_with(...))`) allocates an intermediate array per pair
  * and runs through the interpreted higher-order-function path. This
  * expression generates a tight fused multiply-add loop inside
  * whole-stage codegen — no allocation, no virtual calls.
  *
  * The summation is a sequential left-fold in element order — the SAME
  * operation order as the builtin `aggregate` fold and as DuckDB's
  * list_cosine_similarity loop, so results remain bit-identical to the
  * oracle (verified by s01_knn_brute).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration for the native vector functions (the
  * `SparkSessionExtensions` injection path for spark-submit users lives
  * in [[graft.GraftExtensions]]). */
object VectorFunctions {

  val dotName = "graft_dot"

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier(dotName))) {
      registry.registerFunction(
        FunctionIdentifier(dotName),
        new ExpressionInfo(classOf[DotProduct].getName, dotName),
        (children: Seq[Expression]) => DotProduct(children(0), children(1)))
    }
  }

  /** Codegen'd dot product (registers on the active session on first
    * use — idempotent). */
  def dotProduct(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function(dotName, a, b)
  }
}
