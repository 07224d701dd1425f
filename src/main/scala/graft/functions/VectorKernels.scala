package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels for the embedding operators.
  *
  * [[DotProduct]] replaces the `Seq[Double]` Scala UDF that was the ANN
  * family's hot inner loop (`Similarity.dotUdf`): a UDF call first
  * CONVERTS each `UnsafeArrayData` into a boxed `Seq[Double]` (one
  * allocation plus one box per element, per argument, per row), then
  * breaks whole-stage codegen around the call. This expression reads the
  * unsafe array IN PLACE (`ArrayData.getDouble`) inside the generated
  * loop — zero conversion, zero boxing, and the projection around it
  * stays inside one WholeStageCodegen span.
  *
  * Accumulation is the same left-to-right double fold as `dotUdf` and
  * the declarative `aggregate(zip_with(...))` form, so results are
  * BIT-IDENTICAL to both — the oracle hashes cannot move.
  *
  * Contract: element nulls are NOT checked (a null element reads as the
  * unsafe default 0.0). Every caller filters through
  * `Similarity.withVec` first, which drops rows with null elements —
  * the same precondition the UDF had (it would have thrown a class cast
  * on a null element).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot needs two array<double> arguments, got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(newLeft, newRight)
}

/** One-pass cosine similarity — the codegen twin of
  * `Similarity.cosineUdf`: dab, daa, dbb accumulate in a single loop
  * over the unsafe arrays (three composed [[DotProduct]]s would walk
  * both arrays three times), null when either norm is 0. Same fold
  * order per accumulator as the UDF — bit-identical results. Same
  * null-element contract as [[DotProduct]]. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cosine needs two array<double> arguments, got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dab += xi * yi; daa += xi * xi; dbb += yi * yi
      i += 1
    }
    if (daa == 0.0 || dbb == 0.0) null
    else dab / (math.sqrt(daa) * math.sqrt(dbb))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dab = ctx.freshName("dab")
      val daa = ctx.freshName("daa")
      val dbb = ctx.freshName("dbb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dab = 0.0; double $daa = 0.0; double $dbb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dab += $xi * $yi; $daa += $xi * $xi; $dbb += $yi * $yi;
         |}
         |if ($daa == 0.0 || $dbb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dab / (java.lang.Math.sqrt($daa) * java.lang.Math.sqrt($dbb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(newLeft, newRight)
}

object VectorKernels {
  /** Register `graft_dot(a, b)` and `graft_cosine(a, b)` in the
    * session's function registry so operator code reaches them via
    * `call_function` (same pattern as [[ExactPercentile.register]]).
    * Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_dot takes 2 args, got ${args.length}")
        DotProduct(args(0), args(1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_cosine takes 2 args, got ${args.length}")
        CosineSim(args(0), args(1))
      },
      "scala_udf")
  }
}
