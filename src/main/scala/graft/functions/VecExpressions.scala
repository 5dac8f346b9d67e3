package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Primitive-loop vector kernel shared by the interpreted and generated
  * paths (same single-implementation pattern as [[TextHashKernels]]).
  */
object VecKernels {

  private def requireSameLength(a: ArrayData, b: ArrayData, op: String): Unit =
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"$op: array length mismatch (${a.numElements()} vs ${b.numElements()}) — " +
          "a truncated result would be silently wrong; fix the input dimensions")

  /** Left-to-right dot product of two double arrays — the SAME fold
    * order as DuckDB's list_dot_product, which the similarity oracles
    * rely on for bit-identical doubles. Length mismatch FAILS FAST (a
    * dimension bug must not produce plausible-but-truncated
    * similarities). Null elements are not expected (embedding columns
    * are dense) and read as 0.0.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    requireSameLength(a, b, "vec_dot")
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Positions where two long arrays agree (MinHash signature-agreement
    * count; est. Jaccard = agreement / k). Length mismatch fails fast.
    */
  def matchCount(a: ArrayData, b: ArrayData): Int = {
    requireSameLength(a, b, "vec_match_count")
    val n = a.numElements()
    var c = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
    c
  }
}

/** Native dot product: the `aggregate(zip_with(...))` higher-order
  * formulation is evaluated INTERPRETED by Spark (one boxed lambda
  * application per element plus an intermediate array per row) — on the
  * brute-force top-k path that is dim × |corpus| × |queries| boxed ops.
  * This expression runs the same left-to-right fold as a fused primitive
  * loop inside whole-stage codegen.
  */
object VecExpressions {

  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    // the kernel reads 8-byte slots: anything but array<double> (e.g. the
    // fixture's raw array<float>) would be silent garbage — reject at
    // analysis time; the Column wrappers in Similarity cast first (a
    // codegen'd Cast, erased by SimplifyCasts when already double)
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"vec_dot requires array<double> inputs, got $l / $r")
      }
    override def nullSafeEval(a: Any, b: Any): Any =
      VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.VecKernels.dot($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "vec_dot"
  }

  case class MatchCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"vec_match_count requires array<bigint> inputs, got $l / $r")
      }
    override def nullSafeEval(a: Any, b: Any): Any =
      VecKernels.matchCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.VecKernels.matchCount($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): MatchCount =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "vec_match_count"
  }

  import org.apache.spark.sql.GraftSqlBridge.{column => toCol, expression => toExpr}

  def vec_dot(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a), toExpr(b)))

  def vec_match_count(a: Column, b: Column): Column =
    toCol(MatchCount(toExpr(a), toExpr(b)))
}
