package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

  /** 1-based index of the LAST element ≤ v in an ascending-sorted long
    * array (equivalently: the count of elements ≤ v); 0 when none.
    * Binary search, O(log n) — the as-of probe over a broadcast per-key
    * version history (an interpreted filter() HOF here cost O(n) per
    * fact row AND fell out of codegen).
    */
  def lastLeqIndex(ts: ArrayData, v: Long): Int = {
    var lo = 0
    var hi = ts.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ts.getLong(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
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

  /** Product-quantization encode: nearest codebook centroid per
    * subspace. `cb` is the flattened m × ksub × dsub codebook (subspace-
    * major, then centroid, then dim). Ties break to the LOWEST centroid
    * index (strict `<`), so codes are deterministic. Dimension mismatches
    * fail fast — a silently mis-sliced codebook would yield plausible
    * garbage codes.
    */
  def pqEncode(vec: ArrayData, cb: ArrayData, m: Int, ksub: Int): GenericArrayData = {
    val dim = vec.numElements()
    if (m <= 0 || dim % m != 0)
      throw new IllegalArgumentException(
        s"pq_encode: dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    if (cb.numElements() != m * ksub * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: codebook length ${cb.numElements()} != m*ksub*dsub = ${m * ksub * dsub}")
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = vec.getDouble(j * dsub + t) - cb.getDouble(base + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance (ADC) score: sum of per-subspace lookup-table
    * entries, `lut[j*ksub + codes[j]]`. The LUT is query-specific
    * (inner product of the query subvector with every centroid), so a
    * candidate's score costs m table reads — no float vector is touched
    * at scan time.
    */
  def pqAdc(codes: ArrayData, lut: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    if (lut.numElements() != m * ksub)
      throw new IllegalArgumentException(
        s"pq_adc: lut length ${lut.numElements()} != m*ksub = ${m * ksub}")
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      if (c < 0 || c >= ksub)
        throw new IllegalArgumentException(s"pq_adc: code $c out of [0, $ksub)")
      s += lut.getDouble(j * ksub + c)
      j += 1
    }
    s
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

  case class SortedLastLeqIdx(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), LongType) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"sorted_last_leq_idx requires (array<bigint> sorted asc, bigint), got $l / $r")
      }
    override def nullSafeEval(a: Any, b: Any): Any =
      VecKernels.lastLeqIndex(a.asInstanceOf[ArrayData], b.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.VecKernels.lastLeqIndex($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedLastLeqIdx =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "sorted_last_leq_idx"
  }

  case class PqEncode(left: Expression, right: Expression, m: Int, ksub: Int)
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires array<double> (vec, codebook), got $l / $r")
      }
    override def nullSafeEval(a: Any, b: Any): Any =
      VecKernels.pqEncode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m, ksub)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.VecKernels.pqEncode($a, $b, $m, $ksub)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqEncode =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "pq_encode"
  }

  case class PqAdc(left: Expression, right: Expression, ksub: Int)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"pq_adc requires (array<int> codes, array<double> lut), got $l / $r")
      }
    override def nullSafeEval(a: Any, b: Any): Any =
      VecKernels.pqAdc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ksub)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.VecKernels.pqAdc($a, $b, $ksub)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqAdc =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "pq_adc"
  }

  import org.apache.spark.sql.GraftSqlBridge.{column => toCol, expression => toExpr}

  def vec_dot(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a), toExpr(b)))

  def vec_match_count(a: Column, b: Column): Column =
    toCol(MatchCount(toExpr(a), toExpr(b)))

  def sorted_last_leq_idx(sortedTs: Column, v: Column): Column =
    toCol(SortedLastLeqIdx(toExpr(sortedTs), toExpr(v)))

  def pq_encode(vec: Column, codebook: Column, m: Int, ksub: Int): Column =
    toCol(PqEncode(toExpr(vec), toExpr(codebook), m, ksub))

  def pq_adc(codes: Column, lut: Column, ksub: Int): Column =
    toCol(PqAdc(toExpr(codes), toExpr(lut), ksub))
}
