package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared primitive-loop kernels for the hash-sketch expressions: ONE
  * implementation serves both the interpreted `nullSafeEval` path and the
  * generated code (which calls these via the object's static forwarders),
  * so the two paths cannot drift.
  *
  * Hashing uses Spark's own XXH64 (the engine behind `xxhash64(...)`),
  * seed 42, so values are stable across JVMs and partitionings.
  */
object TextHashKernels {

  private val Seed = 42L

  /** Hash a UTF8String with Spark's xxhash64. */
  private def hashUtf8(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)

  /** sig[i] = min over w-shingles of xxhash64(shingleHash, seed=i).
    * Duplicate shingles cannot affect a min, so no distinct pass needed.
    */
  def minhashSig(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val toks = text.toString.split(' ')
    val n = math.max(0, toks.length - w + 1)
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      val h0 = hashUtf8(UTF8String.fromString(sb.toString), Seed)
      var p = 0
      while (p < k) {
        val h = XXH64.hashLong(h0, p)
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Bit b of the result = sign of Σ_tokens (bit_b(xxhash64(token)) ? +1 : -1). */
  def simhash64(text: UTF8String): Long = {
    val counters = new Array[Int](64)
    var start = 0
    val s = text.toString
    val len = s.length
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > start) {
          val h = hashUtf8(UTF8String.fromString(s.substring(start, i)), Seed)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 63
    while (b >= 0) {
      out = (out << 1) | (if (counters(b) > 0) 1L else 0L)
      b -= 1
    }
    out
  }

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, the MOSS
    * local fingerprinting scheme): hash every character k-gram, slide a
    * window of `w` consecutive k-gram hashes, select each window's
    * minimum (rightmost on ties via the deque's >= eviction), return the
    * DISTINCT selected hashes sorted ascending. Guarantee: any substring
    * match of length ≥ w + k - 1 shares at least one fingerprint.
    * O(n) via a monotonic deque.
    */
  def winnow(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val s = text.toString
    val n = s.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      hashes(i) = hashUtf8(UTF8String.fromString(s.substring(i, i + k)), Seed)
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (n <= w) {
      var m = hashes(0)
      var j = 1
      while (j < n) { if (hashes(j) <= m) m = hashes(j); j += 1 }
      sel.add(m)
    } else {
      val dq = new java.util.ArrayDeque[Integer]()
      i = 0
      while (i < n) {
        while (!dq.isEmpty && hashes(dq.peekLast) >= hashes(i)) dq.removeLast()
        dq.addLast(i)
        if (dq.peekFirst <= i - w) dq.removeFirst()
        if (i >= w - 1) sel.add(hashes(dq.peekFirst))
        i += 1
      }
    }
    val arr = new Array[Long](sel.size)
    val it = sel.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new GenericArrayData(arr)
  }

  /** Order-dependent fold hash of a long-array slice [start, start+len)
    * — the LSH band key. Chain replicates `aggregate(slice, 17L,
    * (a, x) => xxhash64(a, x))` exactly: s' = hash(x, seed = hash(s, 42)).
    */
  def bandHash(a: org.apache.spark.sql.catalyst.util.ArrayData,
      start: Int, len: Int): Long = {
    // fail fast like VecKernels.requireSameLength: a bad slice means a
    // k/bands misconfiguration, not something to silently band anyway.
    // Long arithmetic: start + len must not pass via int overflow, and a
    // negative start would be an unchecked off-heap read on
    // UnsafeArrayData (the SQL surface makes arbitrary args reachable)
    if (start < 0 || len < 0 || start.toLong + len > a.numElements())
      throw new IllegalArgumentException(
        s"bandHash: slice [$start, ${start.toLong + len}) outside signature " +
          s"length ${a.numElements()} (k must equal bands*rows)")
    var s = 17L
    var i = start
    val end = start + len
    while (i < end) {
      s = XXH64.hashLong(a.getLong(i), XXH64.hashLong(s, 42L))
      i += 1
    }
    s
  }

  /** Distinct w-shingle hashes, sorted ascending (the Jaccard item set;
    * sorted so a prefix slice IS the min-wise sample).
    */
  def shingleHashes(text: UTF8String, w: Int): GenericArrayData = {
    val toks = text.toString.split(' ')
    val n = math.max(0, toks.length - w + 1)
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      set.add(hashUtf8(UTF8String.fromString(sb.toString), Seed))
      i += 1
    }
    val arr = new Array[Long](set.size)
    val it = set.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new GenericArrayData(arr)
  }
}

/** Native Catalyst expressions for the hash-sketch hot paths.
  *
  * Why custom expressions: the straightforward formulation with
  * `transform`/`aggregate` higher-order functions is evaluated
  * interpreted, per element, with boxed longs and a GenericArrayData
  * allocation per lambda application — measured ~5µs per hash on the
  * minhash path (46 s for 5 000 docs × 32 perms × ~50 shingles). The
  * primitive-loop kernels do the same work in tight JIT-compiled loops
  * (~10 ns/hash).
  *
  * Each expression implements `doGenCode` as a direct static call into
  * [[TextHashKernels]], so the expression participates in whole-stage
  * codegen (no per-row virtual eval() dispatch, no boxed argument) —
  * the generated projection stays one fused loop.
  */
object TextHashExpressions {

  case class MinHashSig(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      TextHashKernels.minhashSig(input.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextHashKernels.minhashSig($c, $k, $w)")
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
    override def prettyName: String = "minhash_sig"
  }

  case class SimHash64(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      TextHashKernels.simhash64(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.simhash64($c)")
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
    override def prettyName: String = "simhash64"
  }

  case class ShingleHashes(child: Expression, w: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      TextHashKernels.shingleHashes(input.asInstanceOf[UTF8String], w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextHashKernels.shingleHashes($c, $w)")
    override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
    override def prettyName: String = "shingle_hashes"
  }

  case class BandHash(child: Expression, start: Int, len: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      TextHashKernels.bandHash(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], start, len)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextHashKernels.bandHash($c, $start, $len)")
    override protected def withNewChildInternal(c: Expression): BandHash = copy(child = c)
    override def prettyName: String = "band_hash"
  }

  case class WinnowFingerprint(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      TextHashKernels.winnow(input.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextHashKernels.winnow($c, $k, $w)")
    override protected def withNewChildInternal(c: Expression): WinnowFingerprint = copy(child = c)
    override def prettyName: String = "winnow_fingerprint"
  }

  // Column-API wrappers (Spark 4: Column wraps a ColumnNode; the classic
  // bridge lifts a Catalyst Expression)
  import org.apache.spark.sql.GraftSqlBridge.{column => toCol, expression => toExpr}

  def minhash_sig(c: Column, k: Int = 32, w: Int = 3): Column =
    toCol(MinHashSig(toExpr(c), k, w))
  def simhash64(c: Column): Column = toCol(SimHash64(toExpr(c)))
  def shingle_hashes(c: Column, w: Int = 3): Column =
    toCol(ShingleHashes(toExpr(c), w))
  def winnow_fingerprint(c: Column, k: Int = 5, w: Int = 4): Column =
    toCol(WinnowFingerprint(toExpr(c), k, w))
  def band_hash(c: Column, start: Int, len: Int): Column =
    toCol(BandHash(toExpr(c), start, len))
}
