package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration for the native graft expressions — the
  * ksql-parity piece: the reference engine's users write SQL, so every
  * custom kernel is reachable from `spark.sql(...)` text, not only the
  * Column API.
  *
  * Two entry points, one function table:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` (or
  *    `builder.withExtensions(new GraftExtensions)`) injects at session
  *    build — the deployment path.
  *  - [[GraftFunctions.register]] adds the same functions to an existing
  *    session's registry — the notebook/test path.
  *
  * Int parameters (k/w/band bounds) must be foldable integer literals;
  * anything else fails analysis with a clear message instead of silently
  * defaulting.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {
  import TextHashExpressions._
  import VecExpressions.{DotProduct, MatchCount, PqAdc, PqEncode}

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def litInt(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], allowed: Range): Unit =
    if (!allowed.contains(args.length)) throw new IllegalArgumentException(
      s"$fn expects ${allowed.min}..${allowed.max} arguments, got ${args.length}")

  private def fd(name: String, usage: String)(
      builder: Seq[Expression] => Expression): FunctionDescription =
    (new FunctionIdentifier(name),
      // 5-arg form: (className, db, name, usage, arguments) — the 3-arg
      // constructor is (className, db, NAME), which would put the usage
      // text where the name belongs
      new ExpressionInfo("graft.functions", null, name, usage, ""),
      builder)

  /** The full SQL function table (names match each expression's
    * prettyName, so plans read identically from either API).
    */
  val all: Seq[FunctionDescription] = Seq(
    fd("simhash64", "_FUNC_(text) - 64-bit SimHash over whitespace tokens") { args =>
      arity("simhash64", args, 1 to 1)
      SimHash64(args.head)
    },
    fd("minhash_sig", "_FUNC_(text[, k[, w]]) - k-perm MinHash signature of w-shingles") { args =>
      arity("minhash_sig", args, 1 to 3)
      MinHashSig(args.head,
        if (args.length > 1) litInt("minhash_sig", "k", args(1)) else 32,
        if (args.length > 2) litInt("minhash_sig", "w", args(2)) else 3)
    },
    fd("shingle_hashes", "_FUNC_(text[, w]) - sorted distinct w-shingle hashes") { args =>
      arity("shingle_hashes", args, 1 to 2)
      ShingleHashes(args.head,
        if (args.length > 1) litInt("shingle_hashes", "w", args(1)) else 3)
    },
    fd("band_hash", "_FUNC_(sig, start, len) - LSH band key of a signature slice") { args =>
      arity("band_hash", args, 3 to 3)
      BandHash(args.head,
        litInt("band_hash", "start", args(1)), litInt("band_hash", "len", args(2)))
    },
    fd("winnow_fingerprint", "_FUNC_(text[, k[, w]]) - winnowing fingerprint hashes") { args =>
      arity("winnow_fingerprint", args, 1 to 3)
      WinnowFingerprint(args.head,
        if (args.length > 1) litInt("winnow_fingerprint", "k", args(1)) else 5,
        if (args.length > 2) litInt("winnow_fingerprint", "w", args(2)) else 4)
    },
    fd("vec_dot", "_FUNC_(a, b) - dot product of two array<double>") { args =>
      arity("vec_dot", args, 2 to 2)
      DotProduct(args(0), args(1))
    },
    fd("vec_match_count", "_FUNC_(a, b) - agreeing positions of two array<bigint>") { args =>
      arity("vec_match_count", args, 2 to 2)
      MatchCount(args(0), args(1))
    },
    fd("pq_encode", "_FUNC_(vec, codebook, m, ksub) - product-quantization codes") { args =>
      arity("pq_encode", args, 4 to 4)
      PqEncode(args(0), args(1),
        litInt("pq_encode", "m", args(2)), litInt("pq_encode", "ksub", args(3)))
    },
    fd("pq_adc", "_FUNC_(codes, lut, ksub) - asymmetric-distance score from a lookup table") { args =>
      arity("pq_adc", args, 3 to 3)
      PqAdc(args(0), args(1), litInt("pq_adc", "ksub", args(2)))
    }
  )

  /** Register on a live session (idempotent: re-registration replaces). */
  def register(spark: SparkSession): Unit = all.foreach { case (ident, info, builder) =>
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
