package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the engine's native expressions — register with
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   // or spark.sql.extensions=graft.functions.GraftExtensions
  *
  * and every kernel is callable from plain SQL:
  *
  *   SELECT hash_to_range(routingKey), seq_dot(a, b),
  *          sorted_intersect_size(x, y), minhash_signature(th, 3, 64),
  *          affine_minhash(hs, 32), winnowed_fingerprints(text, 8, 16)
  *
  * Literal-int parameters (shingle/band/window sizes) are extracted at
  * resolution time — they parameterize generated code, so they must be
  * foldable, like Spark's own `ntile(n)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", null, name, usage, ""),
        builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an INT literal, got $other")
  }

  /** (name, usage, builder) for every native kernel. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("hash_to_range",
      "hash_to_range(key) - routing-key hash to [0,1), exact reference semantics",
      { case Seq(k) => HashToRange(k)
        case args => throw new IllegalArgumentException(s"hash_to_range expects 1 arg, got ${args.size}") }),
    ("range_bucket",
      "range_bucket(key, n) - fixed n-way segment index for a routing key",
      { case Seq(k, n) => RangeBucket(k, intArg(n, "range_bucket", 1))
        case args => throw new IllegalArgumentException(s"range_bucket expects 2 args, got ${args.size}") }),
    ("seq_dot",
      "seq_dot(a, b) - left-to-right double dot product of two float arrays",
      { case Seq(a, b) => SeqDotProduct(a, b)
        case args => throw new IllegalArgumentException(s"seq_dot expects 2 args, got ${args.size}") }),
    ("sorted_intersect_size",
      "sorted_intersect_size(a, b) - |A∩B| of two sorted bigint arrays",
      { case Seq(a, b) => SortedIntersectSize(a, b)
        case args => throw new IllegalArgumentException(s"sorted_intersect_size expects 2 args, got ${args.size}") }),
    ("minhash_signature",
      "minhash_signature(tokenHashes, shingleSize, numHashes) - MinHash signature",
      { case Seq(t, k, n) => MinHashSignature(t,
          intArg(k, "minhash_signature", 1), intArg(n, "minhash_signature", 2))
        case args => throw new IllegalArgumentException(s"minhash_signature expects 3 args, got ${args.size}") }),
    ("affine_minhash",
      "affine_minhash(hashes, numHashes) - mins of the modular affine MinHash family",
      { case Seq(h, n) => AffineMinHash(h, intArg(n, "affine_minhash", 1))
        case args => throw new IllegalArgumentException(s"affine_minhash expects 2 args, got ${args.size}") }),
    ("winnowed_fingerprints",
      "winnowed_fingerprints(text, k, w) - Rabin-Karp + winnowing fingerprint set",
      { case Seq(t, k, w) => WinnowedFingerprints(t,
          intArg(k, "winnowed_fingerprints", 1), intArg(w, "winnowed_fingerprints", 2))
        case args => throw new IllegalArgumentException(s"winnowed_fingerprints expects 3 args, got ${args.size}") }),
    ("md5_shingle_hashes",
      "md5_shingle_hashes(tokens, k) - md5-based k-token shingle ids (SQL-reproducible)",
      { case Seq(t, k) => Md5ShingleHashes(t, intArg(k, "md5_shingle_hashes", 1))
        case args => throw new IllegalArgumentException(s"md5_shingle_hashes expects 2 args, got ${args.size}") }),
    ("simhash60",
      "simhash60(tokens) - 60-bit Charikar SimHash of a distinct-token array (SQL-reproducible)",
      { case Seq(t) => Simhash60(t)
        case args => throw new IllegalArgumentException(s"simhash60 expects 1 arg, got ${args.size}") }))

  /** Register into an EXISTING session (extensions only apply at session
    * construction; tests and notebooks attach to a live session).
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (name, usage, builder) =>
      reg.registerFunction(FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", null, name, usage, ""),
        builder)
    }
  }
}
