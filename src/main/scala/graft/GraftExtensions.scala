package graft

import graft.functions.{BitSketch, FloatDot, MaxSimScore, MinHashWords, ShingleHashes}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point: registers graft's native expressions
  * into the SQL function registry, so SQL users get the same codegen'd
  * operators as the DataFrame API
  * (`SELECT float_dot(a.embedding, b.embedding) ...`).
  *
  * Usage: SparkSession.builder().withExtensions(new GraftExtensions) or
  * `--conf spark.sql.extensions=graft.GraftExtensions` on a cluster.
  *
  * Registered functions (arguments after the column must be INTEGER
  * literals — they parameterize codegen, not per-row values):
  *
  *   - `float_dot(a, b)` — exact float-array dot product;
  *   - `shingle_hashes(text, k)` — distinct xxhash64 word-k-gram hashes;
  *   - `minhash_words(words, k, seeds)` — md5 MinHash signature array;
  *   - `bit_sketch(embedding, planes, dim)` — packed sign-LSH bit sketch;
  *   - `maxsim(doc, query, tokens)` — late-interaction MaxSim score over
  *     flat quantized BIGINT arrays split into `tokens` token vectors.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(fn: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected an INTEGER literal argument, got $other")
  }

  private def register(
      e: SparkSessionExtensions, name: String, clazz: Class[_], arity: Int)(
      build: Seq[Expression] => Expression): Unit =
    e.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == arity,
          s"$name requires exactly $arity arguments, got ${exprs.length}")
        build(exprs)
      }))

  override def apply(e: SparkSessionExtensions): Unit = {
    // Strength-reduce the naive HOF dot product to the native FloatDot
    // (value-preserving; see the rule's scaladoc).
    e.injectOptimizerRule(_ => graft.plans.DotStrengthReduction)
    register(e, "float_dot", classOf[FloatDot], 2)(x => FloatDot(x(0), x(1)))
    register(e, "shingle_hashes", classOf[ShingleHashes], 2)(x =>
      ShingleHashes(x(0), litInt("shingle_hashes", x(1))))
    register(e, "minhash_words", classOf[MinHashWords], 3)(x =>
      MinHashWords(x(0),
        litInt("minhash_words", x(1)), litInt("minhash_words", x(2))))
    register(e, "bit_sketch", classOf[BitSketch], 3)(x =>
      BitSketch(x(0),
        litInt("bit_sketch", x(1)), litInt("bit_sketch", x(2))))
    register(e, "maxsim", classOf[MaxSimScore], 3)(x =>
      MaxSimScore(x(0), x(1), litInt("maxsim", x(2))))
  }
}
