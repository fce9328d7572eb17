package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayEqCount, DotProduct, Fingerprint, HyperplaneBandKeys, JsonLongField, LangStats, MinHashSig, ShingleSet, SimHash}

/** Registers graft's custom Catalyst expressions as SQL functions, so every
  * operator is reachable from pure `spark.sql(...)` as well as the Column
  * API: `SELECT graft_simhash(text) FROM documents`.
  *
  * Wire-up: `SparkSession.builder().withExtensions(new GraftExtensions)` —
  * done by [[GraftSession]] — or
  * `spark.sql.extensions=graft.engine.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.JsonFastPath)
    e.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two array<double>"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "graft_minhash_sig(text) - 16-hash MinHash signature"),
      (args: Seq[Expression]) => MinHashSig(args.head)))
    e.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(text) - 32-bit SimHash"),
      (args: Seq[Expression]) => SimHash(args.head)))
    e.injectFunction((FunctionIdentifier("graft_fingerprint"),
      info("graft_fingerprint", "graft_fingerprint(text) - rolling-hash document fingerprint"),
      (args: Seq[Expression]) => Fingerprint(args.head)))
    e.injectFunction((FunctionIdentifier("graft_json_long"),
      info("graft_json_long", "graft_json_long(json, 'key') - single-scan integer field extraction"),
      (args: Seq[Expression]) => JsonLongField(args(0),
        stringLiteralArg("graft_json_long", "key", args, 1))))
    e.injectFunction((FunctionIdentifier("graft_shingle_set"),
      info("graft_shingle_set", "graft_shingle_set(text) - distinct xxhash64'd 3-gram token shingles"),
      (args: Seq[Expression]) => ShingleSet(args.head)))
    e.injectFunction((FunctionIdentifier("graft_shingle_strings"),
      info("graft_shingle_strings", "graft_shingle_strings(text) - distinct 3-gram token shingles as strings"),
      (args: Seq[Expression]) => graft.functions.ShingleStrings(args.head)))
    e.injectFunction((FunctionIdentifier("graft_distinct_tokens"),
      info("graft_distinct_tokens", "graft_distinct_tokens(text) - distinct whitespace tokens"),
      (args: Seq[Expression]) => graft.functions.DistinctTokens(args.head)))
    e.injectFunction((FunctionIdentifier("graft_token_pairs"),
      info("graft_token_pairs", "graft_token_pairs(text) - adjacent token pairs with multiplicity"),
      (args: Seq[Expression]) => graft.functions.TokenPairs(args.head)))
    e.injectFunction((FunctionIdentifier("graft_tokens"),
      info("graft_tokens", "graft_tokens(text) - whitespace tokens with multiplicity"),
      (args: Seq[Expression]) => graft.functions.AllTokens(args.head)))
    e.injectFunction((FunctionIdentifier("graft_array_eq_count"),
      info("graft_array_eq_count", "graft_array_eq_count(a, b) - positions where two array<bigint> agree"),
      (args: Seq[Expression]) => ArrayEqCount(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("graft_sorted_intersect_count"),
      info("graft_sorted_intersect_count", "graft_sorted_intersect_count(a, b) - |A∩B| of two sorted array<bigint> via merge scan"),
      (args: Seq[Expression]) => graft.functions.SortedIntersectCount(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("graft_lang_stats"),
      info("graft_lang_stats", "graft_lang_stats(text) - [en,de,fr,es hits, n_tokens, tok_chars] in one pass"),
      (args: Seq[Expression]) => LangStats(args.head)))
    e.injectFunction((FunctionIdentifier("graft_pair_buckets"),
      info("graft_pair_buckets", "graft_pair_buckets(text, buckets) - hashed-bigram feature buckets (DSIR)"),
      (args: Seq[Expression]) => graft.functions.PairBuckets(args(0),
        intArg("graft_pair_buckets", "buckets", args, 1))))
    e.injectFunction((FunctionIdentifier("graft_winnow_set"),
      info("graft_winnow_set", "graft_winnow_set(text, k, w) - sorted distinct winnowing fingerprints (MOSS)"),
      (args: Seq[Expression]) => graft.functions.WinnowSet(args(0),
        intArg("graft_winnow_set", "k", args, 1),
        intArg("graft_winnow_set", "w", args, 2))))
    e.injectFunction((FunctionIdentifier("graft_band_keys"),
      info("graft_band_keys", "graft_band_keys(v, bands, rowsPerBand, dim) - hyperplane-LSH band keys over array<double>"),
      (args: Seq[Expression]) => HyperplaneBandKeys(args(0),
        intArg("graft_band_keys", "bands", args, 1),
        intArg("graft_band_keys", "rowsPerBand", args, 2),
        intArg("graft_band_keys", "dim", args, 3))))
    // bounded top-k AGGREGATES (Relational.smallestK/largestK's SQL face):
    // the builder returns the raw AggregateFunction — the analyzer wraps it
    e.injectFunction((FunctionIdentifier("graft_smallest_k"),
      info("graft_smallest_k", "graft_smallest_k(v, k) - the k smallest values as a sorted array (bounded-heap aggregate; k-capped state per group)"),
      (args: Seq[Expression]) => org.apache.spark.sql.GraftSqlBridge
        .collectTopKExpr(arity("graft_smallest_k", "(v, k)", args, 2).head,
          intArg("graft_smallest_k", "k", args, 1), reverse = true)))
    e.injectFunction((FunctionIdentifier("graft_largest_k"),
      info("graft_largest_k", "graft_largest_k(v, k) - the k largest values, descending (bounded-heap aggregate; k-capped state per group)"),
      (args: Seq[Expression]) => org.apache.spark.sql.GraftSqlBridge
        .collectTopKExpr(arity("graft_largest_k", "(v, k)", args, 2).head,
          intArg("graft_largest_k", "k", args, 1), reverse = false)))
  }

  // The builders below eval() their config arguments at ANALYSIS time, so
  // anything but a non-null foldable literal must fail with a real message —
  // a raw eval() would surface as an opaque NPE / 'Cannot evaluate
  // expression' / IndexOutOfBounds from inside the analyzer.
  // SELECT graft_smallest_k() would otherwise surface as an analyzer-internal
  // IndexOutOfBoundsException from args(0) — intArg only guards the k slot
  private def arity(fn: String, sig: String,
                    args: Seq[Expression], n: Int): Seq[Expression] = {
    require(args.length == n,
      s"$fn: expected $n arguments $sig, got ${args.length}")
    args
  }

  private def literalArg(fn: String, arg: String,
                         args: Seq[Expression], i: Int): Any = {
    require(args.length > i,
      s"$fn: missing argument '$arg' (expected at position ${i + 1})")
    require(args(i).foldable,
      s"$fn: argument '$arg' must be a literal, got ${args(i).sql}")
    val v = args(i).eval()
    require(v != null, s"$fn: argument '$arg' must not be NULL")
    v
  }

  private def stringLiteralArg(fn: String, arg: String,
                               args: Seq[Expression], i: Int): String =
    literalArg(fn, arg, args, i) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a string literal, got $other")
    }

  private def intArg(fn: String, arg: String,
                     args: Seq[Expression], i: Int): Int =
    literalArg(fn, arg, args, i) match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be an integer literal, got $other")
    }
}
