package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, Fingerprint, JsonLongField, MinHashSig, SimHash}

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
        args(1).eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)))
  }
}
