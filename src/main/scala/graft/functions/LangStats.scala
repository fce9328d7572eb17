package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics for language ID and quality scoring:
  * `[en_hits, de_hits, fr_hits, es_hits, n_tokens, tok_chars]` over the
  * whitespace tokens of a document.
  *
  * Why a kernel (SURVEY.md §2.10 tier (b)): the declarative form runs FOUR
  * `filter(toks, t -> t IN (...))` higher-order passes plus a size and a
  * char-sum pass over the token array — six array traversals with per-token
  * linear IN-list compares. This expression tokenizes once and classifies
  * each token against per-language hash sets. Arithmetic is EXACTLY the
  * [[TextAnalysis]] fragments' (exact string equality against the stopword
  * profiles, same tokenization as Portable.tokens) — pinned by
  * KernelParitySpec.
  */
case class LangStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lang_stats"

  override def nullSafeEval(input: Any): Any =
    LangStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.LangStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): LangStats =
    copy(child = newChild)
}

object LangStats {
  /** Languages in profile order (en, de, fr, es — TextAnalysis.profiles). */
  val Langs: Seq[String] = TextAnalysis.profiles.map(_._1)

  private val wordSets: Array[java.util.HashSet[String]] =
    TextAnalysis.profiles.map { case (_, words) =>
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      s
    }.toArray

  def compute(u: UTF8String): ArrayData = {
    val s = u.toString
    val nLangs = wordSets.length
    val out = new Array[Long](nLangs + 2)
    // TokenHasher.foreachToken is THE tokenizer (single-space split, empties
    // dropped) — reused so a tokenization change can never desync language
    // stats from the other kernels KernelParitySpec pins together.
    TokenHasher.foreachToken(s) { (from, until) =>
      out(nLangs) += 1              // n_tokens
      out(nLangs + 1) += until - from // tok_chars
      val tok = s.substring(from, until)
      var l = 0
      while (l < nLangs) {
        if (wordSets(l).contains(tok)) out(l) += 1
        l += 1
      }
    }
    new GenericArrayData(out)
  }
}
