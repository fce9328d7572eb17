package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row BPE tokenization (Sennrich, Haddow & Birch, ACL 2016) under a
  * learned merge list — the APPLY step completing
  * [[graft.operators.BpeTrainer]]'s train step: text → whitespace words →
  * character symbols with the trainer's end-of-word convention (`</w>`
  * fused onto the final character) → the merges applied IN LEARNED ORDER,
  * each greedy leftmost-first — exactly the rewrite the trainer runs on its
  * vocab table each round, so `encode(corpus, train(corpus, n))` reproduces
  * the trainer's final symbol state word for word.
  *
  * Scale shape: pure per-row column compute inside whole-stage codegen — no
  * shuffle, no join, the corpus is touched once. The merge list rides the
  * expression (task-serialized once per executor, like a broadcast literal).
  * Cost per word is O(merges × word-length) worst case, but words repeat
  * Zipf-style, so a per-partition word→encoding cache (bounded, cleared at
  * capacity — results never depend on it) makes the effective cost
  * O(DISTINCT words × merges) per partition: the same
  * vocabulary-not-corpus bound the trainer itself exploits.
  *
  * Output is `array<string>` of BPE symbols over the whole document (words'
  * symbol runs concatenated in order) — the token-id mapping is a dictionary
  * join the caller owns, since ids are a vocabulary artifact, not a corpus
  * one.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  @transient private lazy val mergeArr: Array[(String, String)] =
    merges.toArray

  /** Per-partition (per-task-thread, uncontended) word cache. Bounded so a
    * pathological vocabulary cannot grow the executor heap: cleared when
    * full — correctness never depends on residency. */
  @transient private lazy val cache =
    new java.util.HashMap[String, Array[UTF8String]]()

  private def encodeWord(w: String): Array[UTF8String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    // character symbols, '</w>' fused onto the final character — the
    // trainer's convention (word-final merges stay distinct from
    // word-internal ones)
    var syms = new Array[String](w.length)
    var i = 0
    while (i < w.length) {
      val c = String.valueOf(w.charAt(i))
      syms(i) = if (i == w.length - 1) c + BpeEncode.EndMark else c
      i += 1
    }
    // merges in learned order, each greedy leftmost-first: fold over the
    // symbol run, fusing when the accumulated tail is l and the incoming
    // symbol is r — overlapping runs resolve leftmost-first (aaa + (a,a)
    // → [aa, a]), the standard BPE apply order and the trainer's rewrite
    val buf = new java.util.ArrayList[String](syms.length)
    var m = 0
    while (m < mergeArr.length && syms.length >= 2) {
      val l = mergeArr(m)._1
      val r = mergeArr(m)._2
      buf.clear()
      var j = 0
      while (j < syms.length) {
        val x = syms(j)
        if (!buf.isEmpty && buf.get(buf.size - 1) == l && x == r)
          buf.set(buf.size - 1, l + r)
        else buf.add(x)
        j += 1
      }
      if (buf.size < syms.length) syms = buf.toArray(new Array[String](0))
      m += 1
    }
    val out = new Array[UTF8String](syms.length)
    i = 0
    while (i < syms.length) { out(i) = UTF8String.fromString(syms(i)); i += 1 }
    if (cache.size >= BpeEncode.MaxCachedWords) cache.clear()
    cache.put(w, out)
    out
  }

  def encodeData(u: UTF8String): ArrayData = {
    val s = u.toString
    val out = new java.util.ArrayList[AnyRef]()
    TokenHasher.foreachToken(s) { (from, until) =>
      val enc = encodeWord(s.substring(from, until))
      var i = 0
      while (i < enc.length) { out.add(enc(i)); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    encodeData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this,
      classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeData($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  /** The trainer/encoder shared end-of-word marker (Sennrich et al. 2016). */
  val EndMark = "</w>"

  /** Word-cache residency ceiling per expression instance: 2^16 encodings
    * of ~10 symbols ≈ a few MB — vocabulary-sized, never corpus-sized. */
  val MaxCachedWords: Int = 1 << 16
}
