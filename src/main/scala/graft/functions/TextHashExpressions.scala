package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass tokenizer + hash kernels behind the text-signature expressions.
  *
  * These compute EXACTLY the arithmetic defined by [[Portable]] (the same
  * fragments the DuckDB oracle evaluates): whitespace split on a single
  * space, empty tokens dropped, token hash = length·1000003 + Σ char·31^i
  * over the first 8 chars, mod 1e9+7. The HOF formulation spends ~0.7 ms/doc
  * in `substr`/`ascii` UTF8String allocations; these kernels do one scan of
  * the string per document.
  */
object TokenHasher {
  val HashP: Long = Portable.HashP
  val MinhashP: Long = Portable.MinhashP
  val NumHashes = 16

  private val A: Array[Long] = Array.tabulate(NumHashes)(Portable.minhashA)
  private val B: Array[Long] = Array.tabulate(NumHashes)(Portable.minhashB)

  /** Portable.tokHash over s[from, until). */
  @inline private def tokenHash(s: String, from: Int, until: Int): Long = {
    val len = until - from
    var h = len.toLong * 1000003L
    var p = 31L
    var i = 0
    val m = if (len < 8) len else 8
    while (i < m) { h += s.charAt(from + i).toLong * p; p *= 31L; i += 1 }
    h % HashP
  }

  @inline private[functions] def foreachToken(s: String)(f: (Int, Int) => Unit): Unit = {
    val n = s.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) f(start, i)
        start = i + 1
      }
      i += 1
    }
  }

  /** MinHash signature (16 values) or null for a token-free document —
    * matching `array_min(empty) = NULL` in the declarative form.
    * Dedup is by token HASH, which is minhash-equivalent to dedup by token:
    * a colliding pair contributes the same candidate minimum either way. */
  def minhashSigData(u: UTF8String): ArrayData = {
    val s = u.toString
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    val seen = new java.util.HashSet[java.lang.Long]()
    var any = false
    foreachToken(s) { (from, until) =>
      any = true
      val h = tokenHash(s, from, until)
      if (seen.add(h)) {
        var j = 0
        while (j < NumHashes) {
          val v = (A(j) * h + B(j)) % MinhashP
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
    }
    if (any) new GenericArrayData(sig) else null
  }

  /** 32-bit SimHash (term-frequency weighted). Token-free documents get all
    * bits set — the `coalesce(list_sum, 0) >= 0` convention of the
    * declarative form. */
  def simhash(u: UTF8String): Long = {
    val s = u.toString
    val counts = new Array[Int](32)
    foreachToken(s) { (from, until) =>
      val h = tokenHash(s, from, until)
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 32) { if (counts(b) >= 0) out |= (1L << b); b += 1 }
    out
  }

  /** Rolling polynomial fingerprint; 0 for a token-free document (the fold's
    * initial accumulator). */
  def fingerprint(u: UTF8String): Long = {
    val s = u.toString
    var acc = 0L
    foreachToken(s) { (from, until) =>
      acc = (acc * 31L + tokenHash(s, from, until)) % HashP
    }
    acc
  }

  /** Token offsets in one pass, unboxed: starts/ends int arrays plus count.
    * The per-document hot-path buffers — boxed ArrayList[Integer] here costs
    * two Integer allocations per token on a kernel whose point is avoiding
    * per-token allocation. */
  private final class TokenOffsets(s: String) {
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var n = 0
    foreachToken(s) { (from, until) =>
      if (n == starts.length) {
        starts = java.util.Arrays.copyOf(starts, n * 2)
        ends = java.util.Arrays.copyOf(ends, n * 2)
      }
      starts(n) = from; ends(n) = until; n += 1
    }
  }

  /** Distinct xxhash64'd 3-gram token shingles, one pass, SORTED ascending.
    * Hash values are EXACTLY Spark's `xxhash64(concat_ws(' ', t1, t2, t3))`
    * (same XxHash64 kernel, same seed 42), so this interchanges freely with
    * the declarative shingle pipeline. Per-doc distinct happens here
    * (sort + in-place dedup — no hash-set nodes), removing the need for a
    * distinct shuffle downstream; the sorted order lets
    * [[SortedIntersectCount]] verify candidate pairs with an
    * allocation-free merge scan. */
  def shingleHashes(u: UTF8String): ArrayData = {
    val s = u.toString
    val t = new TokenOffsets(s)
    val k = t.n
    if (k < 3) return new GenericArrayData(Array.emptyLongArray)
    val hashes = new Array[Long](k - 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + 2 < k) {
      sb.setLength(0)
      sb.append(s, t.starts(i), t.ends(i)).append(' ')
        .append(s, t.starts(i + 1), t.ends(i + 1)).append(' ')
        .append(s, t.starts(i + 2), t.ends(i + 2))
      hashes(i) = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        UTF8String.fromString(sb.toString),
        org.apache.spark.sql.types.StringType, 42L)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    var last = 0
    i = 1
    while (i < hashes.length) {
      if (hashes(i) != hashes(last)) { last += 1; hashes(last) = hashes(i) }
      i += 1
    }
    val out =
      if (last + 1 == hashes.length) hashes
      else java.util.Arrays.copyOf(hashes, last + 1)
    new GenericArrayData(out)
  }

  /** Distinct 3-gram token shingles AS STRINGS (human-facing reports like
    * x47, where the hash form won't do), one pass, first-appearance order.
    * Identical to `array_distinct(transform(...concat_ws(' ', t_i..t_i+2)))`
    * over [[Portable.tokens]] output, without the HOF lambda + per-element
    * UTF8String slicing (~5× on the bench corpus). */
  def shingleStrings(u: UTF8String): ArrayData = {
    val s = u.toString
    val t = new TokenOffsets(s)
    val k = t.n
    if (k < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + 2 < k) {
      sb.setLength(0)
      sb.append(s, t.starts(i), t.ends(i)).append(' ')
        .append(s, t.starts(i + 1), t.ends(i + 1)).append(' ')
        .append(s, t.starts(i + 2), t.ends(i + 2))
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Adjacent token pairs ("a b") WITH multiplicity, one pass — the
    * BPE/WordPiece merge-round counting input (x65). Empty for documents
    * under two tokens, so no size filter (and no kernel-bearing pushdown)
    * is needed upstream. */
  def tokenPairs(u: UTF8String): ArrayData = {
    val s = u.toString
    val t = new TokenOffsets(s)
    val k = t.n
    if (k < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](k - 1)
    val sb = new java.lang.StringBuilder(48)
    var i = 0
    while (i + 1 < k) {
      sb.setLength(0)
      sb.append(s, t.starts(i), t.ends(i)).append(' ')
        .append(s, t.starts(i + 1), t.ends(i + 1))
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Adjacent-pair feature buckets, one pass: [[Portable.tokHash]] of the
    * bigram string "w1 w2" mod `buckets`, computed over the VIRTUAL
    * concatenation — the bigram string is never materialized (tokHash reads
    * only the first 8 chars + the length, both derivable from the two token
    * spans). With multiplicity; empty under two tokens. The hashed-bigram
    * feature map of DSIR-style importance weighting (x86). */
  def pairBuckets(u: UTF8String, buckets: Int): ArrayData = {
    val s = u.toString
    val t = new TokenOffsets(s)
    val k = t.n
    if (k < 2) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](k - 1)
    var i = 0
    while (i + 1 < k) {
      val l1 = t.ends(i) - t.starts(i)
      val l2 = t.ends(i + 1) - t.starts(i + 1)
      val len = l1 + 1 + l2
      var h = len.toLong * 1000003L
      var p = 31L
      var j = 0
      val m = if (len < 8) len else 8
      while (j < m) {
        val c =
          if (j < l1) s.charAt(t.starts(i) + j)
          else if (j == l1) ' '
          else s.charAt(t.starts(i + 1) + (j - l1 - 1))
        h += c.toLong * p
        p *= 31L
        j += 1
      }
      out(i) = (h % HashP) % buckets
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprint set (Schleimer et al. SIGMOD'03), one pass:
    * token hashes → base-31 k-gram polynomials mod [[HashP]] → each
    * w-window's minimum → SORTED distinct values. Value-identical to the
    * staged HOF chain `array_distinct(transform(…, least(…)))` over
    * [[Portable.kgramHashes]] output (KernelParitySpec pins it) — distinct
    * SETS are equal; this kernel sorts where array_distinct keeps
    * first-occurrence order, a difference no consumer observes (the set
    * explodes into a groupBy). Empty array for docs with < k+w−1 tokens
    * (no window exists), which also replaces the caller-side token-count
    * filter. The sliding minimum is recomputed per window (O(m·w), w
    * small) on a primitive array — no deque allocation; the arrays here
    * are the per-document transient the HOF chain allocated three of. */
  def winnowSet(u: UTF8String, k: Int, w: Int): ArrayData = {
    val s = u.toString
    val t = new TokenOffsets(s)
    val n = t.n
    if (n < k + w - 1) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = tokenHash(s, t.starts(i), t.ends(i)); i += 1 }
    val pow = new Array[Long](k)
    pow(0) = 1L
    i = 1
    while (i < k) { pow(i) = pow(i - 1) * 31L; i += 1 }
    val m = n - k + 1
    val gs = new Array[Long](m)
    i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      while (j < k) { acc += hs(i + j) * pow(k - 1 - j); j += 1 }
      gs(i) = acc % HashP
      i += 1
    }
    val nw = m - w + 1
    val sel = new Array[Long](nw)
    i = 0
    while (i < nw) {
      var mn = gs(i)
      var j = 1
      while (j < w) { val v = gs(i + j); if (v < mn) mn = v; j += 1 }
      sel(i) = mn
      i += 1
    }
    java.util.Arrays.sort(sel)
    var out = 1
    i = 1
    while (i < nw) {
      if (sel(i) != sel(out - 1)) { sel(out) = sel(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sel, out))
  }

  /** All tokens as strings, one pass, with multiplicity — the
    * `filter(split(text,' '), t -> t <> '')` fragment without the
    * per-token HOF lambda (q13-class term counting). Byte-level: the
    * delimiter 0x20 never occurs inside a UTF-8 multibyte sequence, so
    * splitting on raw bytes is exact, and `UTF8String.fromBytes(b, off,
    * len)` is a zero-copy VIEW — the whole pass does no String
    * decode/encode at all (the String round-trip was ~40% of the q13
    * corpus stage at sf1). */
  def allTokens(u: UTF8String): ArrayData = {
    val b = u.getBytes
    val n = b.length
    val out = new java.util.ArrayList[AnyRef]()
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == ' ') {
        if (i > start) out.add(UTF8String.fromBytes(b, start, i - start))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Token COUNT without materializing anything — the
    * `size(filter(split(text,' '), t -> t <> ''))` value as one byte scan
    * (counts maximal runs of non-0x20 bytes; exact for UTF-8 since the
    * delimiter never occurs inside a multibyte sequence). The n_tokens
    * input of packing/length-bucketing queries (x79-class), where even the
    * zero-copy token-view array is pure overhead. */
  def tokenCount(u: UTF8String): Long = {
    val b = u.getBytes
    val n = b.length
    var cnt = 0L
    var inTok = false
    var i = 0
    while (i < n) {
      if (b(i) == ' ') inTok = false
      else if (!inTok) { cnt += 1; inTok = true }
      i += 1
    }
    cnt
  }

  /** "BPE-ish" regex token COUNT — the
    * `size(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]', 0))` value as
    * one byte scan, no Pattern machinery and no token-array
    * materialization (x25's profile: the regex + split array allocations
    * were the whole 39-task-stage cost at sf5). Counting rule, matching
    * the Java-regex alternation exactly: each maximal run of [a-z0-9]
    * counts once; every other character except ' ' counts once per CODE
    * POINT (UTF-8 lead bytes — `(b & 0xC0) != 0x80` — count, continuation
    * bytes don't, which is also how java.util.regex matches a negated
    * class against a surrogate pair: one match per code point). */
  def bpeTokenCount(u: UTF8String): Long = {
    val b = u.getBytes
    val n = b.length
    var cnt = 0L
    var inRun = false
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c == ' ') inRun = false
      else if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (!inRun) cnt += 1
        inRun = true
      } else {
        inRun = false
        if ((c & 0xC0) != 0x80) cnt += 1
      }
      i += 1
    }
    cnt
  }

  /** Distinct tokens as strings, one pass, first-appearance order —
    * `array_distinct(tokens)` without materializing the full token array
    * (the document-frequency input of x39/x47-class queries). */
  def distinctTokens(u: UTF8String): ArrayData = {
    val s = u.toString
    val seen = new java.util.LinkedHashSet[UTF8String]()
    foreachToken(s) { (from, until) =>
      seen.add(UTF8String.fromString(s.substring(from, until)))
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** Column-facing wrappers for the signature expressions. */
object TextHashFunctions {
  import org.apache.spark.sql.{Column, GraftSqlBridge => B}
  def minhashSig(c: Column): Column = B.column(MinHashSig(B.expression(c)))
  def simhash(c: Column): Column = B.column(SimHash(B.expression(c)))
  def fingerprint(c: Column): Column = B.column(Fingerprint(B.expression(c)))
  def jsonLong(c: Column, key: String): Column =
    B.column(JsonLongField(B.expression(c), key))
  def shingleSet(c: Column): Column = B.column(ShingleSet(B.expression(c)))
  def shingleStrings(c: Column): Column = B.column(ShingleStrings(B.expression(c)))
  def distinctTokens(c: Column): Column = B.column(DistinctTokens(B.expression(c)))
  def tokenPairs(c: Column): Column = B.column(TokenPairs(B.expression(c)))
  def pairBuckets(c: Column, buckets: Int): Column =
    B.column(PairBuckets(B.expression(c), buckets))
  def winnowSet(c: Column, k: Int, w: Int): Column =
    B.column(WinnowSet(B.expression(c), k, w))
  def allTokens(c: Column): Column = B.column(AllTokens(B.expression(c)))
  def tokenCount(c: Column): Column = B.column(TokenCount(B.expression(c)))
  def bpeTokenCount(c: Column): Column = B.column(BpeTokenCount(B.expression(c)))
  def shinglePrefix(c: Column,
                    dfMap: org.apache.spark.broadcast.Broadcast[(Array[Long], Array[Long])],
                    tEff: Double): Column =
    B.column(ShinglePrefix(B.expression(c), dfMap, tEff))
  def langStats(c: Column): Column = B.column(LangStats(B.expression(c)))
}

/** Base for the string→signature expressions: codegen emits a single static
  * call into the kernel, keeping the operator inside WholeStageCodegen. */
sealed abstract class TextHashExpression extends UnaryExpression {
  /** Fully-qualified static method on TokenHasher. */
  protected def kernel: String

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.TokenHasher.$kernel($c);")
}

/** 16-element MinHash signature, null for token-free input. */
case class MinHashSig(child: Expression) extends TextHashExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"
  protected def kernel: String = "minhashSigData"

  // Null even for a NON-null input (token-free doc); the inherited
  // child.nullable would let the optimizer fold away the IsNotNull guard
  // dedupMinhash depends on.
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TokenHasher.minhashSigData(input.asInstanceOf[UTF8String])

  // the kernel returns null for token-free docs even when the input is
  // non-null, so null tracking must re-check the produced value
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      $javaType ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.TokenHasher.minhashSigData(${c.value});
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 32-bit SimHash as a long. */
case class SimHash(child: Expression) extends TextHashExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  protected def kernel: String = "simhash"
  override def nullSafeEval(input: Any): Any =
    TokenHasher.simhash(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** Distinct xxhash64'd 3-gram shingle set as array<long> (never null for a
  * non-null input; empty array for docs shorter than 3 tokens). */
case class ShingleSet(child: Expression) extends TextHashExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"
  protected def kernel: String = "shingleHashes"
  override def nullSafeEval(input: Any): Any =
    TokenHasher.shingleHashes(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** Distinct 3-gram shingles as array<string>, first-appearance order. */
case class ShingleStrings(child: Expression) extends TextHashExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_strings"
  protected def kernel: String = "shingleStrings"
  override def nullSafeEval(input: Any): Any =
    TokenHasher.shingleStrings(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
}

/** All tokens as array<string>, with multiplicity. */
case class AllTokens(child: Expression) extends TextHashExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"
  protected def kernel: String = "allTokens"
  override def nullSafeEval(input: Any): Any =
    TokenHasher.allTokens(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): AllTokens =
    copy(child = newChild)
}

/** Token count as a long — one byte scan, no array. */
case class TokenCount(child: Expression) extends TextHashExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_token_count"
  protected def kernel: String = "tokenCount"
  override def nullSafeEval(input: Any): Any =
    TokenHasher.tokenCount(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

/** Regex ("BPE-ish") token count as a long — one byte scan, no Pattern. */
case class BpeTokenCount(child: Expression) extends TextHashExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_token_count"
  protected def kernel: String = "bpeTokenCount"
  override def nullSafeEval(input: Any): Any =
    TokenHasher.bpeTokenCount(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** Adjacent token pairs as array<string>, with multiplicity. */
case class TokenPairs(child: Expression) extends TextHashExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_token_pairs"
  protected def kernel: String = "tokenPairs"
  override def nullSafeEval(input: Any): Any =
    TokenHasher.tokenPairs(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): TokenPairs =
    copy(child = newChild)
}

/** Adjacent-pair tokHash feature buckets as array<long>, with multiplicity.
  * `buckets` is a plan-time constant, so codegen embeds it as a literal. */
case class PairBuckets(child: Expression, buckets: Int)
    extends TextHashExpression {
  require(buckets > 0, s"buckets must be positive, got $buckets")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pair_buckets"
  protected def kernel: String = "pairBuckets"
  override def nullSafeEval(input: Any): Any =
    TokenHasher.pairBuckets(input.asInstanceOf[UTF8String], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.TokenHasher.pairBuckets($c, $buckets);")
  override protected def withNewChildInternal(newChild: Expression): PairBuckets =
    copy(child = newChild)
}

/** Sorted distinct winnowing fingerprints as array<long>; empty for docs
  * with fewer than k+w−1 tokens. k and w are plan-time constants, so
  * codegen embeds them as literals. */
case class WinnowSet(child: Expression, k: Int, w: Int)
    extends TextHashExpression {
  require(k >= 2 && k <= 6, s"k-gram width out of range: $k")
  require(w >= 2, s"winnow window out of range: $w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_set"
  protected def kernel: String = "winnowSet"
  override def nullSafeEval(input: Any): Any =
    TokenHasher.winnowSet(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.TokenHasher.winnowSet($c, $k, $w);")
  override protected def withNewChildInternal(newChild: Expression): WinnowSet =
    copy(child = newChild)
}

/** Distinct tokens as array<string>, first-appearance order. */
case class DistinctTokens(child: Expression) extends TextHashExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_distinct_tokens"
  protected def kernel: String = "distinctTokens"
  override def nullSafeEval(input: Any): Any =
    TokenHasher.distinctTokens(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): DistinctTokens =
    copy(child = newChild)
}

/** Order-sensitive rolling-hash fingerprint as a long. */
case class Fingerprint(child: Expression) extends TextHashExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"
  protected def kernel: String = "fingerprint"
  override def nullSafeEval(input: Any): Any =
    TokenHasher.fingerprint(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Fingerprint =
    copy(child = newChild)
}
