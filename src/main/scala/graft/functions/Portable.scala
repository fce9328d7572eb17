package graft.functions

/** Two-dialect SQL fragment generator.
  *
  * The extended operators (MinHash/LSH dedup, SimHash, fingerprinting,
  * hyperplane LSH for ANN) are checked against a DuckDB oracle by exact value
  * hash (SURVEY.md §2.12). The only way to make a *hash-based* signature
  * match across two engines is for both to evaluate the **same arithmetic** —
  * so each fragment here is defined once and rendered into the Spark SQL
  * dialect (executed via `expr(...)`, staying fully inside Catalyst's native
  * higher-order functions) and into the DuckDB dialect (embedded in the
  * oracle SQL). No UDFs anywhere: everything is `split`/`transform`/
  * `aggregate`/`array_min` on the Spark side and `string_split`/
  * `list_transform`/`list_reduce`/`list_min` on the DuckDB side.
  *
  * All hashes are pure integer arithmetic over `ascii(substr(...))` probes —
  * portable because `length`, `ascii`, `substr`, `%` behave identically on
  * ASCII inputs in both engines, and every intermediate stays within Long
  * range (token hash < 1e9+7, multiplier < 2^20 ⇒ products < 2^50).
  */
object Portable {

  val HashP = 1000000007L   // token-hash modulus
  val MinhashP = 2147483647L // minhash modulus (2^31 - 1)

  /** 31^i for the fixed-width polynomial character hash. */
  private val pow31: Array[Long] = Iterator.iterate(1L)(_ * 31).take(9).toArray

  // ------------------------------------------------------------ dialects

  sealed trait Dialect {
    /** split on a single space (documents.text is space-joined tokens) */
    def splitWs(col: String): String
    def filter(arr: String, v: String, pred: String): String
    def transform(arr: String, v: String, body: String): String
    def distinct(arr: String): String
    def arrayMin(arr: String): String
    def arraySize(arr: String): String
    def listSum(arr: String): String
    /** left fold with initial bigint 0 */
    def fold0(arr: String, acc: String, v: String, body: String): String
    /** 1-based element access (Spark element_at / DuckDB 1-based indexing) */
    def elemAt(arr: String, i: String): String
    /** the array [1, 2, …, n] (empty when n < 1 — callers must still guard
      * Spark's `sequence`, which DESCENDS for n < 1 instead of emptying) */
    def range1(n: String): String
  }

  object Spark extends Dialect {
    def splitWs(col: String) = s"split($col, ' ')"
    def filter(arr: String, v: String, pred: String) = s"filter($arr, $v -> $pred)"
    def transform(arr: String, v: String, body: String) = s"transform($arr, $v -> $body)"
    def distinct(arr: String) = s"array_distinct($arr)"
    def arrayMin(arr: String) = s"array_min($arr)"
    def arraySize(arr: String) = s"size($arr)"
    def listSum(arr: String) = s"aggregate($arr, CAST(0 AS BIGINT), (s, x) -> s + x)"
    def fold0(arr: String, acc: String, v: String, body: String) =
      s"aggregate($arr, CAST(0 AS BIGINT), ($acc, $v) -> $body)"
    def elemAt(arr: String, i: String) = s"element_at($arr, $i)"
    def range1(n: String) = s"sequence(1, $n)"
  }

  object Duck extends Dialect {
    def splitWs(col: String) = s"string_split($col, ' ')"
    def filter(arr: String, v: String, pred: String) = s"list_filter($arr, $v -> $pred)"
    def transform(arr: String, v: String, body: String) = s"list_transform($arr, $v -> $body)"
    def distinct(arr: String) = s"list_distinct($arr)"
    def arrayMin(arr: String) = s"list_min($arr)"
    def arraySize(arr: String) = s"length($arr)"
    def listSum(arr: String) = s"coalesce(list_sum($arr), 0)"
    def fold0(arr: String, acc: String, v: String, body: String) =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), $arr), ($acc, $v) -> $body)"
    def elemAt(arr: String, i: String) = s"$arr[$i]"
    def range1(n: String) = s"range(1, ($n) + 1)"
  }

  // ------------------------------------------------------- shared pieces

  /** Whitespace tokens with empties dropped. */
  def tokens(d: Dialect, col: String): String =
    d.filter(d.splitWs(col), "t", "t <> ''")

  /** Portable token hash: polynomial over the first 8 chars + a length term,
    * mod 1e9+7. `ascii(substr(t,i,1))` = 0 past end-of-string in both
    * engines, so short tokens hash consistently.
    */
  def tokHash(v: String): String = {
    // CAST to BIGINT before multiplying: ascii() is INT32 and Spark runs
    // ANSI mode by default, so an INT32 product would overflow-error.
    val charTerms = (1 to 8).map(i =>
      s"CAST(ascii(substr($v, $i, 1)) AS BIGINT) * ${pow31(i)}")
    s"((CAST(length($v) AS BIGINT) * 1000003 + ${charTerms.mkString(" + ")}) % $HashP)"
  }

  /** Array of token hashes (order-preserving, or set semantics if distinct). */
  def tokenHashes(d: Dialect, col: String, distinctTokens: Boolean): String = {
    val ts = if (distinctTokens) d.distinct(tokens(d, col)) else tokens(d, col)
    d.transform(ts, "t", tokHash("t"))
  }

  // --------------------------------------------------------- minhash/LSH

  /** Fixed universal-hash coefficients (deterministic arithmetic, no RNG so
    * code and oracle can never drift). */
  def minhashA(j: Int): Long = 1L + ((j + 1) * 2654435761L) % 999983L
  def minhashB(j: Int): Long = ((j + 1) * 40503L * 7919L) % 999979L

  /** j-th minhash over a column holding the (distinct) token-hash array. */
  def minhash(d: Dialect, hashesCol: String, j: Int): String =
    d.arrayMin(d.transform(hashesCol, "h",
      s"(${minhashA(j)} * h + ${minhashB(j)}) % $MinhashP"))

  /** Band key = minhashes of one band concatenated into a string. */
  def bandKey(sigCols: Seq[String]): String =
    s"concat_ws(':', ${sigCols.mkString(", ")})"

  // ------------------------------------------------------------- simhash

  /** ±1 bit-sum for bit `b` over a token-hash-array column (with dups —
    * simhash weights by term frequency). Bit test via mod/compare so no
    * shift operators are needed: bit b of h set ⇔ h % 2^(b+1) >= 2^b. */
  def simhashBitSum(d: Dialect, hashesCol: String, b: Int): String = {
    val lo = 1L << b
    val hi = 1L << (b + 1)
    d.listSum(d.transform(hashesCol, "h",
      s"CASE WHEN (h % $hi) >= $lo THEN 1 ELSE -1 END"))
  }

  /** Assemble the 32-bit simhash from per-bit sum columns (majority vote). */
  def simhashFromBitSums(bitSumCols: Seq[String]): String =
    bitSumCols.zipWithIndex.map { case (c, b) =>
      s"(CASE WHEN $c >= 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  // --------------------------------------------------------- fingerprint

  /** Rolling polynomial hash over the ordered token-hash array — a whole-
    * document fingerprint (token-order sensitive, unlike the set-based
    * minhash). */
  def fingerprint(d: Dialect, hashesCol: String): String =
    d.fold0(hashesCol, "acc", "h", s"(acc * 31 + h) % $HashP")

  // ----------------------------------------------------------- winnowing

  /** k-gram rolling hashes over an ordered token-hash array column:
    * position i (1-based, i ≤ len−k+1) hashes tokens i..i+k−1 as a base-31
    * polynomial mod [[HashP]]. Bounds: each element < 2³⁰, the largest term
    * < 2³⁰·31^(k−1) and the k-term sum stays under 2⁶³ only for k ≤ 6
    * (k = 4: sum < 2⁴⁷) — hence the cap, Spark runs ANSI mode and an
    * overflow is an ERROR. Callers must pre-filter to arrays of ≥ k
    * elements (Spark's `sequence(1, n)` DESCENDS for n < 1 rather than
    * producing an empty array). */
  def kgramHashes(d: Dialect, hashesCol: String, k: Int): String = {
    require(k >= 2 && k <= 6, s"k-gram width out of range: $k")
    val terms = (0 until k).map(j =>
      s"${d.elemAt(hashesCol, s"i + $j")} * ${pow31(k - 1 - j)}")
    d.transform(d.range1(s"${d.arraySize(hashesCol)} - ${k - 1}"), "i",
      s"(${terms.mkString(" + ")}) % $HashP")
  }

  /** Winnowing selection (Schleimer, Wilkerson & Aiken, SIGMOD'03): the
    * distinct minima of every w-length sliding window over the k-gram hash
    * array — the document's fingerprint set. Selecting by VALUE (not the
    * paper's rightmost-position rule) yields the identical value set, which
    * is all that downstream set comparison consumes. Callers pre-filter to
    * ≥ w k-grams (same Spark `sequence` guard as [[kgramHashes]]). */
  def winnow(d: Dialect, kgramsCol: String, w: Int): String = {
    require(w >= 2, s"winnow window out of range: $w")
    // least() over w direct element accesses, not arrayMin(slice(...)):
    // the slice form allocates a w-array per window position (measured on
    // x89's kernel stage); least() is branch arithmetic inside codegen
    val elems = (0 until w).map(j => d.elemAt(kgramsCol, s"j + $j"))
    d.distinct(d.transform(
      d.range1(s"${d.arraySize(kgramsCol)} - ${w - 1}"), "j",
      s"least(${elems.mkString(", ")})"))
  }

  // ----------------------------------------------------------- BM25 / PMI

  /** BM25 per-term score (Robertson–Spärck Jones idf, k1 = 1.2, b = 0.75),
    * rounded to 6 decimals: both engines evaluate this literally identical
    * double arithmetic, then cast to DECIMAL(18,6) and sum exactly (x81's
    * determinism discipline). Operand names are SQL sub-expressions over
    * BIGINT columns: tf/df per term, dl = doc length, n = corpus doc count,
    * sumdl = corpus token count (avgdl enters as sumdl/n). */
  def bm25Term(tf: String, df: String, n: String, dl: String,
               sumdl: String): String =
    s"round(ln((CAST($n AS DOUBLE) - CAST($df AS DOUBLE) + 0.5) / " +
      s"(CAST($df AS DOUBLE) + 0.5) + 1.0) * " +
      s"((CAST($tf AS DOUBLE) * 2.2) / (CAST($tf AS DOUBLE) + 1.2 * " +
      s"(0.25 + 0.75 * CAST($dl AS DOUBLE) / " +
      s"(CAST($sumdl AS DOUBLE) / CAST($n AS DOUBLE))))), 6)"

  /** Pointwise mutual information of a bigram, rounded to 6 decimals:
    * ln(p(w1w2) / (p(w1)·p(w2))) with p from corpus counts — written as ONE
    * quotient of products so both engines share the double rounding path
    * (c12·tu·tu can exceed BIGINT at corpus scale; the products are DOUBLE).
    * c12/tb are bigram count/total, c1/c2/tu unigram counts/total. */
  def pmi(c12: String, c1: String, c2: String, tb: String,
          tu: String): String =
    s"round(ln((CAST($c12 AS DOUBLE) * CAST($tu AS DOUBLE) * " +
      s"CAST($tu AS DOUBLE)) / (CAST($tb AS DOUBLE) * " +
      s"CAST($c1 AS DOUBLE) * CAST($c2 AS DOUBLE))), 6)"

  // ----------------------------------------------- hyperplane LSH planes

  /** Deterministic pseudo-random hyperplane component in [-1, 1]:
    * plane i, dimension k. Same closed form feeds the Spark literal array
    * and the DuckDB literal list. */
  def planeComponent(i: Int, k: Int, dim: Int): Double =
    ((((i.toLong * dim + k + 1) * 2654435761L) % 2000001L) - 1000000L) / 1.0e6

  def plane(i: Int, dim: Int): Array[Double] =
    Array.tabulate(dim)(k => planeComponent(i, k, dim))
}
