package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BitLev

/** Exactness of the Myers/Hyyrö bit-parallel Levenshtein against the
  * classic two-row DP, across block boundaries (m = 63/64/65/128/129…),
  * alphabets (binary → wide), and code-point semantics (supplementary
  * chars), plus DataFrame parity with Spark's builtin `levenshtein` —
  * x41's oracle stays the builtin's semantics. */
class MyersLevenshteinSpec extends AnyFunSuite {
  import SparkTestSession.spark

  /** Reference: textbook two-row DP over code points. */
  private def dp(a: String, b: String): Int = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    var prev = Array.tabulate(y.length + 1)(identity)
    val cur = new Array[Int](y.length + 1)
    for (i <- 1 to x.length) {
      cur(0) = i
      for (j <- 1 to y.length) {
        val sub = prev(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(y.length)
  }

  test("edge cases: empties, identical, prefix/suffix strips, one-char") {
    assert(BitLev.distance("", "") == 0)
    assert(BitLev.distance("", "abc") == 3)
    assert(BitLev.distance("abc", "") == 3)
    assert(BitLev.distance("abc", "abc") == 0)
    assert(BitLev.distance("abc", "abd") == 1)
    assert(BitLev.distance("kitten", "sitting") == 3)
    assert(BitLev.distance("flaw", "lawn") == 2)
    // full-prefix / full-suffix containment (strip leaves an empty pattern)
    assert(BitLev.distance("abcdef", "abc") == 3)
    assert(BitLev.distance("def", "abcdef") == 3)
  }

  test("random strings match the DP across block boundaries and alphabets") {
    val rnd = new scala.util.Random(41)
    val alphabets = Seq("ab", "abcde", "abcdefghijklmnopqrstuvwxyz0123456789")
    // lengths straddling the 64-bit block edges where blocked carries live
    val lengths = Seq(0, 1, 2, 7, 31, 63, 64, 65, 100, 127, 128, 129, 200, 300)
    for (al <- alphabets; la <- lengths; _ <- 0 until 3) {
      val lb = lengths(rnd.nextInt(lengths.length))
      val a = (0 until la).map(_ => al(rnd.nextInt(al.length))).mkString
      val b = (0 until lb).map(_ => al(rnd.nextInt(al.length))).mkString
      assert(BitLev.distance(a, b) == dp(a, b),
        s"len ${a.length}/${b.length} alphabet ${al.length}")
    }
  }

  test("edited near-dups (the x41 population): planted edits at exact cost") {
    val rnd = new scala.util.Random(43)
    val base = (0 until 500).map(_ => ('a' + rnd.nextInt(20)).toChar).mkString
    // k random substitutions at distinct positions = distance exactly k
    for (k <- Seq(1, 5, 17, 64, 100)) {
      val pos = rnd.shuffle((0 until base.length).toList).take(k)
      val edited = base.toCharArray
      pos.foreach(p => edited(p) = if (base(p) == 'z') 'y' else (base(p) + 1).toChar)
      val e = new String(edited)
      assert(BitLev.distance(base, e) == dp(base, e))
      assert(BitLev.distance(base, e) <= k) // ≤ k (adjacent edits can merge)
    }
  }

  test("non-ASCII and supplementary code points take the map path exactly") {
    val pairs = Seq(
      ("héllo wörld", "hello world"),
      ("日本語のテキスト", "日本語テキスト"),
      ("a😀b", "ab"), // emoji = ONE code point, distance 1
      ("😀😁", "😀"),
      ("ascii then ünïcode", "ascii then unicode"))
    for ((a, b) <- pairs) {
      assert(BitLev.distance(a, b) == dp(a, b), s"'$a' vs '$b'")
      assert(BitLev.distance(b, a) == dp(a, b))
    }
  }

  test("DataFrame parity with the builtin levenshtein on the docs corpus " +
    "shape, nulls stay null") {
    import org.apache.spark.sql.{GraftSqlBridge => B}
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    def doc() = (0 until 70 + rnd.nextInt(470))
      .map(_ => ('a' + rnd.nextInt(24)).toChar).mkString
    val rows = (0 until 60).map(i => (i.toLong, doc(), doc())) :+
      ((60L, null: String, "x")) :+ ((61L, "x", null: String))
    val df = rows.toDF("id", "ta", "tb")
    val myers = B.column(graft.functions.MyersLevenshtein(
      B.expression(col("ta")), B.expression(col("tb"))))
    val bad = df.select(col("id"), myers.as("m"),
        levenshtein(col("ta"), col("tb")).as("l"))
      .where(not(col("m") <=> col("l"))).count()
    assert(bad == 0)
  }
}
