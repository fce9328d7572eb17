package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-query stall defense (VERDICT r9 directive 1), exercised on the
  * synthetic shape of the real incident: BENCH_r09 published x29 at 7.87 s
  * where the same code measures 0.317 s — a host stall spanning all five
  * timed runs, which best-of-5 cannot mask and which poisoned the headline
  * total for any reader without BASELINE.md forensics. `stallSuspects` is
  * the pure decision function Bench.main applies after the set (flagged
  * queries are re-run once, the published value is the min, and the names
  * are published in "stall_suspect" either way). */
class BenchStallSpec extends AnyFunSuite {

  // BENCH_r09's actual numbers: history 0.3169 (pair 35 class), floor_post
  // 0.10, measured best-of-5 7.87 — threshold max(5*0.3169, 10*0.10) =
  // 1.58, so the slot is flagged.
  test("synthetic x29 host stall is flagged against its history value") {
    val res = Seq("x29_scalar_kit" -> 7.87, "x18_dedup_minhash" -> 1.28)
    val prev = Map("x29_scalar_kit" -> 0.3169, "x18_dedup_minhash" -> 1.20)
    assert(Bench.stallSuspects(res, prev, floorPost = 0.10) ===
      Seq("x29_scalar_kit"))
  }

  test("a heavy-but-normal query within 5x of history is not flagged") {
    val prev = Map("x18_dedup_minhash" -> 1.28)
    assert(Bench.stallSuspects(
      Seq("x18_dedup_minhash" -> 1.45), prev, 0.10).isEmpty)
  }

  test("no history row (bootstrap run at a new SF) never flags") {
    assert(Bench.stallSuspects(
      Seq("x29_scalar_kit" -> 7.87), Map.empty, 0.10).isEmpty)
  }

  test("10x floor_post lower-bounds the threshold for sub-floor histories") {
    // history 0.02 -> 5x = 0.10 would flag ordinary floor jitter; the
    // floor term raises the threshold to 1.0 s
    val prev = Map("q03_eq_filter" -> 0.02)
    assert(Bench.stallSuspects(Seq("q03_eq_filter" -> 0.30), prev, 0.10).isEmpty)
    assert(Bench.stallSuspects(Seq("q03_eq_filter" -> 1.20), prev, 0.10) ===
      Seq("q03_eq_filter"))
  }

  test("a failed query (-1) is reported by its own channel, never as a stall") {
    val prev = Map("x29_scalar_kit" -> 0.3169)
    assert(Bench.stallSuspects(Seq("x29_scalar_kit" -> -1.0), prev, 0.10).isEmpty)
  }

  test("history TSV round-trips through render/parse and merges min-ever") {
    val h = Map(
      "sf0.1" -> Map("x29_scalar_kit" -> 0.3169, "x18_dedup_minhash" -> 1.28),
      "testdata_sf5" -> Map("x17_dedup_exact" -> 1.02))
    val parsed = Bench.parseHistory(Bench.renderHistory(h))
    assert(parsed.keySet === h.keySet)
    for ((sf, m) <- h; (q, v) <- m)
      assert(math.abs(parsed(sf)(q) - v) < 5e-5, s"$sf/$q")

    // min-ever: a stalled confirmed value (7.87) must NOT raise history;
    // an improvement (0.25) must lower it; failures (-1) never enter
    val merged = Bench.mergeHistory(h, "sf0.1", Seq(
      "x29_scalar_kit" -> 7.87, "x18_dedup_minhash" -> 0.25,
      "q01_project_rename" -> 0.61, "x39_tfidf" -> -1.0))
    assert(merged("sf0.1")("x29_scalar_kit") === 0.3169)
    assert(merged("sf0.1")("x18_dedup_minhash") === 0.25)
    assert(merged("sf0.1")("q01_project_rename") === 0.61)
    assert(!merged("sf0.1").contains("x39_tfidf"))
    assert(merged("testdata_sf5") === h("testdata_sf5"))
  }

  test("malformed history lines are skipped, never fatal") {
    val text = "# comment\nsf0.1\tx29_scalar_kit\t0.3169\n" +
      "garbage line\nsf0.1\tx18_dedup_minhash\tNaN-ish\n\n"
    val parsed = Bench.parseHistory(text)
    assert(parsed === Map("sf0.1" -> Map("x29_scalar_kit" -> 0.3169)))
  }

  test("duplicate (sf, query) history rows reduce by MIN, not last-wins — " +
    "a hand-merged duplicate must never raise a stall threshold") {
    val text = "sf0.1\tx29_scalar_kit\t0.3169\n" +
      "sf0.1\tx29_scalar_kit\t7.8700\n" + // stalled row merged in later
      "sf0.1\tx29_scalar_kit\t0.4000\n"
    val parsed = Bench.parseHistory(text)
    assert(parsed === Map("sf0.1" -> Map("x29_scalar_kit" -> 0.3169)))
  }
}
