package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Actions

/** One-job bounded collect: exactness at the cap boundary and the loud
  * over-cap None across partition layouts (the driver-heap bound itself —
  * discard-on-over in the result handler — is a mechanism property; these
  * pin the semantics it must preserve). */
class ActionsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def df(n: Int, parts: Int) =
    spark.range(0, n.toLong, 1, parts).toDF("v")

  test("under-cap input returns every row exactly once") {
    val got = Actions.boundedRows(df(100, 8), cap = 1000)
    assert(got.isDefined)
    assert(got.get.map(_.getLong(0)).sorted.toSeq == (0L until 100L))
  }

  test("input of exactly cap rows succeeds (boundary)") {
    val got = Actions.boundedRows(df(64, 8), cap = 64)
    assert(got.isDefined && got.get.length == 64)
  }

  test("one row over the cap returns None") {
    assert(Actions.boundedRows(df(65, 8), cap = 64).isEmpty)
  }

  test("over-cap with many partitions, each under the cap, returns None") {
    // every partition individually fits (cap + 1), only the TOTAL is over —
    // the case where the per-partition take alone cannot decide
    assert(Actions.boundedRows(df(320, 32), cap = 300).isEmpty)
  }

  test("empty input returns Some(empty)") {
    assert(Actions.boundedRows(df(0, 4), cap = 10).exists(_.isEmpty))
  }
}
