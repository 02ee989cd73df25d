package graft

import org.scalatest.funsuite.AnyFunSuite

/** Proves the bench harness's trust properties directly (round-3 VERDICT
  * done-criterion: "a crashing query visibly errors"): a throwing query
  * lands in the error map and NEVER reports a timing; min-of-N picks the
  * fastest healthy sample; a query that fails intermittently still reports
  * its successful minimum AND its error.
  */
class BenchSpec extends AnyFunSuite {

  test("a crashing query is recorded as an error, never as a timing") {
    val (timings, errors) = Bench.measure(Seq(
      "ok" -> (() => ()),
      "boom" -> (() => throw new IllegalStateException("exploded"))),
      repeats = 3)
    assert(timings.map(_._1) == Vector("ok"))
    assert(errors.keySet == Set("boom"))
    assert(errors("boom").contains("IllegalStateException"))
    assert(errors("boom").contains("exploded"))
  }

  test("min-of-N reports the fastest sample") {
    var calls = 0
    val (timings, errors) = Bench.measure(Seq(
      "warming" -> (() => {
        calls += 1
        if (calls == 1) Thread.sleep(80) // slow first sample (cold)
      })), repeats = 3)
    assert(errors.isEmpty)
    assert(calls == 3)
    val t = timings.toMap.apply("warming")
    assert(t < 0.05, s"min-of-3 should drop the 80ms cold sample, got $t s")
  }

  test("an intermittently failing query reports both its minimum and its error") {
    var calls = 0
    val (timings, errors) = Bench.measure(Seq(
      "flaky" -> (() => {
        calls += 1
        if (calls == 2) throw new RuntimeException("transient")
      })), repeats = 3)
    assert(timings.map(_._1) == Vector("flaky"))
    assert(errors.keySet == Set("flaky"))
  }
}
