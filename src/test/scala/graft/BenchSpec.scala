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

  test("stdout line fits the driver's 2000-char tail window at full query count") {
    // Full-length names like the real registry; the driver keeps only the
    // last ~2000 chars of stdout and there is a trailing sbt [success] line,
    // so the budget is ~1900 chars.
    val ts = (1 to 90).map(i => (f"q$i%02d_some_representative_query_name", 12.345678901)).toVector
    val (stdout, file) = Bench.render(ts, Map.empty, "/root/testdata/sf0.1")
    assert(stdout.length < 1900, s"stdout line too long: ${stdout.length}")
    assert(stdout.contains("\"q01\":12.346"))
    assert(!stdout.contains("some_representative"))
    assert(file.contains("\"q01_some_representative_query_name\":12.345678901"))
  }

  test("short keys fall back to full names on prefix clash") {
    val ts = Vector(("q01_a", 1.0), ("q01_b", 2.0))
    val (stdout, _) = Bench.render(ts, Map.empty, "sf")
    assert(stdout.contains("\"q01_a\":1") && stdout.contains("\"q01_b\":2"))
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
