package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The bench's stdout artifact lines must stay strictly parseable — the
  * driver tails stdout and JSON-parses each line, and round 18's PERF
  * comparison went blind because round 17's captured line failed
  * `json.loads` (VERDICT r18 #2/#8). [[Bench.checkedLine]] now gates
  * every println; this spec pins its contract.
  */
class BenchLineSpec extends AnyFunSuite with Matchers {

  test("checkedLine accepts a bench-shaped single-line JSON object unchanged") {
    val line = """{"metric":"total","value":269.95,"unit":"sec","queries":{"q01_filter_agg":0.27,"build_x101_posting":1.6},"sf":"/root/testdata/sf0.1"}"""
    Bench.checkedLine(line) shouldBe line
  }

  test("checkedLine rejects truncated JSON, multi-line output, and non-objects") {
    // the r17 failure mode: a line cut mid-value
    an[Exception] should be thrownBy Bench.checkedLine(
      """{"metric":"total","value":269""")
    an[Exception] should be thrownBy Bench.checkedLine(
      "{\"a\":1}\n{\"b\":2}")
    an[Exception] should be thrownBy Bench.checkedLine("[1,2,3]")
    an[Exception] should be thrownBy Bench.checkedLine("not json at all")
  }
}
