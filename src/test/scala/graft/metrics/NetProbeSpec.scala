package graft.metrics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class NetProbeSpec extends AnyFunSuite with Matchers {

  test("tcp probe moves bytes and reports a positive bound") {
    // short window: the spec checks plumbing, not the bound's stability
    NetProbe.tcpGbps(streams = 2, durationMs = 200L) should be > 0.0
  }

  test("http probe moves framed bytes and reports a positive bound") {
    NetProbe.httpGbps(streams = 2, durationMs = 200L) should be > 0.0
  }
}
