package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GraftExtensionsSpec extends AnyFunSuite with Matchers {

  test("a session built with GraftExtensions resolves graft_* in plain SQL") {
    // getOrCreate returns any existing default session and silently skips
    // extensions — clear it so a genuinely new SparkSession (sharing the
    // JVM's SparkContext) is built through the extensions path, then
    // restore the default for the other suites
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = spark.sql("SELECT graft_poly_hash('abc') AS h, " +
        "graft_intersect_size(array(1L,2L,3L), array(2L,3L,4L)) AS i")
        .collect().head
      r.getLong(0) shouldBe 96354L
      r.getInt(1) shouldBe 2
    } finally {
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }
}
