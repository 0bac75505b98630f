package graft.functions

import graft.SparkTestSession
import graft.functions.expressions.PqReconstruct
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

/** The poison-row contract of the PQ encode+reconstruct kernel (advice r13):
  * a malformed vector (length not a multiple of nsub) or a malformed
  * codebook row (length != dim) must surface as NULL — through WHOLE-STAGE
  * CODEGEN, not just interpreted eval — and must never kill the stage or
  * silently read out of bounds.
  */
class PqReconstructSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def recon(df: org.apache.spark.sql.DataFrame, nsub: Int) =
    df.select(col("id"), GraftFunctions.column(PqReconstruct(
      GraftFunctions.expression(col("cv")),
      GraftFunctions.expression(col("cbs")),
      nsub)).as("rv"))

  private val cb = Seq(
    Array(0f, 0f, 0f, 0f), // cb 0
    Array(1f, 1f, 1f, 1f)) // cb 1

  test("well-formed rows reconstruct from the nearest codeword per subspace") {
    val df = Seq(
      (1, Array(0.1f, 0.2f, 0.9f, 1.1f), cb),
      (2, Array(1.0f, 0.9f, 0.1f, 0.0f), cb)).toDF("id", "cv", "cbs")
    val out = recon(df, nsub = 2).orderBy("id")
      .as[(Int, Seq[Float])].collect()
    assert(out === Array(
      (1, Seq(0f, 0f, 1f, 1f)),
      (2, Seq(1f, 1f, 0f, 0f))))
  }

  test("malformed vector length → NULL under codegen, good rows unaffected") {
    val df = Seq(
      (1, Array(0.1f, 0.2f, 0.9f), cb), // 3 dims, nsub=2 → poison
      (2, Array(1.0f, 0.9f, 0.1f, 0.0f), cb)).toDF("id", "cv", "cbs")
    val out = recon(df, nsub = 2).orderBy("id")
      .as[(Int, Option[Seq[Float]])].collect()
    assert(out(0) === ((1, None)))
    assert(out(1) === ((2, Some(Seq(1f, 1f, 0f, 0f)))))
    // the exact crash path: a non-null-checked consumer of the result
    assert(recon(df, 2).where(col("rv").isNotNull).count() === 1)
    assert(recon(df, 2).select(size(col("rv"))).where(col("rv").isNotNull)
      .as[Int].collect().toSeq === Seq(4))
  }

  test("short codebook row → NULL, never an out-of-bounds read") {
    val badCb = Seq(Array(0f, 0f, 0f, 0f), Array(1f, 1f)) // row 1 short
    val df = Seq(
      (1, Array(0.1f, 0.2f, 0.9f, 1.1f), badCb),
      (2, Array(1.0f, 0.9f, 0.1f, 0.0f), cb)).toDF("id", "cv", "cbs")
    val out = recon(df, nsub = 2).orderBy("id")
      .as[(Int, Option[Seq[Float]])].collect()
    assert(out(0) === ((1, None)))
    assert(out(1) === ((2, Some(Seq(1f, 1f, 0f, 0f)))))
  }

  test("NULL codebook row → NULL, never an NPE killing the stage") {
    val nullCb = Seq(Array(0f, 0f, 0f, 0f), null)
    val df = Seq(
      (1, Array(0.1f, 0.2f, 0.9f, 1.1f), nullCb),
      (2, Array(1.0f, 0.9f, 0.1f, 0.0f), cb)).toDF("id", "cv", "cbs")
    val out = recon(df, nsub = 2).orderBy("id")
      .as[(Int, Option[Seq[Float]])].collect()
    assert(out(0) === ((1, None)))
    assert(out(1) === ((2, Some(Seq(1f, 1f, 0f, 0f)))))
  }

  test("empty codebook → empty reconstruction (config, not poison)") {
    val df = Seq((1, Array(0.1f, 0.2f), Seq.empty[Array[Float]]))
      .toDF("id", "cv", "cbs")
    val out = recon(df, nsub = 2).as[(Int, Option[Seq[Float]])].collect()
    assert(out(0) === ((1, Some(Seq.empty[Float]))))
  }
}
