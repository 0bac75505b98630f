package graft.functions

import graft.SparkTestSession
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TextFunctionsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("HLL sketch path: approx_count_distinct lands within rsd of exact") {
    // the 100 TB cardinality path — a mergeable sketch instead of a
    // hash-shuffle distinct; not oracle-gated (engine-specific sketch),
    // bounded here against the exact count
    val docs = spark.read.parquet(s"${SparkTestSession.sf001}/documents.parquet")
    val tokens = docs.select(explode(split(col("text"), " ")).as("token"))
    val exact = tokens.distinct().count()
    val approx = tokens.agg(approx_count_distinct("token", 0.02)).collect().head.getLong(0)
    math.abs(approx - exact).toDouble / exact should be < 0.1
    // and the fingerprint column's HLL agrees with its exact distinct too
    val fpExact = docs.select(fingerprint("text")).distinct().count()
    val fpApprox = docs.agg(approx_count_distinct(fingerprint("text"), 0.02))
      .collect().head.getLong(0)
    math.abs(fpApprox - fpExact).toDouble / fpExact should be < 0.1
  }

  /** Reference implementation of the shared rolling hash. */
  private def polyRef(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % Prime)

  test("fingerprint matches the scalar reference implementation") {
    val texts = Seq("abc", "the quick brown fox", "a", "spark near storage")
    val got = texts.toDF("text").select(fingerprint("text")).as[Long].collect()
    got.toSeq shouldBe texts.map(polyRef)
    polyRef("abc") shouldBe 96354L // = java.lang.String#hashCode of "abc"
  }

  test("hashes iterate Unicode CODE POINTS, matching the HOF/oracle legs on non-BMP text") {
    // Spark's split('')+ascii leg and DuckDB's string_split('')+ascii
    // oracle fragment both yield code points ('a😀b' → 97, 128512, 98);
    // the native kernels iterated UTF-16 units until round 13, which
    // diverged on any non-BMP character (surrogate pair 55357/56832
    // instead of 128512) — this pins all three legs to one answer.
    val s = "a😀b" // a😀b
    val cpRef = Seq(97L, 128512L, 98L)
      .foldLeft(0L)((acc, c) => (acc * 31 + c) % Prime)
    // native expression
    Seq(s).toDF("text").select(expr("graft_poly_hash(text)")).as[Long]
      .collect().head shouldBe cpRef
    // Spark HOF leg (the TextFunctions formulation)
    Seq(s).toDF("text").select(expr(
      s"aggregate(transform(split(text, ''), ch -> CAST(ascii(ch) AS BIGINT)), " +
        s"0L, (acc, ch) -> (acc * 31 + ch) % $Prime)")).as[Long]
      .collect().head shouldBe cpRef
    // char n-grams window over code points too: 'a😀b' has exactly two
    // 2-grams (a😀, 😀b), not three UTF-16-unit windows
    Seq(s).toDF("text").select(expr("graft_char_ngram_hashes(text, 2)"))
      .as[Seq[Long]].collect().head.size shouldBe 2
  }

  test("token shingles slide over tokens; short docs yield empty") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(expr(tokenShinglesExpr("text", 3)).as("sh"))
    df.as[Seq[String]].collect().toSeq shouldBe
      Seq(Seq("a b c", "b c d"), Seq.empty)
  }

  test("char ngrams slide over characters") {
    Seq("abcde").toDF("text")
      .select(expr(charNgramsExpr("text", 4)).as("g"))
      .as[Seq[String]].collect().head shouldBe Seq("abcd", "bcde")
  }

  test("token counts: whitespace and BPE-ish") {
    val row = Seq("hello world, it's 42 degrees").toDF("text")
      .select(tokenCount("text"), bpeTokenCount("text"))
      .collect().head
    row.getInt(0) shouldBe 5
    // [hello][world][,][it][')[s][4][2][degrees] = 9
    row.getInt(1) shouldBe 9
  }

  test("quality signals are exact arithmetic over token stats") {
    val sig = Seq("the cat sat on the mat").toDF("text")
      .select(qualitySignals("text").as("s")).select("s.*").collect().head
    sig.getLong(0) shouldBe 22L // n_chars
    sig.getLong(1) shouldBe 6L // n_tokens
    sig.getDouble(2) shouldBe (22.0 - 5) / 6 // avg_token_len
    sig.getDouble(3) shouldBe 5.0 / 6 // type_token_ratio ("the" twice)
    sig.getDouble(4) shouldBe 2.0 / 6 // stopword_ratio
    sig.getDouble(5) shouldBe 1.0 // alpha_ratio
  }

  test("langId picks the language with most marker tokens, en wins ties") {
    val rows = Seq(
      "the cat and the dog is here", // en
      "der hund und die katze ist da", // de
      "le chat et la souris est la", // fr
      "el gato y los perros es aqui", // es
      "xyzzy plugh quux" // no markers
    ).toDF("text").select(langId("text")).as[String].collect()
    rows.toSeq shouldBe Seq("en", "de", "fr", "es", "und")
  }

  test("jaccard on hashed shingle sets") {
    val df = Seq(("a b c d e", "a b c d x")).toDF("t1", "t2").select(
      expr(hashedShingleSetExpr(tokenShinglesExpr("t1", 3))).as("s1"),
      expr(hashedShingleSetExpr(tokenShinglesExpr("t2", 3))).as("s2"))
    // shingles t1: {abc,bcd,cde}, t2: {abc,bcd,cdx} → jac = 2/4
    df.select(jaccard(col("s1"), col("s2"))).as[Double].collect().head shouldBe 0.5
  }
}
