package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import Predicates._

class PredicatesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("tokenizer splits on spaces and parens") {
    assert(tokenize("(a >= 1) AND NOT b == x") ==
      Vector("(", "a", ">=", "1", ")", "AND", "NOT", "b", "==", "x"))
  }

  test("literal typing matches the reference order") {
    assert(typeLiteral("42") == I64(42))
    assert(typeLiteral("-7") == I64(-7))
    assert(typeLiteral("3.5") == F64(3.5))
    assert(typeLiteral("true") == Bool(true))
    assert(typeLiteral("false") == Bool(false))
    assert(typeLiteral("hello") == Str("hello"))
    assert(typeLiteral("3.5.7") == Str("3.5.7")) // contains '.' but not a float
    // %Y-%m-%d-%H:%M:%S → epoch millis (UTC), v1/src/main.rs:589-595
    assert(typeLiteral("1970-01-01-00:00:01") == Ts(1000L))
    assert(typeLiteral("1996-01-02-03:04:05") == Ts(820551845000L))
  }

  test("precedence: NOT > AND > OR") {
    val e = parse("a == 1 OR b == 2 AND NOT c == 3")
    assert(e == Or(
      Cond("a", "==", I64(1)),
      And(Cond("b", "==", I64(2)), Not(Cond("c", "==", I64(3))))))
  }

  test("parentheses override precedence") {
    val e = parse("(a == 1 OR b == 2) AND c == 3")
    assert(e == And(
      Or(Cond("a", "==", I64(1)), Cond("b", "==", I64(2))),
      Cond("c", "==", I64(3))))
  }

  test("referenced columns for early projection") {
    assert(referencedColumns(parse("a > 1 AND (b < 2.0 OR a == 3)")) == Seq("a", "b"))
  }

  test("rejects bad operators and trailing tokens") {
    intercept[IllegalArgumentException](parse("a != 1"))
    intercept[IllegalArgumentException](parse("a == 1 b"))
  }

  test("predicate filters match Spark SQL semantics on lineitem") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val got = li.filter(column("(l_quantity > 45.0 OR l_quantity < 5.0) AND NOT l_returnflag == R")).count()
    val want = li.filter("(l_quantity > 45.0 OR l_quantity < 5.0) AND NOT (l_returnflag = 'R')").count()
    assert(got == want && got > 0)
  }

  test("datetime literal compares against timestamp column") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val got = li.filter(column("l_shipdate >= 1996-01-01-00:00:00")).count()
    val want = li.filter("l_shipdate >= timestamp'1996-01-01 00:00:00'").count()
    assert(got == want && got > 0)
  }

  test("index-based addressing resolves via schema (v2)") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val got = li.filter(columnByIndex("4 > 30", li.schema)).count() // field 4 = l_quantity
    val want = li.filter("l_quantity > 30").count()
    assert(got == want && got > 0)
  }
}
