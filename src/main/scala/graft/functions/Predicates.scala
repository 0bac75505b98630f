package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference predicate mini-language, compiled to a Catalyst [[Column]] tree.
  *
  * Grammar parity with /root/reference/v1/src/main.rs:440-595 (tokenizer +
  * recursive descent) and /root/reference/v2/src/main.rs:643-773 (ordinal column
  * addressing):
  *
  *   expr    := and ( "OR" and )*
  *   and     := not ( "AND" not )*
  *   not     := "NOT" primary | primary
  *   primary := "(" expr ")" | column op literal
  *   op      := "<" | "<=" | "==" | ">=" | ">"
  *
  * Tokens are split on spaces and parentheses; string literals are bare words
  * (the reference has no quoting). Literal typing order matches the reference:
  * ISO datetime `%Y-%m-%d-%H:%M:%S` → timestamp, `true|false` → boolean,
  * contains '.' → double (else string), parses as i64 → long, else string.
  *
  * Where the reference hand-rolls 15 typed comparison kernels
  * (v1/src/main.rs:866-1170), here Catalyst inserts the casts and the comparison
  * executes inside whole-stage codegen; row-group min/max pruning
  * (v1/src/main.rs:626-685) falls out of parquet filter pushdown for free.
  */
object Predicates {

  sealed trait Value
  final case class I64(v: Long) extends Value
  final case class F64(v: Double) extends Value
  final case class Bool(v: Boolean) extends Value
  final case class Str(v: String) extends Value
  final case class Ts(epochMillis: Long) extends Value

  sealed trait Expr
  final case class Cond(column: String, op: String, value: Value) extends Expr
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr

  /** Parse a predicate where conditions name columns directly (v1 style). */
  def parse(input: String): Expr = new Parser(tokenize(input)).parseAll()

  /** Compile to a Column against named columns. */
  def column(input: String): Column = toColumn(parse(input), identity)

  /** v2-style predicate: conditions address columns by ordinal index into the
    * schema (v2/src/main.rs:737). `"3 > 10"` means `schema(3) > 10`.
    */
  def columnByIndex(input: String, schema: StructType): Column =
    toColumn(parse(input), idx => schema.fieldNames(idx.toInt))

  /** Render an AST back to the reference grammar (fully parenthesized —
    * re-parsing yields the identical tree; scalacheck asserts the
    * round-trip, SURVEY.md §5.3b).
    */
  def print(e: Expr): String = e match {
    case And(l, r) => s"( ${print(l)} AND ${print(r)} )"
    case Or(l, r)  => s"( ${print(l)} OR ${print(r)} )"
    case Not(x)    => s"NOT ( ${print(x)} )"
    case Cond(c, op, v) =>
      val lit = v match {
        case I64(x)  => x.toString
        case F64(x)  => x.toString // Double.toString always carries '.' or exponent+'.'
        case Bool(x) => x.toString
        case Str(x)  => x
        case Ts(ms) =>
          java.time.LocalDateTime
            .ofInstant(java.time.Instant.ofEpochMilli(ms), java.time.ZoneOffset.UTC)
            .format(TsPattern)
      }
      s"$c $op $lit"
  }

  /** All column names referenced by a predicate — the reference uses this for
    * early projection (v1/src/main.rs:1175-1195); in Spark it is only needed
    * for introspection/tests (Catalyst prunes automatically).
    */
  def referencedColumns(e: Expr): Seq[String] = e match {
    case Cond(c, _, _) => Seq(c)
    case And(l, r)     => (referencedColumns(l) ++ referencedColumns(r)).distinct
    case Or(l, r)      => (referencedColumns(l) ++ referencedColumns(r)).distinct
    case Not(x)        => referencedColumns(x)
  }

  def toColumn(e: Expr, resolve: String => String): Column = e match {
    case And(l, r) => toColumn(l, resolve) && toColumn(r, resolve)
    case Or(l, r)  => toColumn(l, resolve) || toColumn(r, resolve)
    case Not(x)    => !toColumn(x, resolve)
    case Cond(c, op, v) =>
      val left = col(resolve(c))
      val right = v match {
        case I64(x)  => lit(x)
        case F64(x)  => lit(x)
        case Bool(x) => lit(x)
        case Str(x)  => lit(x)
        case Ts(ms)  => lit(java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(ms)))
      }
      op match {
        case "<"  => left < right
        case "<=" => left <= right
        case "==" => left === right
        case ">=" => left >= right
        case ">"  => left > right
      }
  }

  // --- tokenizer: split on spaces; '(' / ')' are their own tokens ---
  private[functions] def tokenize(input: String): Vector[String] = {
    val tokens = Vector.newBuilder[String]
    val cur = new StringBuilder
    def flush(): Unit = if (cur.nonEmpty) { tokens += cur.result(); cur.clear() }
    input.foreach {
      case c @ ('(' | ')') => flush(); tokens += c.toString
      case ' '             => flush()
      case c               => cur += c
    }
    flush()
    tokens.result()
  }

  private val TsPattern =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd-HH:mm:ss")

  private[functions] def typeLiteral(tok: String): Value = {
    def asDatetime: Option[Ts] =
      try {
        val ldt = java.time.LocalDateTime.parse(tok, TsPattern)
        Some(Ts(ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli))
      } catch { case _: java.time.format.DateTimeParseException => None }
    asDatetime.getOrElse {
      if (tok == "true" || tok == "false") Bool(tok.toBoolean)
      else if (tok.contains('.'))
        tok.toDoubleOption.map(F64).getOrElse(Str(tok))
      else tok.toLongOption.map(I64).getOrElse(Str(tok))
    }
  }

  private final class Parser(tokens: Vector[String]) {
    private var pos = 0
    private def peek: Option[String] = tokens.lift(pos)
    private def next(): String = {
      val t = tokens.lift(pos).getOrElse(sys.error("unexpected end of predicate"))
      pos += 1; t
    }

    def parseAll(): Expr = {
      val e = parseOr()
      require(pos == tokens.length, s"trailing tokens at $pos: ${tokens.drop(pos).mkString(" ")}")
      e
    }

    private def parseOr(): Expr = {
      var e = parseAnd()
      while (peek.contains("OR")) { next(); e = Or(e, parseAnd()) }
      e
    }

    private def parseAnd(): Expr = {
      var e = parseNot()
      while (peek.contains("AND")) { next(); e = And(e, parseNot()) }
      e
    }

    private def parseNot(): Expr =
      if (peek.contains("NOT")) { next(); Not(parsePrimary()) } else parsePrimary()

    private def parsePrimary(): Expr =
      if (peek.contains("(")) {
        next()
        val e = parseOr()
        require(next() == ")", "expected closing parenthesis")
        e
      } else {
        val column = next()
        val op = next()
        require(Set("<", "<=", "==", ">=", ">").contains(op), s"invalid comparison operator: $op")
        Cond(column, op, typeLiteral(next()))
      }
  }
}
