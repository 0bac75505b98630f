package graft.functions

import graft.functions.Predicates._
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the predicate grammar (SURVEY.md §5.3b): a random
  * AST printed in the reference grammar re-parses to the identical tree,
  * and literal typing is stable under printing.
  */
object PredicatesProps extends Properties("Predicates") {

  private val genColumn: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map("c_" + _.mkString.take(12))

  private val genOp: Gen[String] = Gen.oneOf("<", "<=", "==", ">=", ">")

  private val genValue: Gen[Value] = Gen.oneOf(
    Gen.choose(Long.MinValue + 1, Long.MaxValue).map(I64),
    Gen.choose(-1e12, 1e12).suchThat(d => !d.isNaN && !d.isInfinite).map(F64),
    Gen.oneOf(true, false).map(Bool),
    // bare words: letters only, not a keyword/bool literal
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(16))
      .suchThat(s => s != "true" && s != "false").map(Str),
    // second-resolution timestamps in a sane range (the grammar has no ms)
    Gen.choose(0L, 4102444800L).map(s => Ts(s * 1000L)))

  private val genCond: Gen[Expr] = for {
    c <- genColumn; op <- genOp; v <- genValue
  } yield Cond(c, op, v)

  private def genExpr(depth: Int): Gen[Expr] =
    if (depth <= 0) genCond
    else Gen.frequency(
      3 -> genCond,
      1 -> (for { l <- genExpr(depth - 1); r <- genExpr(depth - 1) } yield And(l, r)),
      1 -> (for { l <- genExpr(depth - 1); r <- genExpr(depth - 1) } yield Or(l, r)),
      1 -> genExpr(depth - 1).map(Not(_)))

  property("print → parse round-trips the AST") =
    Prop.forAll(genExpr(4)) { e =>
      Predicates.parse(Predicates.print(e)) == e
    }

  property("printed conditions keep their literal type") =
    Prop.forAll(genCond) { e =>
      Predicates.parse(Predicates.print(e)) == e
    }

  property("referencedColumns survives the round-trip") =
    Prop.forAll(genExpr(3)) { e =>
      referencedColumns(Predicates.parse(Predicates.print(e))) == referencedColumns(e)
    }
}
