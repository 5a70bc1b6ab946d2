package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search._

/** PrecedenceQueryParser semantics (flexible/precedence): AND binds
  * tighter than OR, NOT tightest; contrast with the classic parser's
  * flat modifier resolution. */
class PrecedenceParserSpec extends AnyFunSuite {

  test("AND binds tighter than OR") {
    val q = PrecedenceParser.parse("a AND b OR c")
    assert(q === BoolQ(Seq(
      (Occur.Should, BoolQ(Seq((Occur.Must, TermQ("a")), (Occur.Must, TermQ("b"))))),
      (Occur.Should, TermQ("c")))))
  }

  test("OR then AND groups the right side") {
    val q = PrecedenceParser.parse("a OR b AND c")
    assert(q === BoolQ(Seq(
      (Occur.Should, TermQ("a")),
      (Occur.Should, BoolQ(Seq((Occur.Must, TermQ("b")), (Occur.Must, TermQ("c"))))))))
  }

  test("parentheses override precedence") {
    val q = PrecedenceParser.parse("(a OR b) AND c")
    assert(q === BoolQ(Seq(
      (Occur.Must, BoolQ(Seq((Occur.Should, TermQ("a")), (Occur.Should, TermQ("b"))))),
      (Occur.Must, TermQ("c")))))
  }

  test("NOT becomes MUST_NOT in the enclosing group; !/&&/|| aliases") {
    assert(PrecedenceParser.parse("a AND NOT b") === BoolQ(Seq(
      (Occur.Must, TermQ("a")), (Occur.MustNot, TermQ("b")))))
    assert(PrecedenceParser.parse("a && !b") ===
      PrecedenceParser.parse("a AND NOT b"))
    assert(PrecedenceParser.parse("a || b") ===
      PrecedenceParser.parse("a OR b"))
  }

  test("double negation cancels; terms lowercase") {
    assert(PrecedenceParser.parse("NOT NOT Apple") ===
      BoolQ(Seq((Occur.Should, TermQ("apple")))))
    assert(PrecedenceParser.parse("NOT apple") ===
      BoolQ(Seq((Occur.MustNot, TermQ("apple")))))
  }

  test("single term and trailing-garbage guard") {
    assert(PrecedenceParser.parse("solo") === BoolQ(Seq((Occur.Should, TermQ("solo")))))
    assertThrows[IllegalArgumentException] { PrecedenceParser.parse("a ) b") }
  }

  test("divergence from the classic parser's flat resolution") {
    // precedence: (a AND b) OR c — c alone matches
    val prec = PrecedenceParser.parse("a AND b OR c")
    val hasStandaloneC = prec.clauses.exists {
      case (Occur.Should, TermQ("c")) => true
      case _ => false
    }
    assert(hasStandaloneC)
    // classic: +a +b c — b required, no standalone-c match set
    val classic = QueryParser.parse("a AND b OR c")
    val bRequired = classic.clauses.exists {
      case (Occur.Must, TermQ("b")) => true
      case _ => false
    }
    assert(bRequired)
  }
}
