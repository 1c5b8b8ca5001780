package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AttrParser
import graft.functions.AttrParser._

/** The safe literal parser must cover every branch the reference's eval
  * handled (FIXTURES.md §3): quoted strings, True/False/None, ints,
  * nested one-level dicts, malformed input. */
class AttrParserSpec extends AnyFunSuite {

  test("scalars") {
    assert(parse("'full_bar'") == PyStr("full_bar"))
    assert(parse("True") == PyBool(true))
    assert(parse("False") == PyBool(false))
    assert(parse("None") == PyNone)
    assert(parse("42") == PyInt(42))
    assert(parse(null) == PyNone)
    assert(parse("") == PyNone)
    assert(parse("garbage(") == PyNone)
  }

  test("nested dicts") {
    val d = parse("{'romantic': False, 'casual': True, 'x': None}")
    assert(d == PyDict(Map("romantic" -> PyBool(false), "casual" -> PyBool(true), "x" -> PyNone)))
    assert(parse("{}") == PyDict(Map.empty))
  }

  test("ordinal and boolean encodings match the reference tables") {
    assert(encodeAlcohol("'full_bar'") == 3)
    assert(encodeAlcohol("'beer_and_wine'") == 2)
    assert(encodeAlcohol("'none'") == 1)
    assert(encodeAlcohol("None") == 0)
    assert(encodeAlcohol("'unheard_of'") == 0)
    assert(encodeNoise("'very_loud'") == 4)
    assert(encodeBool("True") == 2)
    assert(encodeBool("False") == 1)
    assert(encodeBool("None") == 0)
    assert(encodeDict("{'lunch': True, 'dinner': False}", Seq("lunch", "dinner", "brunch"))
      == Seq(2, 1, 0))
    assert(encodeDict("None", Seq("dj")) == Seq(0))
  }
}
