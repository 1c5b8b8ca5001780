package graft.functions

import scala.collection.mutable

/** Safe parser for the reference's stringified-Python-literal attribute
  * values (reference models/extended_content_model.py:10-49 parses them
  * with `eval` — SURVEY.md §7.3.1 forbids replicating that).
  *
  * Handles exactly the shapes the Yelp business table contains:
  * quoted strings (`'full_bar'`), booleans (`True`/`False`), `None`,
  * integers, and one-level dicts of those (`{'romantic': False}`).
  * Anything else parses to [[PyNone]] rather than throwing — matching the
  * reference's defensive defaults for malformed attributes.
  */
object AttrParser {

  sealed trait PyValue
  case object PyNone extends PyValue
  final case class PyBool(value: Boolean) extends PyValue
  final case class PyStr(value: String) extends PyValue
  final case class PyInt(value: Long) extends PyValue
  final case class PyDict(value: Map[String, PyValue]) extends PyValue

  def parse(raw: String): PyValue = {
    if (raw == null) return PyNone
    val s = raw.trim
    if (s.isEmpty) PyNone
    else if (s == "None") PyNone
    else if (s == "True") PyBool(true)
    else if (s == "False") PyBool(false)
    else if (s.startsWith("'") && s.endsWith("'") && s.length >= 2)
      PyStr(s.substring(1, s.length - 1))
    else if (s.startsWith("\"") && s.endsWith("\"") && s.length >= 2)
      PyStr(s.substring(1, s.length - 1))
    else if (s.startsWith("{") && s.endsWith("}")) parseDict(s)
    else s.toLongOption.map(PyInt(_)).getOrElse(PyNone)
  }

  private def parseDict(s: String): PyValue = {
    val body = s.substring(1, s.length - 1).trim
    if (body.isEmpty) return PyDict(Map.empty)
    val out = mutable.LinkedHashMap[String, PyValue]()
    // Split on top-level commas only (values are scalars per the data
    // shape, but stay safe against nested braces).
    var depth = 0; var start = 0
    val parts = mutable.ArrayBuffer[String]()
    body.zipWithIndex.foreach { case (ch, i) =>
      ch match {
        case '{' => depth += 1
        case '}' => depth -= 1
        case ',' if depth == 0 => parts += body.substring(start, i); start = i + 1
        case _ =>
      }
    }
    parts += body.substring(start)
    parts.foreach { p =>
      val idx = p.indexOf(':')
      if (idx > 0) {
        val k = parse(p.substring(0, idx)) match {
          case PyStr(v) => v
          case other => other.toString
        }
        out(k) = parse(p.substring(idx + 1))
      }
    }
    PyDict(out.toMap)
  }

  /** Ordinal encodings mirrored from the reference
    * (models/extended_content_model.py:7-8,14-17,40-43): unknown → 0. */
  val alcoholLevels: Map[String, Int] =
    Map("none" -> 1, "beer_and_wine" -> 2, "full_bar" -> 3)
  val noiseLevels: Map[String, Int] =
    Map("quiet" -> 1, "average" -> 2, "loud" -> 3, "very_loud" -> 4)

  def encodeAlcohol(raw: String): Int = parse(raw) match {
    case PyStr(v) => alcoholLevels.getOrElse(v, 0)
    case _ => 0
  }

  def encodeNoise(raw: String): Int = parse(raw) match {
    case PyStr(v) => noiseLevels.getOrElse(v, 0)
    case _ => 0
  }

  /** Boolean attrs encode as code+1 (False→1, True→2, missing/None→0 —
    * reference models/extended_content_model.py:23-39). */
  def encodeBool(raw: String): Int = parse(raw) match {
    case PyBool(true) => 2
    case PyBool(false) => 1
    case _ => 0
  }

  /** Nested dict attrs (Ambiance/GoodForMeal/Music): per-key bool codes. */
  def encodeDict(raw: String, keys: Seq[String]): Seq[Int] = parse(raw) match {
    case PyDict(m) => keys.map(k => m.get(k) match {
      case Some(PyBool(true)) => 2
      case Some(PyBool(false)) => 1
      case _ => 0
    })
    case _ => keys.map(_ => 0)
  }
}
