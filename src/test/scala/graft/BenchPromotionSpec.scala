package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's mover auto-promotion: gates whose fresh sharded wall
  * exceeds 2× + 2 s of the previous committed snapshot must enter the
  * isolated pass IN THE SAME RUN — the rule that makes an unexplained
  * in-suite regression uncommittable (round 11 shipped q93/q94 at 5–6×
  * with no isolated adjudication; this closes that class). Pure logic,
  * tested against synthetic snapshot files. */
class BenchPromotionSpec extends AnyFunSuite {

  private def snapshot(walls: (String, Double)*): String = {
    val qs = walls.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    s"""{"metric":"total","value":1.0,"unit":"sec","queries":{$qs},"sf":"x"}"""
  }

  private def tmpSnapshot(walls: (String, Double)*): String = {
    val p = java.nio.file.Files.createTempFile("graft_bench_prior", ".json")
    java.nio.file.Files.write(p, snapshot(walls: _*).getBytes("UTF-8"))
    p.toFile.deleteOnExit()
    p.toString
  }

  test("parseNumMap round-trips flat numeric maps incl. scientific notation") {
    assert(Bench.parseNumMap("") == Map.empty)
    assert(Bench.parseNumMap(""""a":1.5,"b":2.0E-4,"c":-1""") ==
      Map("a" -> 1.5, "b" -> 2.0e-4, "c" -> -1.0))
  }

  test("movers past 2x+2s are promoted; stable gates, new gates, failures are not") {
    val prior = tmpSnapshot(
      "q10_stable" -> 5.0,   // current 6.0: inside 2x+2
      "q20_mover" -> 2.0,    // current 7.0 > 2*2+2: promoted
      "q30_failed" -> -1.0,  // failed baseline: skipped
      "q40_gone" -> 3.0,     // not in current run: skipped
      "q59_salted_join" -> 1.0) // on the static isolated list: excluded
    val current = Map(
      "q10_stable" -> 6.0, "q20_mover" -> 7.0, "q30_failed" -> 50.0,
      "q50_new" -> 99.0,   // no baseline: not a mover
      "q59_salted_join" -> 9.0)
    assert(Bench.promotedMovers(current, prior) == Seq("q20_mover"))
  }

  test("boundary: exactly 2x+2 does not promote; just past it does") {
    val prior = tmpSnapshot("qa" -> 3.0, "qb" -> 3.0)
    assert(Bench.promotedMovers(
      Map("qa" -> 8.0, "qb" -> 8.01), prior) == Seq("qb"))
  }

  test("a missing prior snapshot promotes nothing") {
    assert(Bench.promotedMovers(Map("qa" -> 100.0),
      "/nonexistent/prior.json") == Nil)
  }
}
