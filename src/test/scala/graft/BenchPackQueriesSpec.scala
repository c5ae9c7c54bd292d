package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r19 contract-line per-query packing (VERDICT r18 item 2): the
  * driver parses the line from a ~2000-char stdout tail, so the map must
  * (a) never push the line past the byte budget, (b) spend the budget on
  * the LARGEST medians, (c) drop sub-0.1 s queries (below the driver's
  * own per-query regression gate). */
class BenchPackQueriesSpec extends AnyFunSuite {
  private val meds: Seq[(String, Double)] =
    (1 to 113).map(i => f"q$i%02d_some_query_name_$i" -> i / 10.0)

  test("stays within the line budget") {
    val base = 1219 // measured r18 contract-line length
    val m = Bench.packQueries(meds, base, lineBudget = 1800)
    assert(base + "\"queries\":".length + m.length + 1 <= 1800)
    assert(m.startsWith("{") && m.endsWith("}"))
  }

  test("largest medians come first and parse back") {
    val m = Bench.packQueries(meds, 1219)
    val pair = "\"([^\"]+)\":(-?[0-9.]+)".r
    val got = pair.findAllMatchIn(m).map(x => x.group(1) -> x.group(2).toDouble).toSeq
    assert(got.nonEmpty)
    assert(got == got.sortBy(-_._2), "entries must be emitted biggest-first")
    assert(got.head._1 == "q113_some_query_name_113")
  }

  test("sub-0.1s medians are excluded even with infinite budget") {
    val m = Bench.packQueries(
      Seq("a" -> 0.09, "b" -> 0.11), baseLen = 0, lineBudget = 100000)
    assert(m == "{\"b\":0.11}")
  }

  test("empty input yields an empty object") {
    assert(Bench.packQueries(Nil, 0) == "{}")
  }
}
