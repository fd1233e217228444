package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench collector captures only the last ~2000 characters of the
  * run's output and must find the complete compact JSON line inside
  * that window (rounds 1-3 lost their bench numbers to an overflowing
  * line). This spec recomputes the line's worst-case length from the
  * CURRENT query registry so adding queries can never silently push
  * the line past the window again.
  */
class BenchLineSpec extends AnyFunSuite {

  test("bench compact line fits the collector's tail window at worst-case widths") {
    val names = "_substrate" +: SparkEntry.queries.keys.toSeq.sorted
    // worst-case per-query value under the magnitude-scaled formatter
    // is 3 chars at every tier ("9.9" / "99" / "999", saturated — a
    // 16-minute query is a regression caught by `value` and the detail
    // line long before line length matters); worst-case total:
    // "99999.999". `failures` lives on the detail line; `sf` is the
    // directory basename.
    val queries = names.map(n => s""""$n":9.9""").mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":99999.999,"unit":"sec","queries":$queries,"sf":"sf0.1"}"""
    // window = 2000-char tail minus the trailing sbt summary line
    // ("[success] Total time: ...", ~70 chars) and two newlines
    val budget = 2000 - 80
    assert(line.length <= budget,
      s"compact bench line is ${line.length} chars (> $budget): trim precision, " +
        "shorten query names, or move fields to the detail line")
  }
}
