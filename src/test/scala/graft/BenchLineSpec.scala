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
    // The formatter prints 3-char decisecond values and falls back to
    // 2-char integer seconds if the 3-char line would overflow — so
    // the GUARANTEE that must hold at any registry size is the 2-char
    // worst case ("99" everywhere, total "99999.999"). `failures`
    // lives on the detail line; `sf` is the directory basename.
    val queries = names.map(n => s""""$n":99""").mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":99999.999,"unit":"sec","failures":99,"noisy":999,"queries":$queries,"sf":"sf0.1"}"""
    assert(line.length <= graft.Bench.LineBudget,
      s"compact bench line is ${line.length} chars (> ${graft.Bench.LineBudget}) " +
        "even at 2-char fallback widths: shorten query names or move fields " +
        "to the detail line")
    // and the PRECISE (3-char) form must fit too: the integer-second
    // fallback is defense-in-depth, not an acceptable steady state —
    // if this trips, reclaim width (shorter names) NOW, because every
    // bench run after this point silently loses sub-second precision.
    val precise = names.map(n => s""""$n":9.9""").mkString("{", ",", "}")
    val line3 = s"""{"metric":"total","value":99999.999,"unit":"sec","failures":99,"noisy":999,"queries":$precise,"sf":"sf0.1"}"""
    assert(line3.length <= graft.Bench.LineBudget,
      s"3-char bench line is ${line3.length} chars (> ${graft.Bench.LineBudget}): " +
        "the next bench run will emit integer-second fallback values — " +
        "shorten query names to restore precision")
  }
}
