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
    // worst-case substrate attribution: the two LONGEST compact
    // labels at 3-char values — `sub` rides on every tier above the
    // last-resort one, so the budget must hold with it in place
    // (top-2 since r19: top-3 no longer fit the precise tier at a
    // 167-key registry; the detail line keeps the full decomposition)
    val subWorst = graft.Bench.SubLabel.values.toSeq.sortBy(-_.length).take(2)
      .map(l => s""""$l":9.9""").mkString(""","sub":{""", ",", "}")
    val queries = names.map(n => s""""$n":99""").mkString("{", ",", "}")
    // worst case includes the contamination self-tag: it rides the
    // FIXED part of the line (never degraded away), so the budget must
    // hold with it present
    val contam = graft.Bench.contaminationTag(999, names.length)
    assert(contam === ""","contaminated":true""")
    val line = s"""{"metric":"total","value":99999.999,"unit":"sec","failures":99,"noisy":999$contam,"rm_n":999$subWorst,"queries":$queries,"sf":"sf0.1"}"""
    assert(line.length <= graft.Bench.LineBudget,
      s"compact bench line is ${line.length} chars (> ${graft.Bench.LineBudget}) " +
        "even at 2-char fallback widths: shorten query names or move fields " +
        "to the detail line")
    // and the PRECISE (3-char) form must fit too: the integer-second
    // fallback is defense-in-depth, not an acceptable steady state —
    // if this trips, reclaim width (shorter names) NOW, because every
    // bench run after this point silently loses sub-second precision.
    // the 3-char tier models the HEALTHY steady state (clean host, no
    // contamination tag): a tagged run that cannot fit 3-char values
    // legitimately degrades to the 2-char tier — which is modeled WITH
    // the tag above, so the complete-line guarantee holds either way
    val precise = names.map(n => s""""$n":9.9""").mkString("{", ",", "}")
    val line3 = s"""{"metric":"total","value":99999.999,"unit":"sec","failures":99,"noisy":999,"rm_n":999$subWorst,"queries":$precise,"sf":"sf0.1"}"""
    assert(line3.length <= graft.Bench.LineBudget,
      s"3-char bench line is ${line3.length} chars (> ${graft.Bench.LineBudget}): " +
        "the next bench run will emit integer-second fallback values — " +
        "shorten query names to restore precision")
  }

  test("SubLabel covers every pinned substrate stage with a short label") {
    // Bench.SubLabel.getOrElse(n, n) falls back to the RAW stage name;
    // a stage added without a label entry whose min lands in the top-3
    // would put its full name (up to 16 chars) into `sub`, overflow
    // the tail window, and Bench would silently drop to the no-sub
    // candidate — reintroducing exactly the _substrate blindness the
    // field exists to fix, while the worst-case budget test above
    // (which models only SubLabel VALUES) kept passing. The universe
    // is the two shingle substrates plus the StageConsumers keyset —
    // the same single source materializePinnedStages requires against.
    val stageUniverse = Set("shingle_memo", "gram_memo") ++
      graft.operators.DedupOps.StageConsumers.keySet
    val missing = stageUniverse -- graft.Bench.SubLabel.keySet
    assert(missing.isEmpty,
      s"pinned stages without a SubLabel entry: $missing — add a ≤7-char label")
    val stale = graft.Bench.SubLabel.keySet -- stageUniverse
    assert(stale.isEmpty,
      s"SubLabel entries for stages that no longer exist: $stale")
    graft.Bench.SubLabel.values.foreach(l =>
      assert(l.length <= 7, s"SubLabel '$l' exceeds 7 chars — the " +
        "worst-case budget above models ≤7-char labels"))
  }

  test("contamination tag fires at the documented threshold and only there") {
    import graft.Bench.contaminationTag
    val n = SparkEntry.queries.size + 1 // registry + _substrate
    val thr = math.max(3, n / 10)
    // a host-contaminated sweep (noisy at/above a tenth of the
    // registry) must self-tag so the collector cannot archive it as
    // evidence silently (three consecutive driver rounds shipped 2-6x
    // uniform artifacts that needed hand re-derivation to dismiss)
    assert(contaminationTag(thr, n) === ""","contaminated":true""")
    assert(contaminationTag(n, n).nonEmpty)
    // below threshold: clean runs with a stray slow key stay untagged
    assert(contaminationTag(thr - 1, n) === "")
    assert(contaminationTag(0, n) === "")
    // no floor file → noisy = -1 → unknown, NOT contaminated
    assert(contaminationTag(-1, n) === "")
    // tiny registries keep the floor of 3 (one slow key of ten must
    // not refuse the whole artifact)
    assert(contaminationTag(1, 10) === "")
    assert(contaminationTag(3, 10).nonEmpty)
    // and the tag lands on both emitted lines' fixed region
    val kv = Seq("q" -> 1.0)
    val d = graft.Bench.detailLine(3, 0, 1.0, kv, kv, Nil, Nil, Nil,
      "/x/sf0.1", contaminationTag(thr, n))
    assert(d.startsWith("""{"detail":"full","contaminated":true,"""))
  }

  test("detail line always carries the COMPLETE remeasured list") {
    // the compact line's `rm` list truncates adaptively to fit the
    // tail window — the DETAIL line is where a reviewer of the
    // artifact goes for the full list, so it must never truncate
    // (r16: a 16-name re-measure round shipped 1 compact name; the
    // complete evidence here was undocumented)
    val names = (1 to 16).map(i => f"query_with_a_long_name_$i%02d")
    val kv = names.map(_ -> 1.234)
    val line = graft.Bench.detailLine(3, 0, 99.9, kv, kv,
      Seq("shingle_memo" -> 2.0), names.map(_ -> 3.5), names, "/x/sf0.1")
    names.foreach(n => assert(line.contains("\"" + n + "\""),
      s"detail line dropped remeasured name $n"))
    assert(line.contains(""""remeasured":[""") && line.contains(""""floor_ratio":"""))
    // and the list is the dedicated field, not an accident of the maps
    val rm = line.split("\"remeasured\":\\[")(1).takeWhile(_ != ']')
    assert(names.forall(n => rm.contains(n)), s"remeasured field incomplete: $rm")
  }

  test("committed floor files key exactly the live registry") {
    // a rename or a new key that misses the floor fold leaves
    // Bench.floorMins blind on that key — the ≥3× re-measure trigger
    // and the per-query ratio reporting silently skip it (r15:
    // `tumbling` stranded in both floors after an in-place re-key,
    // `bpet` never folded in). Pin both floor files' key sets to the
    // registry so the drift fails the build instead of degrading the
    // round's bench evidence.
    import scala.jdk.CollectionConverters._
    val live = SparkEntry.queries.keySet + "_substrate"
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    Seq("BENCH_LOCAL_sf0.1.json", "BENCH_sf1.json").foreach { f =>
      val node = mapper.readTree(new java.io.File(f))
      Seq("queries", "queries_min").foreach { section =>
        val keys = node.path(section).fieldNames().asScala.toSet
        val missing = live -- keys
        val stale = keys -- live
        assert(missing.isEmpty && stale.isEmpty,
          s"$f $section drifted from the registry - missing: $missing, stale: $stale")
      }
    }
  }

  test("floor file resolution covers both committed floors") {
    // the sf0.1 floor is BENCH_LOCAL_sf0.1.json but the
    // scale-regression floor is BENCH_sf1.json — without the fallback
    // every /tmp/sf1 sweep ran floorless (noisy:-1, no adaptive
    // re-measure, contamination tag dead), the unguarded capture path
    // behind the r18 host-contaminated sf1 artifacts
    assert(graft.Bench.floorFile("/root/testdata/sf0.1")
      .exists(_.toString == "BENCH_LOCAL_sf0.1.json"))
    assert(graft.Bench.floorFile("/tmp/sf1")
      .exists(_.toString == "BENCH_sf1.json"))
    assert(graft.Bench.floorFile("/tmp/no_such_sf").isEmpty)
  }

  test("legacy key names resolve through the rename ledger, garbage does not") {
    // chained: agg_collect_sorted -> collect_sort -> csort (r7, r11)
    assert(SparkEntry.resolveName("agg_collect_sorted") === Some("csort"))
    // single hop from the current round's renames
    assert(SparkEntry.resolveName("collect_cap") === Some("ccap"))
    // live names pass through silently
    assert(SparkEntry.resolveName("q1") === Some("q1"))
    // a name that never existed resolves to nothing (Verify/TimeQuery
    // keep their fail-fast behavior for typos)
    assert(SparkEntry.resolveName("no_such_query") === None)
    // and the bridged lookup returns a runnable function
    assert(SparkEntry.query("window_lag").isDefined)
  }

  test("scripts/renames.json bridges every renamed key to a live registry key") {
    // round-over-round artifact tooling (BENCH_r*/CORRECTNESS_r* key
    // diffs) bridges old names through this map; a stale entry — a
    // `new` name that no longer exists, or an `old` name that came
    // back — would silently corrupt the bridge
    val src = scala.io.Source.fromFile("scripts/renames.json")
    val text = try src.mkString finally src.close()
    val pairs = """"([a-z0-9_]+)":\s*\{"new":\s*"([a-z0-9_]+)"""".r
      .findAllMatchIn(text).map(m => m.group(1) -> m.group(2)).toSeq
    assert(pairs.nonEmpty, "renames.json parsed to zero entries")
    val live = SparkEntry.queries.keySet
    pairs.foreach { case (old, nw) =>
      assert(live.contains(nw) || pairs.exists(_._1 == nw),
        s"renames.json maps $old -> $nw but $nw is neither a live key nor further renamed")
      assert(!live.contains(old),
        s"renames.json lists $old as renamed but it is back in the registry")
    }
  }
}
