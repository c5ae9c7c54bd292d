package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r17 bench-trust surfaces (VERDICT r16 items 1-2): the per-query
  * movers ledger must FLAG a planted slowdown and stay silent on host-speed
  * drift; the suite-level noise floor from bench/suite_noise.json must be
  * read (and only when sf+cpus match) and must raise the delta_noise floor
  * above the control-only spread that under-read r16's cross-run noise.
  */
class BenchMoversSpec extends AnyFunSuite {

  // ------------------------------------------------------------ topMovers
  test("planted 2x slowdown is the top mover at +100%") {
    val prev = Map("q01" -> 1.0, "q02" -> 2.0, "q03" -> 0.5)
    val cur = Map("q01" -> 1.02, "q02" -> 4.0, "q03" -> 0.49)
    val mv = Bench.topMovers(cur, prev, controlRatio = 1.0)
    assert(mv.nonEmpty && mv.head._1 == "q02", s"movers: $mv")
    assert(math.abs(mv.head._2 - 100.0) < 0.01, s"movers: $mv")
  }

  test("uniform host slowdown is cancelled by the control ratio") {
    // everything (queries AND control) 1.4x slower: no mover should exceed 1%
    val prev = Map("q01" -> 1.0, "q02" -> 2.0)
    val cur = prev.view.mapValues(_ * 1.4).toMap
    val mv = Bench.topMovers(cur, prev, controlRatio = 1.4)
    assert(mv.forall { case (_, d) => math.abs(d) < 1.0 }, s"movers: $mv")
  }

  test("sub-minSec jitter queries are excluded") {
    // 0.02s -> 0.06s is +200% but below the 0.15s significance floor
    val mv = Bench.topMovers(Map("tiny" -> 0.06), Map("tiny" -> 0.02), 1.0)
    assert(mv.isEmpty, s"movers: $mv")
  }

  test("queries absent from either round are skipped, ties break by name") {
    val prev = Map("a" -> 1.0, "b" -> 1.0, "gone" -> 9.0)
    val cur = Map("a" -> 2.0, "b" -> 2.0, "new" -> 9.0)
    val mv = Bench.topMovers(cur, prev, 1.0)
    assert(mv.map(_._1) == Seq("a", "b"), s"movers: $mv")
  }

  // ---------------------------------------------------- prevQueryBaseline
  private def fullArtifact(sf: String, cpus: String, control: Double,
      round: Option[Int] = None): String = {
    val r0 = round.map(r => s""""round":$r,""").getOrElse("")
    s"""{"metric":"total","value":60.0,"unit":"sec","sf":"$sf",""" +
      s""""cpus":"$cpus","passes":3,"stat":"median",$r0""" +
      s""""control":$control,"queries":{"q01":1.5,"q02":0.25},""" +
      s""""detail":{"q01":{"samples":[1.5],"median":1.5,"cold":1.5}}}"""
  }

  private def inTemp(files: (String, String)*)(
      check: java.nio.file.Path => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-bench-movers")
    val bench = dir.resolve("bench")
    Files.createDirectories(bench)
    try {
      files.foreach { case (name, txt) =>
        Files.write(bench.resolve(name), txt.getBytes("UTF-8"))
      }
      check(dir)
    } finally {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
  }

  test("baseline parses queries+control from bench/last_bench.json") {
    inTemp("last_bench.json" ->
        fullArtifact("/root/testdata/sf0.1", "32", 1.5)) { dir =>
      val got = Bench.prevQueryBaseline(dir, "/root/testdata/sf0.1", "32")
      assert(got.isDefined)
      val (qs, ctl, _) = got.get
      assert(qs == Map("q01" -> 1.5, "q02" -> 0.25) && ctl == 1.5, s"got $got")
    }
  }

  test("baseline suppressed on sf or cpus mismatch") {
    inTemp("last_bench.json" ->
        fullArtifact("/root/testdata/sf0.1", "32", 1.5)) { dir =>
      assert(Bench.prevQueryBaseline(dir, "/tmp/sf1", "32").isEmpty)
      assert(Bench.prevQueryBaseline(dir, "/root/testdata/sf0.1", "8").isEmpty)
    }
  }

  test("baseline from the SAME round is rejected under GRAFT_ROUND cap") {
    inTemp("last_bench.json" ->
        fullArtifact("/root/testdata/sf0.1", "32", 1.5, round = Some(17))) { dir =>
      assert(Bench.prevQueryBaseline(dir, "/root/testdata/sf0.1", "32",
        roundCap = Some(17)).isEmpty)
      assert(Bench.prevQueryBaseline(dir, "/root/testdata/sf0.1", "32",
        roundCap = Some(18)).isDefined)
      // legacy artifact without a round field stays accepted under a cap
      assert(Bench.prevQueryBaseline(dir, "/root/testdata/sf0.1", "32",
        roundCap = None).isDefined)
    }
  }

  // ------------------------------------------------------ suiteNoiseFloor
  private def noiseJson(sf: String, cpus: String, spread: Double): String =
    s"""{"sha":"abc","sf":"$sf","cpus":"$cpus","n":5,""" +
      s""""totals":[60.1,61.2],"normalized":[40.0,41.0],""" +
      s""""suite_spread_pct":3.1,"suite_norm_spread_pct":$spread}"""

  test("suite noise floor read when sf+cpus match (basename compare)") {
    inTemp("suite_noise.json" -> noiseJson("sf0.1", "32", 14.5)) { dir =>
      assert(Bench.suiteNoiseFloor(dir, "/root/testdata/sf0.1", "32", None)
        .contains(14.5))
      assert(Bench.suiteNoiseFloor(dir, "/tmp/sf1", "32", None).isEmpty)
      assert(Bench.suiteNoiseFloor(dir, "/root/testdata/sf0.1", "8", None).isEmpty)
    }
  }

  // ----------------------------------- suite floor freshness (ADVICE r17)
  private def noiseJsonRound(round: String, spread: Double): String =
    s"""{"sha":"abc","sf":"sf0.1","cpus":"32","n":5,"round":$round,""" +
      s""""totals":[60.1,61.2],"normalized":[40.0,41.0],""" +
      s""""suite_spread_pct":3.1,"suite_norm_spread_pct":$spread}"""

  test("suite noise floor is age-gated against the current round") {
    val sf = "/root/testdata/sf0.1"
    // fresh: same round, and up to maxAge=2 rounds old
    inTemp("suite_noise.json" -> noiseJsonRound("18", 9.8)) { dir =>
      assert(Bench.suiteNoiseFloor(dir, sf, "32", Some(18)).contains(9.8))
      assert(Bench.suiteNoiseFloor(dir, sf, "32", Some(20)).contains(9.8))
      // stale: 3+ rounds old — ignored, forcing a re-measure
      assert(Bench.suiteNoiseFloor(dir, sf, "32", Some(21)).isEmpty)
      // a FUTURE round in the file is nonsense provenance — ignored too
      assert(Bench.suiteNoiseFloor(dir, sf, "32", Some(17)).isEmpty)
    }
    // legacy file without a round field: stale by definition under a cap,
    // accepted only when the current round itself is unknown
    inTemp("suite_noise.json" -> noiseJson("sf0.1", "32", 9.8)) { dir =>
      assert(Bench.suiteNoiseFloor(dir, sf, "32", Some(18)).isEmpty)
      assert(Bench.suiteNoiseFloor(dir, sf, "32", None).contains(9.8))
    }
  }

  // -------------------------------------- suite floor raises delta_noise
  test("delta below the suite floor (but above control floor) is noise") {
    val dir = Files.createTempDirectory("graft-bench-floor")
    try {
      Files.write(dir.resolve("BENCH_r16.json"),
        ("""{"n": 13, "rc": 0, "cpus": 32, "sf": 0.1, "parsed": {"metric": """ +
          """"total", "value": 60.0, "control": 1.5, "control_spread_pct": 2.0, """ +
          """"unit": "sec"}}""").getBytes("UTF-8"))
      // prev normalized 40; ours 44 -> +10%. Control floor = 2+2 = 4% (NOT
      // noise under the old rule); measured suite floor 15% -> noise.
      val withFloor = Bench.prevRoundFields(dir, "/root/testdata/sf0.1", 44.0,
        spreadPct = 2.0, suiteFloorPct = 15.0)
      assert(withFloor.contains("\"delta_noise\":true"), s"got $withFloor")
      val noFloor = Bench.prevRoundFields(dir, "/root/testdata/sf0.1", 44.0,
        spreadPct = 2.0)
      assert(!noFloor.contains("delta_noise"), s"got $noFloor")
    } finally {
      Files.list(dir).forEach(p => Files.delete(p))
      Files.delete(dir)
    }
  }
}
