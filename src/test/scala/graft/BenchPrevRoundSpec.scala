package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench contract line's self-comparison fields (VERDICT r13
  * item 5): the parser must read the DRIVER'S BENCH_r{N}.json wrapper —
  * python-json spacing, contract line escaped inside `tail` — pick the
  * LATEST round, divide value by control, and stay silent across SFs or
  * when no comparable record exists. A silent format drift here would
  * quietly drop the judge-facing delta, so the shapes are pinned in CI.
  */
class BenchPrevRoundSpec extends AnyFunSuite {

  // the driver wrapper shape: python json (space after colon), the raw
  // contract line embedded as an ESCAPED string in `tail`, real fields in
  // `parsed` — the escaped copy must NOT be what the parser reads (its
  // value is deliberately different here to catch that)
  private def wrapper(value: Double, control: Double, sf: Double): String =
    s"""{"n": 13, "rc": 0, "cpus": 32, "sf": $sf, """ +
      """"tail": "{\"metric\":\"total\",\"value\":999.9,\"control\":9.9}", """ +
      s""""parsed": {"metric": "total", "value": $value, """ +
      s""""control": $control, "unit": "sec"}}"""

  private def inTemp(files: (String, String)*)(
      check: java.nio.file.Path => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-bench-prev")
    try {
      files.foreach { case (name, txt) =>
        Files.write(dir.resolve(name), txt.getBytes("UTF-8"))
      }
      check(dir)
    } finally {
      Files.list(dir).forEach(p => Files.delete(p))
      Files.delete(dir)
    }
  }

  test("latest round wins, parsed (not escaped-tail) values, delta math") {
    inTemp(
      "BENCH_r09.json" -> wrapper(100.0, 1.0, 0.1),
      "BENCH_r13.json" -> wrapper(60.0, 1.5, 0.1)) { dir =>
      // prev normalized = 60/1.5 = 40; ours 42 -> +5%
      val got = Bench.prevRoundFields(dir, "/root/testdata/sf0.1", 42.0)
      assert(got ==
        ""","prev_round":13,"prev_normalized":40.0,"normalized_delta_pct":5.0""",
        s"unexpected fields: $got")
    }
  }

  test("suppressed when the previous record is a different sf") {
    inTemp("BENCH_r13.json" -> wrapper(60.0, 1.5, 0.1)) { dir =>
      assert(Bench.prevRoundFields(dir, "/tmp/sf1", 42.0) == "")
    }
  }

  test("integer sf matches an sfN dir (no trailing .0 mismatch)") {
    inTemp("BENCH_r13.json" -> wrapper(180.0, 1.5, 1.0)) { dir =>
      val got = Bench.prevRoundFields(dir, "/tmp/sf1", 120.0)
      assert(got.contains("\"prev_round\":13"), s"got: $got")
    }
  }

  test("suppressed when the previous record ran at a different cpu count") {
    // the control is pinned to 32 slices: normalized totals only cancel
    // host speed at the SAME parallelism (a cpus=8 local run vs the
    // driver's cpus=32 wrapper printed a -70% "delta" that was pure cpus)
    inTemp("BENCH_r13.json" -> wrapper(60.0, 1.5, 0.1)) { dir =>
      assert(Bench.prevRoundFields(dir, "/root/testdata/sf0.1", 42.0,
        cpus = "8") == "")
      assert(Bench.prevRoundFields(dir, "/root/testdata/sf0.1", 42.0,
        cpus = "32").contains("\"prev_round\":13"))
    }
  }

  test("delta below the two-run control-spread floor is flagged as noise") {
    inTemp("BENCH_r13.json" -> wrapper(60.0, 1.5, 0.1)) { dir =>
      // prev normalized 40; ours 41 -> +2.5%. Wrapper has no recorded
      // spread, so the floor doubles this run's: spread 5% -> floor 10%
      val got = Bench.prevRoundFields(dir, "/root/testdata/sf0.1", 41.0,
        spreadPct = 5.0)
      assert(got.endsWith(""","normalized_delta_pct":2.5,"delta_noise":true"""),
        s"got: $got")
      // spread 1% -> floor 2% < 2.5%: significant, no flag
      val sig = Bench.prevRoundFields(dir, "/root/testdata/sf0.1", 41.0,
        spreadPct = 1.0)
      assert(sig.endsWith(""","normalized_delta_pct":2.5"""), s"got: $sig")
      assert(!sig.contains("delta_noise"))
    }
    // a wrapper that RECORDS its spread contributes it to the floor:
    // this spread 1% + prev 2% = 3% > 2.5% -> noise
    inTemp("BENCH_r13.json" ->
      (s"""{"n": 13, "sf": 0.1, "cpus": 32, "parsed": {"metric": "total", """ +
       s""""value": 60.0, "control": 1.5, "control_spread_pct": 2.0}}""")) { dir =>
      val got = Bench.prevRoundFields(dir, "/root/testdata/sf0.1", 41.0,
        spreadPct = 1.0)
      assert(got.contains("\"delta_noise\":true"), s"got: $got")
    }
  }

  test("GRAFT_ROUND cap skips the in-flight round's own wrapper") {
    // a post-close re-run sees BENCH_r15.json on disk; with roundCap=15 it
    // must compare against r13, not itself (ADVICE r14)
    inTemp(
      "BENCH_r13.json" -> wrapper(60.0, 1.5, 0.1),
      "BENCH_r15.json" -> wrapper(42.0, 1.0, 0.1)) { dir =>
      val got = Bench.prevRoundFields(dir, "/root/testdata/sf0.1", 42.0,
        roundCap = Some(15))
      assert(got.contains("\"prev_round\":13"), s"got: $got")
      // uncapped, the latest wrapper (r15) wins — the driver's in-round path
      val uncapped = Bench.prevRoundFields(dir, "/root/testdata/sf0.1", 42.0)
      assert(uncapped.contains("\"prev_round\":15"), s"got: $uncapped")
    }
  }

  test("broken latest wrapper (rc!=0 / no value) falls through to next-latest") {
    // r15 shipped a wrapper with rc:1 and only a compile-error tail — no
    // parsed value at all. The delta must not vanish for a round: skip
    // any non-comparable wrapper and compare against the newest GOOD one
    // (ADVICE r15 item 4: r16's contract line must show prev_round:14).
    val broken15 =
      """{"n": 15, "rc": 1, "cpus": 32, "sf": 0.1, """ +
        """"tail": "[error] Dedup.scala:62: value << is not a member of Boolean"}"""
    inTemp(
      "BENCH_r14.json" -> wrapper(60.0, 1.5, 0.1),
      "BENCH_r15.json" -> broken15) { dir =>
      val got = Bench.prevRoundFields(dir, "/root/testdata/sf0.1", 42.0)
      assert(got.contains("\"prev_round\":14"), s"got: $got")
    }
    // rc:1 even WITH a stale parsed value must be skipped — a failed run's
    // numbers are not a baseline
    val rcOneWithValue =
      s"""{"n": 15, "rc": 1, "cpus": 32, "sf": 0.1, """ +
        s""""parsed": {"metric": "total", "value": 60.0, "control": 1.5}}"""
    inTemp(
      "BENCH_r14.json" -> wrapper(80.0, 2.0, 0.1),
      "BENCH_r15.json" -> rcOneWithValue) { dir =>
      val got = Bench.prevRoundFields(dir, "/root/testdata/sf0.1", 42.0)
      assert(got.contains("\"prev_round\":14"), s"got: $got")
    }
  }

  test("negative and scientific-notation wrapper values parse") {
    // value in scientific notation (python json emits it for small/large
    // floats); the old [0-9.]+ regex truncated these silently
    inTemp("BENCH_r13.json" ->
      (s"""{"n": 13, "sf": 0.1, "cpus": 32, "parsed": {"metric": "total", """ +
       s""""value": 6e1, "control": 1.5, "unit": "sec"}}""")) { dir =>
      val got = Bench.prevRoundFields(dir, "/root/testdata/sf0.1", 42.0)
      assert(got.contains("\"prev_normalized\":40.0"), s"got: $got")
    }
  }

  test("silent when no record, unreadable json, or zero control") {
    inTemp() { dir =>
      assert(Bench.prevRoundFields(dir, "/root/testdata/sf0.1", 42.0) == "")
    }
    inTemp("BENCH_r13.json" -> "not json at all") { dir =>
      assert(Bench.prevRoundFields(dir, "/root/testdata/sf0.1", 42.0) == "")
    }
    inTemp("BENCH_r13.json" -> wrapper(60.0, 0.0, 0.1)) { dir =>
      assert(Bench.prevRoundFields(dir, "/root/testdata/sf0.1", 42.0) == "")
    }
  }
}
