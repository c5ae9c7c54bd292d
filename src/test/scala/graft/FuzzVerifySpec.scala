package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.FuzzVerify

/** Pins the fuzz harness's reproducibility contract (VERDICT r14 item 5):
  * a fuzz failure is only actionable if (seed0, n) reproduces the exact
  * instance — template choice, drawn parameters, rendered SQL.
  */
class FuzzVerifySpec extends AnyFunSuite {

  test("instances are deterministic in (seed0, n)") {
    val a = FuzzVerify.instances(42L, 30).map { case (n, i) => (n, i.sql) }
    val b = FuzzVerify.instances(42L, 30).map { case (n, i) => (n, i.sql) }
    assert(a == b)
  }

  test("different seeds draw different parameters") {
    val a = FuzzVerify.instances(42L, 10).map(_._2.sql)
    val c = FuzzVerify.instances(43L, 10).map(_._2.sql)
    assert(a != c, "seed must influence drawn parameters")
  }

  test("a 50-instance run covers all templates near-evenly") {
    val names = FuzzVerify.instances(42L, 50).map(_._1)
    val byTemplate = names.groupBy(_.take(4))
    assert(byTemplate.size == FuzzVerify.templates.length)
    val sizes = byTemplate.values.map(_.size)
    assert(sizes.max - sizes.min <= 1, s"uneven round-robin: $byTemplate")
    // instance names are unique — each is a distinct output dir
    assert(names.distinct.size == names.size)
  }

  test("degenerate-capable templates stay inside non-trivial draw bounds (r17)") {
    // VERDICT r16 item 3: fz11 drew LSH thresholds (0.45/0.50) above the
    // corpus's non-trivial range and produced 0-row instances; qual_gate's
    // maxAvg=4.0 floor admitted 0-5 docs. The re-ranged bounds are pinned
    // here against the rendered SQL so a future range widening that can
    // regenerate empty instances fails CI, not a fuzz batch.
    val insts = FuzzVerify.instances(0L, 600)
    val lshT = "b\\.nrm\\) >= (0\\.[0-9]+)".r
    insts.filter(_._1.contains("lsh_thresh")).foreach { case (n, i) =>
      val ts = lshT.findAllMatchIn(i.sql).map(_.group(1).toDouble).toSeq
      assert(ts.nonEmpty, s"$n: no threshold literal in SQL")
      ts.foreach(t => assert(t >= 0.249 && t <= 0.401, s"$n: threshold $t"))
    }
    val qgT = "avg_word_len <= ([0-9.]+)".r
    insts.filter(_._1.contains("qual_gate")).foreach { case (n, i) =>
      val t = qgT.findFirstMatchIn(i.sql).map(_.group(1).toDouble)
      assert(t.exists(v => v >= 4.49 && v <= 9.01), s"$n: maxAvg $t")
    }
  }

  test("every template emits SQL that names at least one base table") {
    val tables = Seq("lineitem", "orders", "part", "customer", "documents",
      "embeddings")
    FuzzVerify.instances(42L, 10).foreach { case (n, i) =>
      assert(tables.exists(i.sql.contains), s"$n sql references no table")
    }
  }
}
