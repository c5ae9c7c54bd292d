package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ranks

/** Runtime guards and the re-thinned sampler of Ranks.withGlobalOrder
  * (the scalacheck bound properties live in GraftProps). */
class RanksGuardSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def rootChain(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq

  test("a NULL sort-key value fails loudly instead of corrupting ranks") {
    val df = Seq((1L, "a"), (2L, null), (3L, "c")).toDF("id", "s")
    val ex = intercept[Throwable] {
      Ranks.withGlobalOrder(df, Seq(col("s").asc, col("id").asc), "rank")
        .collect()
    }
    assert(rootChain(ex).exists(_.contains("NULL sort-key")),
      s"unexpected failure chain: ${rootChain(ex)}")
  }

  test("guard survives column pruning: running-sum-only consumer still raises") {
    // The r8 guard sat on __pcnt, which feeds only the rank column: a
    // consumer keeping just a running sum (e.g. packEpochShards read for
    // cum_tokens without train_pos) let Catalyst prune rank → __poff →
    // sum(__pcnt) → the raise, and the sentinel bucket silently polluted
    // every offset. The raise now rides the broadcast-join KEY, which no
    // projection can prune — assert exactly that consumer shape fails.
    val df = Seq((1L, "a", 10L), (2L, null, 20L), (3L, "c", 30L))
      .toDF("id", "s", "w")
    val ex = intercept[Throwable] {
      Ranks.withGlobalOrder(df, Seq(col("s").asc, col("id").asc), "rank",
          running = Seq((col("w"), "cum_w")))
        .select("id", "cum_w") // rank pruned — the old guard vanished here
        .collect()
    }
    assert(rootChain(ex).exists(_.contains("NULL sort-key")),
      s"unexpected failure chain: ${rootChain(ex)}")
  }

  test("guard survives pruning of rank AND all running sums") {
    // Keeps only an input column: the inner broadcast join itself is still
    // required (it filters/matches on __pid), so the key-side raise fires.
    val df = Seq((1L, "a"), (2L, null), (3L, "c")).toDF("id", "s")
    val ex = intercept[Throwable] {
      Ranks.withGlobalOrder(df, Seq(col("s").asc, col("id").asc), "rank")
        .select("id")
        .collect()
    }
    assert(rootChain(ex).exists(_.contains("NULL sort-key")),
      s"unexpected failure chain: ${rootChain(ex)}")
  }

  test("a sampled NULL key is rejected at plan time with the same message") {
    // sampleMod = 1 forces every row into the splitter sample
    val df = Seq((1L, "a"), (2L, null), (3L, "c")).toDF("id", "s")
    val ex = intercept[Throwable] {
      Ranks.withGlobalOrder(df, Seq(col("s").asc, col("id").asc), "rank",
        sampleMod = 1).collect()
    }
    assert(rootChain(ex).exists(_.contains("NULL sort-key")))
  }

  test("ranks stay exact when n far exceeds the deterministic sample cap") {
    // test session: buckets = min(4·4, 4096) = 16, cap = 64·16 = 1024 < n —
    // the salted-hash top-k re-thin is engaged, not the take-all path
    val n = 5000
    val rows = (1 to n).map(i => (i.toLong, i * 2654435761L % 100003))
    val df = rows.toDF("id", "k").repartition(7)
    val out = Ranks.withGlobalOrder(df, Seq(col("k").asc, col("id").asc), "rank")
      .select("id", "rank").as[(Long, Long)].collect().sortBy(_._2)
    val exp = rows.sortBy { case (id, k) => (k, id) }.map(_._1)
    assert(out.map(_._2).toSeq == (1L to n.toLong))
    assert(out.map(_._1).toSeq == exp.toSeq)
  }
}
