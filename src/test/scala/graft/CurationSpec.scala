package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, Dedup}

/** End-to-end: curation verdicts → survivors → token shards → partitioned
  * corpus write. The composition a library user runs as one call. */
class CurationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("exported training set holds exactly the kept docs, shard-packed and partitioned") {
    val out = Files.createTempDirectory("graft-export").toString + "/corpus"
    Curation.exportTrainingSet(spark, TestSpark.sf0001, out, tokenBudget = 1000L)

    val verdicts = Dedup.q67CurationPipeline.run(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("kept"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val keptIds = verdicts.filter(_._2).keySet

    val exported = spark.read.parquet(out)
    val got = exported.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == keptIds, "export must contain exactly the kept documents")

    // shard packing: every shard except the last reaches the budget once
    // its first doc's overhang is granted; shard ids are contiguous from 0
    // the Hive partition value comes back type-inferred (Integer)
    val shards = exported.groupBy("shard_id")
      .agg(sum("tokens").as("t"), max("tokens").as("mx"))
      .collect()
      .map(r => (r.getAs[Number]("shard_id").longValue, r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(shards.map(_._1).toSeq == shards.indices.map(_.toLong))
    shards.dropRight(1).foreach { case (id, total, mx) =>
      assert(total + mx >= 1000L, s"shard $id underfilled: $total tokens (max doc $mx)")
    }

    // physical layout: one Hive partition dir per shard, pruning works
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("shard_id=")) && dirs.length == shards.length)
    val pruned = spark.read.parquet(out).filter(col("shard_id") === 0)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    assert(pruned.count() > 0)
  }
}
