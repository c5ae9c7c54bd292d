package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming content dedup WITH duplicate accounting — the ingest-time form
  * of the batch exact-dedup family (operators/Dedup.scala q30/q60). The
  * built-in `dropDuplicatesWithinWatermark` silently drops replays; a
  * training-data ingest pipeline needs the decision itself: every incoming
  * document is emitted with a keep/drop verdict and, for drops, the keeper
  * it duplicates — the record an audit trail or a downstream
  * weighted-sampling stage consumes.
  *
  * State per content hash: (first doc_id, arrival time, duplicate count) —
  * O(1) per key, no document buffering. The event-time timeout expires a
  * hash once the watermark passes its first sighting + `ttlMinutes`,
  * bounding state to the dedup horizon: at 100 TB/day ingest the state
  * store holds one tiny record per DISTINCT content in the horizon,
  * sharded across the cluster by the groupByKey shuffle on the hash
  * (RocksDB state store at production cardinality).
  */
object StreamDedup {

  final case class Doc(doc_id: Long, ts: Timestamp, content_hash: String)
  final case class Seen(firstId: Long, firstMs: Long, dups: Long)
  final case class Verdict(
      doc_id: Long, content_hash: String, keep: Boolean, dup_of: Option[Long])

  def dedupStream(docs: Dataset[Doc], ttlMinutes: Int): Dataset[Verdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ttlMs = ttlMinutes * 60000L

    docs
      .withWatermark("ts", s"$ttlMinutes minutes")
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState[Seen, Verdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (hash: String, rows: Iterator[Doc], state: GroupState[Seen]) =>
          if (state.hasTimedOut) { // horizon passed: forget this content
            state.remove()
            Iterator.empty
          } else {
            // deterministic keeper under replay: earliest ts, then lowest id
            val sorted = rows.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))
            var seen = state.getOption
            val out = sorted.map { d =>
              seen match {
                case Some(s) =>
                  seen = Some(s.copy(dups = s.dups + 1))
                  Verdict(d.doc_id, hash, keep = false, Some(s.firstId))
                case None =>
                  seen = Some(Seen(d.doc_id, d.ts.getTime, 0L))
                  Verdict(d.doc_id, hash, keep = true, None)
              }
            }
            seen.foreach { s =>
              state.update(s)
              // a duplicate arriving in the same micro-batch in which the
              // watermark passes this hash's expiry would otherwise set a
              // timeout BEHIND the watermark — an IllegalArgumentException
              // that kills the whole query. Clamp to just past the watermark.
              state.setTimeoutTimestamp(
                math.max(s.firstMs + ttlMs, state.getCurrentWatermarkMs + 1))
            }
            out.iterator
          }
      }
  }

  /** readStream wiring: parquet documents dir → hash content → dedup. The
    * documents table carries no event time, so arrival order is synthesized
    * deterministically from doc_id (1s per doc from a fixed epoch) — a real
    * ingest feed would carry its own arrival timestamp. */
  def streamingVerdicts(spark: SparkSession, dir: String,
      ttlMinutes: Int = 60): Dataset[Verdict] = {
    import spark.implicits._
    // the Tables convention resolves tables at $dir/<name>.parquet; the file
    // stream source needs a directory, so stream the dir but glob-filter to
    // the documents table only — without this every other table's files
    // would be read through the documents schema as null-text garbage rows.
    spark.readStream
      .schema(graft.sources.Tables.schemas("documents"))
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(col("doc_id"),
        (lit(1704067200L) + col("doc_id")).cast("timestamp").as("ts"),
        md5(col("text")).as("content_hash"))
      .as[Doc]
      .transform(dedupStream(_, ttlMinutes))
  }
}
