package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured Streaming surface of the engine.
  *
  * The reference has no streams — its "continuous" path is transactional DML
  * arriving row-by-row through index hooks (reference
  * src/hnsw/hnsw_index.cpp:466-500). The Spark-native generalization:
  * micro-batches appended to an engine table AND its HNSW indexes via
  * `foreachBatch` → [[graft.Graft.insertInto]], plus event-time windowed
  * aggregation with watermarks for the analytics side.
  *
  * Scale shape: each micro-batch is a bounded delta (rowids continue from
  * the table's max; NULL vectors skipped exactly like batch DML), so state
  * never accumulates on the driver beyond the index delta itself; the
  * windowed aggregations keep bounded state via watermark eviction. */
object GraftStreaming {

  /** Continuous ingestion into a registered engine table + its indexes:
    * every micro-batch flows through the same DML path as batch inserts
    * (rowid continuation, NULL-vector skip, index append). Every
    * `rematerializeEvery` batches the table view is collapsed back to a
    * single storage-backed relation — without it, N batches leave an
    * N-deep union view and O(N) analysis cost per downstream query. Call
    * `.start()` on the returned writer (optionally after setting checkpoint
    * options). */
  def indexAppendWriter(spark: SparkSession, table: String, stream: DataFrame,
      rematerializeEvery: Int = 64): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.Graft.insertInto(spark, table, batch)
        if (rematerializeEvery > 0 && (batchId + 1) % rematerializeEvery == 0) {
          graft.Graft.rematerialize(spark, table)
        }
        ()
      }

  /** Start the ingestion immediately (in-memory checkpointing). */
  def startIndexAppend(spark: SparkSession, table: String, stream: DataFrame,
      rematerializeEvery: Int = 64): StreamingQuery =
    indexAppendWriter(spark, table, stream, rematerializeEvery).start()

  /** Streaming exact dedup with custom state: the FIRST row per key (e.g. a
    * content fingerprint from TextAnalysis.fingerprint) survives, every
    * later duplicate — same batch or any later batch — is dropped. One
    * boolean of state per distinct key via `flatMapGroupsWithState`; state
    * is partitioned by key across executors, so it scales with distinct
    * keys per executor, not stream length. (Bound state further with a
    * TTL'd key design when fingerprints are unbounded.) */
  def dedupStream(docs: DataFrame, keyCol: String): DataFrame = {
    val schema = docs.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val enc = Encoders.row(schema)
    docs.as(enc)
      .groupByKey((r: Row) => r.getString(keyIdx))(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1)
          })(Encoders.scalaBoolean, enc)
      .toDF()
  }

  /** Gap-based session windows over event time — the streaming shape of
    * [[graft.ops.Sessionize]] (q40). Declarative `session_window` (not
    * custom state): Catalyst merges overlapping per-key windows as events
    * arrive and the watermark finalizes + evicts a session once event time
    * passes its close by `lateness`, so state is O(open sessions), not
    * O(stream). Emits one row per CLOSED session (append mode). */
  def sessionizedCounts(events: DataFrame, tsCol: String, keyCol: String,
      gap: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col(keyCol), col("n_events"))

  /** Event-time tumbling-window counts with bounded state — the streaming
    * shape of the hourly-events rollup (q08): watermark evicts windows older
    * than `lateness`, so state is O(active windows), not O(stream). */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowLength: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col(keyCol), col("n"))
}
