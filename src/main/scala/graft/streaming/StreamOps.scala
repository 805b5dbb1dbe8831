package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators.
  *
  * The reference is batch-only (SURVEY.md §2.11) — its HITL "loop" is
  * re-running batch jobs — so these are the engine's forward-looking
  * stream path: the same windowed aggregates and sessionization a
  * continuously-crawled page/event feed needs, with watermarks bounding
  * state. Tested against a file source + memory sink (StreamingSpec).
  */
object StreamOps {

  /** Tumbling-window counts/sums per event_type with a watermark. */
  def windowedCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total"))

  /** Streaming triple extraction: the extract stage is stateless Column
    * logic, so the SAME TripleExtract.assertions transform runs on a
    * readStream of pages unchanged — continuous crawl ingestion.
    */
  def assertionsStream(pagesStream: DataFrame): DataFrame =
    graft.extract.TripleExtract.assertions(pagesStream)

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionUpdate(user_id: Long, n_events: Long, total: Double)

  /** Stateful per-user running aggregates via mapGroupsWithState. */
  def sessionize(events: Dataset[Event]): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Double), SessionUpdate](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { e => n += 1; v += e.value }
          state.update((n, v))
          SessionUpdate(uid, n, v)
      }
  }
}
