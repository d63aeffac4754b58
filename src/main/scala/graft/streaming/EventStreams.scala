package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables
import graft.relational.Queries

/** Structured Streaming twins of the batch event queries: the same
  * exact-integer semantics flowing through `readStream`-style sources,
  * watermarked windows and `flatMapGroupsWithState` sessionization.
  *
  * The driver contract runs on bounded data, so the pipelines here
  * feed a MemoryStream from the events table and drain it with a
  * memory sink — the streaming DAG (state store, window assignment,
  * group-state sessionizer) is identical to a Kafka-fed deployment;
  * only the endpoints differ. Both queries therefore hash-match the
  * same DuckDB oracles as their batch twins.
  */
object EventStreams {

  private val runSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private def sinkName(prefix: String) = s"${prefix}_${runSeq.incrementAndGet()}"

  case class Ev(event_id: Long, user_id: Long, sec: Long, value_c: Long, event_type: String)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        dur_sec: Long, sum_value_c: Long)

  private def typedEvents(spark: SparkSession, dir: String): Dataset[Ev] = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        Queries.nsToSec(col("ts")).as("sec"),
        Queries.cents(col("value")).as("value_c"), col("event_type"))
      .as[Ev]
  }

  /** Gap-based session builder over one user's time-sorted events —
    * the single-pass core shared by tests and the stateful operator.
    */
  def sessionsOf(uid: Long, evs: Seq[Ev], gapSec: Long = 1800): Seq[SessionOut] = {
    if (evs.isEmpty) return Nil
    val sorted = evs.sortBy(e => (e.sec, e.event_id))
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    var sid = 0L; var start = 0L; var last = 0L; var n = 0L; var sum = 0L
    for (e <- sorted) {
      if (n == 0 || e.sec - last > gapSec) {
        if (n > 0) out += SessionOut(uid, sid, n, last - start, sum)
        sid += 1; start = e.sec; n = 0; sum = 0
      }
      n += 1; sum += e.value_c; last = e.sec
    }
    out += SessionOut(uid, sid, n, last - start, sum)
    out.toSeq
  }

  /** stream_tumbling — watermarked 1-hour tumbling windows over the
    * event stream (Complete mode into the bounded sink; with an
    * unbounded source the same plan runs Append once the watermark
    * passes each window).
    */
  def tumbling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(typedEvents(spark, dir).collect().toSeq)
    val agg = input.toDS()
      .withColumn("ets", timestamp_seconds(col("sec")))
      .withWatermark("ets", "1 hour")
      .groupBy(window(col("ets"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value_c")).as("sum_value_c"))
      .select(floor(unix_timestamp(col("window.start")) / lit(3600.0)).cast("long").as("bucket_h"),
        col("event_type"), col("cnt"), col("sum_value_c"))
    val sink = sinkName("stream_tumbling")
    val q = agg.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable(); q.stop()
    spark.table(sink).orderBy("bucket_h", "event_type")
  }

  /** stream_session — stateful sessionization via
    * flatMapGroupsWithState: per-user group state accumulates events;
    * every trigger re-emits that user's closed+open sessions (Update
    * mode). On a bounded drain this converges to the batch answer.
    */
  def session(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(typedEvents(spark, dir).collect().toSeq)
    val sessions = input.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Ev], SessionOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[List[Ev]]) =>
          val all = state.getOption.getOrElse(Nil) ++ it.toList
          state.update(all)
          sessionsOf(uid, all).iterator
      }
    val sink = sinkName("stream_session")
    val q = sessions.toDF().writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Update()).start()
    q.processAllAvailable(); q.stop()
    spark.table(sink).orderBy("user_id", "session_id")
  }

  /** stream_dedup — streaming exact deduplication: state-store-backed
    * `dropDuplicates` on the content hash (the streaming face of
    * dedup_exact; with an unbounded source you'd add a watermark to
    * bound the state retention window). Output is the distinct key
    * set — deterministic regardless of arrival order.
    */
  def dedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val keys = Tables(spark, dir, "documents")
      .select(md5(col("text")).as("key")).as[String].collect().toSeq
    val input = MemoryStream[String]
    input.addData(keys)
    val sink = sinkName("stream_dedup")
    val q = input.toDS().toDF("key").dropDuplicates("key")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable(); q.stop()
    spark.table(sink).orderBy("key")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling" -> (tumbling _),
    "stream_session" -> (session _),
    "stream_dedup" -> (dedup _)
  )

  /** Oracles: same shapes as the batch twins (users column omitted
    * from tumbling — exact distinct counts aren't a streaming agg).
    */
  val oracles: Map[String, String] = Map(
    "stream_dedup" ->
      "SELECT DISTINCT md5(text) AS key FROM documents ORDER BY key",
    "stream_tumbling" ->
      """WITH e AS (
        |  SELECT CAST(FLOOR((epoch_ns(ts) // 1000000000)/3600.0) AS BIGINT) AS bucket_h,
        |    event_type, CAST(FLOOR((value)*100) AS BIGINT) AS value_c
        |  FROM events)
        |SELECT bucket_h, event_type, COUNT(*) AS cnt,
        |  CAST(SUM(value_c) AS BIGINT) AS sum_value_c
        |FROM e GROUP BY bucket_h, event_type
        |ORDER BY bucket_h, event_type""".stripMargin,
    "stream_session" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS sec,
        |    CAST(FLOOR((value)*100) AS BIGINT) AS value_c
        |  FROM events),
        |s AS (
        |  SELECT *, CASE WHEN lag(sec) OVER w IS NULL
        |                   OR sec - lag(sec) OVER w > 1800
        |            THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |t AS (
        |  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM s)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  CAST(MAX(sec) - MIN(sec) AS BIGINT) AS dur_sec,
        |  CAST(SUM(value_c) AS BIGINT) AS sum_value_c
        |FROM t GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin
  )
}
