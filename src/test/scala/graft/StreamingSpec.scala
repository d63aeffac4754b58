package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.EventStreams
import graft.relational.Queries

/** The streaming pipelines must converge to their batch twins on a
  * bounded drain.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def rows(df: org.apache.spark.sql.DataFrame, cols: String*): Set[Seq[Any]] =
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq).toSet

  test("stream_session equals batch sessionization") {
    val streamed = rows(EventStreams.session(spark, dir),
      "user_id", "session_id", "n_events", "dur_sec", "sum_value_c")
    val batch = rows(Queries.qSessionize(spark, dir),
      "user_id", "session_id", "n_events", "dur_sec", "sum_value_c")
    assert(streamed === batch)
  }

  test("stream_tumbling equals batch tumbling (sans distinct users)") {
    val streamed = rows(EventStreams.tumbling(spark, dir),
      "bucket_h", "event_type", "cnt", "sum_value_c")
    val batch = rows(Queries.qTumbling(spark, dir),
      "bucket_h", "event_type", "cnt", "sum_value_c")
    assert(streamed === batch)
  }

  test("stateful sessionizer accumulates across multiple triggers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.streaming.EventStreams.{Ev, SessionOut, sessionsOf}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      Ev(1, 9, 1000, 10, "view"), Ev(2, 9, 1500, 10, "view"),
      Ev(3, 9, 5000, 10, "view"), Ev(4, 9, 5200, 10, "view"),
      Ev(5, 9, 99999, 10, "view"))
    val input = MemoryStream[Ev]
    val sessions = input.toDS().groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Ev], SessionOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[List[Ev]]) =>
          val all = state.getOption.getOrElse(Nil) ++ it.toList
          state.update(all)
          sessionsOf(uid, all).iterator
      }
    val q = sessions.toDF().writeStream.format("memory").queryName("multi_batch_sess")
      .outputMode(OutputMode.Update()).start()
    input.addData(evs.take(2)); q.processAllAvailable()
    input.addData(evs.slice(2, 4)); q.processAllAvailable()
    input.addData(evs.drop(4)); q.processAllAvailable()
    q.stop()
    // Update mode re-emits per trigger; a session's final state is its
    // max-n_events emission. That must equal the batch answer.
    val finalSessions = spark.table("multi_batch_sess")
      .groupBy("user_id", "session_id")
      .agg(org.apache.spark.sql.functions.max("n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = sessionsOf(9, evs).map(s => (s.user_id, s.session_id, s.n_events)).toSet
    assert(finalSessions === expected)
    assert(expected === Set((9L, 1L, 2L), (9L, 2L, 2L), (9L, 3L, 1L)))
  }

  test("sessionsOf splits on the strict 30-min gap boundary") {
    import EventStreams._
    val evs = Seq(
      Ev(1, 7, 1000, 5, "view"),
      Ev(2, 7, 1000 + 1800, 5, "view"),  // exactly 30 min: same session
      Ev(3, 7, 1000 + 1800 + 1801, 5, "view")) // > 30 min: new session
    val s = sessionsOf(7, evs)
    assert(s.map(x => (x.session_id, x.n_events)) === Seq((1L, 2L), (2L, 1L)))
  }
}
