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
