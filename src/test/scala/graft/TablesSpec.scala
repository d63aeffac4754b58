package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.relational.Queries

/** Guards the events.ts read seam against the physical grain changing
  * again: the driver's testdata has shipped ts as INT64 epoch-nanos
  * (surfaced as BIGINT via nanosAsLong) and as TIMESTAMP(MICROS) NTZ.
  * [[Tables.normalizeEventTs]] must make both invisible to every
  * consumer, so this spec writes the SAME instants in both encodings
  * and pushes them through a real operator, not just the loader.
  */
class TablesSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Micro-aligned instants (both encodings can represent them
    * exactly) spanning several hours and a >30-min session gap.
    */
  private val baseNs = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z
  private def fixtureRows: Seq[(Long, Long, Long, Double, String)] =
    (0L until 200L).map { i =>
      val ns = baseNs + i * 97L * 1000000L + (i % 7) * 3600L * 1000000000L
      (i, i % 13, ns, (i % 29) * 0.25, if (i % 3 == 0) "view" else "click")
    }

  /** Writes the fixture under dir/events.parquet with ts encoded by
    * `enc` ("ns" = raw INT64 epoch-nanos, the shape nanosAsLong
    * surfaces; "us" = TIMESTAMP NTZ micros, the regenerated shape).
    */
  private def writeEvents(dir: String, enc: String): Unit = {
    import spark.implicits._
    val base = fixtureRows.toDF("event_id", "user_id", "ts_ns", "value", "event_type")
    val withTs = enc match {
      case "ns" => base.withColumn("ts", col("ts_ns"))
      case "us" => base.withColumn(
        "ts", timestamp_micros(expr("ts_ns div 1000")).cast("timestamp_ntz"))
    }
    withTs.select("event_id", "user_id", "ts", "value", "event_type")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def withBothEncodings(f: (String, String) => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_ts_enc").toFile
    try {
      val (dNs, dUs) = (s"${root.getPath}/ns", s"${root.getPath}/us")
      writeEvents(dNs, "ns"); writeEvents(dUs, "us")
      f(dNs, dUs)
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(): Unit
      }
      rm(root)
    }
  }

  test("normalizeEventTs yields identical epoch-nanos for both physical grains") {
    withBothEncodings { (dNs, dUs) =>
      val read = (d: String) => Tables(spark, d, "events")
        .select("event_id", "ts").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val (a, b) = (read(dNs), read(dUs))
      assert(a === b)
      assert(a(0L) === baseNs)
      // and the normalized type is the canonical bigint
      assert(Tables(spark, dUs, "events").schema("ts").dataType ===
        org.apache.spark.sql.types.LongType)
    }
  }

  test("a real event-time operator matches across encodings") {
    withBothEncodings { (dNs, dUs) =>
      val run = (d: String) => Queries.qTumbling(spark, d).collect().map(_.toSeq).toSeq
      assert(run(dNs) === run(dUs))
      assert(run(dNs).nonEmpty)
    }
  }

  test("unsupported ts type is rejected loudly, not mis-bucketed") {
    import spark.implicits._
    val bad = Seq((1L, "x")).toDF("event_id", "ts")
      .withColumn("ts", col("ts").cast("string"))
    val e = intercept[IllegalArgumentException](Tables.normalizeEventTs(bad))
    assert(e.getMessage.contains("unsupported physical type"))
  }
}
