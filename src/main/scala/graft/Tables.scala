package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * At cluster scale these would be external catalog tables; the loader
  * keeps the scan declarative so Catalyst pushes filters/pruning into
  * the parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is INT64 TIMESTAMP(NANOS), which Spark's TimestampType
    // (micros) rejects; read it as raw epoch-nano BIGINT instead and do
    // all time math in exact integer space (see Queries.nsToSec).
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
