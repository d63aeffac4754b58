package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Manifest-level statistics pruning — the Iceberg idea that
  * completes [[graft.relational.Queries.qZorderSkip]]'s arithmetic
  * report with an ACTUAL pruned read: the writer records per-file
  * min/max column stats as a stats table beside the data (what
  * Iceberg keeps in manifest files), and a reader with a range
  * predicate plans its file list FROM THE STATS — the data files a
  * 100 TB scan never opens are the whole point. The op certifies the
  * pruned read end to end: the emitted row carries files_total /
  * files_read / rows_read plus the exact aggregate of the matching
  * rows, and the closed-form oracle recomputes all of it from
  * `orders` — a pruned-away file that contained a match would
  * hash-mismatch the aggregate, an under-pruned plan would
  * hash-mismatch files_read.
  */
object StatsPrune {

  /** Files per partition (orderkey-range split). */
  val PruneFiles = 4L

  private def tmpfsRoot: String = {
    val base = new java.io.File("/dev/shm")
    if (base.isDirectory && base.canWrite) "/dev/shm"
    else System.getProperty("java.io.tmpdir")
  }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
  }

  /** src_stats_prune — write orders as (year, orderkey-range) files
    * with a per-file stats table, then serve a key-range query by
    * reading ONLY the stats-overlapping files.
    */
  def statsPrune(spark: SparkSession, dir: String): DataFrame = {
    val store = s"$tmpfsRoot/graft_sprune_${ProcessHandle.current().pid()}"
    rm(new java.io.File(store))
    try {
      val o = Tables(spark, dir, "orders")
        .select(col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100).cast("long").as("total_c"),
          year(col("o_orderdate")).cast("long").as("p"))
      val mx = o.agg(max("k").as("mk"))
      val base = o.crossJoin(broadcast(mx))
        .withColumn("fid", expr(s"(k * $PruneFiles) div (mk + 1L)"))
      base.select(col("k"), col("total_c"), col("p"), col("fid"))
        .repartition(col("p"), col("fid"))
        .write.mode(SaveMode.Overwrite).partitionBy("p", "fid")
        .parquet(s"$store/data")
      // the "manifest": per-file min/max/count stats, persisted beside
      // the data exactly like Iceberg manifest entries
      base.groupBy("p", "fid")
        .agg(min("k").as("lo_k"), max("k").as("hi_k"),
          count(lit(1)).as("n_rows"))
        .write.mode(SaveMode.Overwrite).parquet(s"$store/stats")

      val stats = spark.read.parquet(s"$store/stats")
      val bounds = mx.select(expr("(30L * mk) div 100L").as("lo_b"),
        expr("(35L * mk) div 100L").as("hi_b")).collect()(0)
      val (loB, hiB) = (bounds.getLong(0), bounds.getLong(1))
      // plan the file list FROM THE STATS — bounded driver-side list,
      // the same order of metadata Iceberg manifests hand a planner
      val hit = stats.filter(col("hi_k") >= loB && col("lo_k") <= hiB)
        .select("p", "fid").collect()
        .map(r => s"$store/data/p=${r.getLong(0)}/fid=${r.getLong(1)}")
      val filesTotal = stats.count()
      val pruned = spark.read.option("basePath", s"$store/data")
        .parquet(hit.toIndexedSeq: _*)
      val agg = pruned
        .agg(count(lit(1)).as("rows_read"),
          sum(when(col("k") >= loB && col("k") <= hiB, 1L).otherwise(0L))
            .as("n_match"),
          coalesce(sum(when(col("k") >= loB && col("k") <= hiB,
            col("total_c"))), lit(0L)).as("sum_total_c"),
          coalesce(sum(when(col("k") >= loB && col("k") <= hiB, col("k"))),
            lit(0L)).as("sum_key"))
        .select(lit(filesTotal).as("files_total"),
          lit(hit.length.toLong).as("files_read"),
          col("rows_read"), col("n_match"), col("sum_total_c"), col("sum_key"))
      val rows = agg.collect().toIndexedSeq
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), agg.schema)
    } finally rm(new java.io.File(store))
  }

  /** Closed-form oracle: the same stats arithmetic from `orders`. */
  val pruneOracle: String =
    s"""WITH o AS (SELECT o_orderkey AS k,
       |    CAST(FLOOR(o_totalprice*100) AS BIGINT) AS total_c,
       |    CAST(year(o_orderdate) AS BIGINT) AS p
       |  FROM orders),
       |mx AS (SELECT MAX(k) AS mk FROM o),
       |b AS (SELECT o.*, (k * $PruneFiles) // (mk + 1) AS fid,
       |        (30 * mk) // 100 AS lo_b, (35 * mk) // 100 AS hi_b
       |      FROM o, mx),
       |st AS (SELECT p, fid, MIN(k) AS lo_k, MAX(k) AS hi_k,
       |         COUNT(*) AS n_rows, MAX(lo_b) AS lo_b, MAX(hi_b) AS hi_b
       |       FROM b GROUP BY 1, 2),
       |hit AS (SELECT * FROM st WHERE hi_k >= lo_b AND lo_k <= hi_b)
       |SELECT (SELECT COUNT(*) FROM st) AS files_total,
       |  (SELECT COUNT(*) FROM hit) AS files_read,
       |  CAST((SELECT COALESCE(SUM(n_rows), 0) FROM hit) AS BIGINT) AS rows_read,
       |  (SELECT COUNT(*) FROM b WHERE k BETWEEN lo_b AND hi_b) AS n_match,
       |  CAST((SELECT COALESCE(SUM(total_c), 0) FROM b
       |        WHERE k BETWEEN lo_b AND hi_b) AS BIGINT) AS sum_total_c,
       |  CAST((SELECT COALESCE(SUM(k), 0) FROM b
       |        WHERE k BETWEEN lo_b AND hi_b) AS BIGINT) AS sum_key""".stripMargin
}
