package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL CHANGELOG SCAN between two snapshot versions — the
  * Iceberg `changelog` / Delta CDF idea: a downstream consumer of a
  * versioned 100 TB table must not re-read the table to learn what a
  * merge changed; the manifests already say. The diff plans from
  * metadata alone: `removed` = files referenced by v1 but not v2,
  * `added` = files referenced by v2 but not v1 (for a copy-on-write
  * merge, exactly the touched partitions' before/after files), then
  * ONE full-outer key join over those bounded file sets classifies
  * every key as I (inserted), D (deleted), U (updated — value
  * changed) or N (rewritten unchanged — the copy-on-write
  * amplification made visible: rows that were rewritten only because
  * they share a partition with a change).
  *
  * src_snapshot_diff runs the deterministic merge and emits the
  * per-op aggregate; the oracle restates the changeset rules in
  * closed form, so a lost delete, a double-applied update, or a diff
  * that silently read untouched partitions all hash-mismatch.
  *
  * Scale shape: the file-set difference is driver-side manifest
  * arithmetic (no listing, no data IO); the scans read ONLY the
  * added/removed files — O(churn), never O(table); the join keys are
  * the touched partitions' rows.
  */
object SnapshotDiff {

  private def tmpfsRoot: String = {
    val base = new java.io.File("/dev/shm")
    if (base.isDirectory && base.canWrite) "/dev/shm"
    else System.getProperty("java.io.tmpdir")
  }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
  }

  /** The diff frame between two committed versions: (k, op, total_c)
    * where total_c is the post-image for I/U/N and the pre-image for D.
    */
  private[sources] def diff(spark: SparkSession, store: String,
      v1: Int, v2: Int): DataFrame = {
    val f1 = SnapshotStore.files(store, v1).toSet
    val f2 = SnapshotStore.files(store, v2).toSet
    def rd(fs: Seq[String]): DataFrame =
      if (fs.isEmpty)
        spark.range(0).select(lit(0L).as("k"), lit(0L).as("total_c"))
      else spark.read.option("basePath", store)
        .parquet(fs.sorted.map(f => s"$store/$f"): _*)
        .select(col("k"), col("total_c"))
    val removed = rd((f1 -- f2).toSeq)
    val added = rd((f2 -- f1).toSeq)
    removed.select(col("k"), col("total_c").as("tc_old"))
      .join(added.select(col("k"), col("total_c").as("tc_new")),
        Seq("k"), "full_outer")
      .select(col("k"),
        when(col("tc_old").isNull, "I")
          .when(col("tc_new").isNull, "D")
          .when(col("tc_old") =!= col("tc_new"), "U")
          .otherwise("N").as("op"),
        coalesce(col("tc_new"), col("tc_old")).as("total_c"))
  }

  /** src_snapshot_diff — merge then read the change feed from the
    * manifests.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val store = s"$tmpfsRoot/graft_sdiff_${graft.Staging.token()}"
    rm(new java.io.File(store))
    try {
      val (v1, v2, _) = TableMerge.runMerge(spark, dir, store)
      val agg = diff(spark, store, v1, v2)
        .groupBy("op")
        .agg(count(lit(1)).as("n_keys"), sum("k").as("sum_key"),
          sum("total_c").as("sum_total_c"))
        .orderBy("op")
      val rows = agg.collect().toIndexedSeq
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), agg.schema)
    } finally rm(new java.io.File(store))
  }

  /** Closed-form oracle: the changeset rules per op. D carries the
    * pre-image value, U the +100 post-image, I the +50 clone at
    * k+offset, N the untouched rows of the touched partitions.
    */
  val diffOracle: String = {
    val ys = TableMerge.MergeYears.mkString(", ")
    s"""WITH base AS (
       |  SELECT o_orderkey AS k,
       |    CAST(FLOOR(o_totalprice*100) AS BIGINT) AS total_c,
       |    CAST(year(o_orderdate) AS BIGINT) AS p
       |  FROM orders),
       |t AS (SELECT * FROM base WHERE p IN ($ys)),
       |d AS (
       |  SELECT k, 'D' AS op, total_c FROM t WHERE k % 101 = 0
       |  UNION ALL
       |  SELECT k, 'U', total_c + 100 FROM t WHERE k % 97 = 0 AND k % 101 <> 0
       |  UNION ALL
       |  SELECT k + ${TableMerge.InsOffset}, 'I', total_c + 50
       |  FROM t WHERE k % 103 = 0
       |  UNION ALL
       |  SELECT k, 'N', total_c FROM t WHERE k % 101 <> 0 AND k % 97 <> 0)
       |SELECT op, COUNT(*) AS n_keys, CAST(SUM(k) AS BIGINT) AS sum_key,
       |  CAST(SUM(total_c) AS BIGINT) AS sum_total_c
       |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
