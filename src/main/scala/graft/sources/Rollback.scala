package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SNAPSHOT ROLLBACK — the table-format "undo" every production table
  * eventually needs (Iceberg `rollback_to_snapshot`, Delta RESTORE):
  * a bad commit is retired by writing a NEW commit whose file list is
  * exactly the good version's — pure manifest metadata, zero data
  * movement, and crucially NOT an erase: the bad version stays
  * readable (for the incident postmortem) until expire reclaims it.
  * Writes continuing after the rollback build on the restored
  * lineage, so the bad commit becomes a dead branch of history.
  *
  * src_rollback walks exactly that incident: v2 applies the standard
  * changeset (the "bad" commit), v3 rolls back to v1 (new commit,
  * v1's file list verbatim), v4 applies a SECOND, disjoint changeset
  * (+9 cents on k ≡ 0 mod 113 in the merge years) on top of the
  * RESTORED state. The per-version report certifies the whole story:
  * v3 reads exactly v1 (a rollback that rewrote or lost data
  * mismatches), v2 still reads the bad table (history preserved),
  * and v4 contains the second changeset but NO trace of the first —
  * a rollback that merely pointed at v2's lineage would leak the
  * +100/-deletes into v4's sums.
  *
  * Scale shape: the rollback commit is one manifest write — O(file
  * count) metadata, zero data IO, the whole point at 100 TB; the spec
  * additionally pins v3's file list byte-identical to v1's and the
  * post-rollback expire reclaiming the dead branch's files without
  * touching the restored lineage.
  */
object Rollback {

  /** The post-rollback changeset: +9 cents on k ≡ 0 (mod [[UMod2]])
    * within the merge years — update-only, disjoint from nothing in
    * particular (overlap with the rolled-back changeset is the point:
    * v4 must show ONLY this delta).
    */
  val UMod2 = 113L

  def rollback(spark: SparkSession, dir: String): DataFrame = {
    val store = TableMerge.stageStore(spark, dir, "rollback")
    try {
      val base = TableMerge.baseTable(spark, dir)
      // v2: the "bad" commit (the standard D/U/I changeset)
      TableMerge.applyChangeset(spark, store, TableMerge.changeset(base)): Unit
      // v3: metadata-only rollback to v1
      val v3 = SnapshotStore.rollback(store, 1)
      // v4: work continues on the RESTORED lineage
      val ys = TableMerge.MergeYears.map(_.toLong)
      val cs2 = base.filter(col("p").isin(ys: _*) && col("k") % UMod2 === 0)
        .select(col("k"), col("ck"), (col("total_c") + 9L).as("total_c"),
          col("p"), lit("U").as("op"))
      TableMerge.applyChangeset(spark, store, cs2): Unit
      require(v3 == 3 && SnapshotStore.latest(store) == 4,
        s"unexpected version chain under $store")

      val agg = (1 to 4).map { v =>
        SnapshotStore.read(spark, store, v)
          .agg(count(lit(1)).as("n_rows"), sum("k").as("sum_key"),
            sum("total_c").as("sum_total_c"))
          .select(lit(v.toLong).as("version"), col("n_rows"),
            col("sum_key"), col("sum_total_c"))
      }.reduce(_ unionByName _).orderBy("version")
      val rows = agg.collect().toIndexedSeq
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), agg.schema)
    } finally TableMerge.dropStore(store)
  }

  /** Closed-form oracle: v1 = v3 = the base table; v2 = the standard
    * changeset's post-image; v4 = base + ONLY the second changeset.
    */
  val rollbackOracle: String = {
    val ys = TableMerge.MergeYears.mkString(", ")
    s"""WITH base AS (
       |  SELECT o_orderkey AS k,
       |    CAST(FLOOR(o_totalprice*100) AS BIGINT) AS total_c,
       |    CAST(year(o_orderdate) AS BIGINT) AS p
       |  FROM orders),
       |v2 AS (
       |  SELECT k,
       |    total_c + CASE WHEN p IN ($ys) AND k % 97 = 0 AND k % 101 <> 0
       |      THEN 100 ELSE 0 END AS total_c
       |  FROM base WHERE NOT (p IN ($ys) AND k % 101 = 0)
       |  UNION ALL
       |  SELECT k + ${TableMerge.InsOffset}, total_c + 50
       |  FROM base WHERE p IN ($ys) AND k % 103 = 0),
       |v4 AS (
       |  SELECT k,
       |    total_c + CASE WHEN p IN ($ys) AND k % $UMod2 = 0
       |      THEN 9 ELSE 0 END AS total_c
       |  FROM base),
       |rep AS (
       |  SELECT 1 AS version, COUNT(*) AS n, SUM(k) AS sk, SUM(total_c) AS st
       |  FROM base
       |  UNION ALL SELECT 2, COUNT(*), SUM(k), SUM(total_c) FROM v2
       |  UNION ALL SELECT 3, COUNT(*), SUM(k), SUM(total_c) FROM base
       |  UNION ALL SELECT 4, COUNT(*), SUM(k), SUM(total_c) FROM v4)
       |SELECT CAST(version AS BIGINT) AS version,
       |  CAST(n AS BIGINT) AS n_rows, CAST(sk AS BIGINT) AS sum_key,
       |  CAST(st AS BIGINT) AS sum_total_c
       |FROM rep ORDER BY 1""".stripMargin
  }
}
