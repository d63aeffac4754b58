package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** CDC MERGE (upsert + delete) against a [[SnapshotStore]]-versioned
  * partitioned table — the Delta/Iceberg `MERGE INTO` re-expressed as
  * manifest-planned copy-on-write: apply a changeset of inserts,
  * updates, and deletes by rewriting ONLY the partitions the
  * changeset touches, commit a new manifest referencing the untouched
  * partitions' ORIGINAL immutable files plus the rewritten ones, and
  * leave every older version readable until expire. At 100 TB this is
  * the difference between a merge that rewrites terabytes and one
  * that rewrites the handful of date partitions a day's CDC feed
  * lands in — the read side plans from the manifest's explicit file
  * list either way, so concurrent readers of v1 never see a torn
  * table.
  *
  * The changeset here is derived deterministically from the orders
  * table itself (key-residue rules over two target years), so the
  * DuckDB oracle can state the post-merge table in closed form; the
  * spec additionally pins the file-level contract — untouched
  * partitions keep byte-identical file lists across the merge, and
  * time travel to v1 still reads the pre-merge table.
  */
object TableMerge {

  /** Partitions (order years) the synthetic changeset touches. */
  val MergeYears: Seq[Int] = Seq(1994, 1996)

  /** Insert-key offset — far above any base o_orderkey. */
  val InsOffset = 10000000L

  private def tmpfsRoot: String = {
    val base = new java.io.File("/dev/shm")
    if (base.isDirectory && base.canWrite) "/dev/shm"
    else System.getProperty("java.io.tmpdir")
  }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
  }

  /** The base table: one row per order, partitioned by order year. */
  private def baseTable(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        floor(col("o_totalprice") * 100).cast("long").as("total_c"),
        year(col("o_orderdate")).cast("long").as("p"))

  /** The deterministic changeset over [[MergeYears]]: deletes
    * (k ≡ 0 mod 101), updates (k ≡ 0 mod 97, not deleted; +100 cents),
    * inserts (a clone of k ≡ 0 mod 103 rows at k + [[InsOffset]],
    * +50 cents). `op` ∈ D/U/I.
    */
  private[sources] def changeset(base: DataFrame): DataFrame = {
    val t = base.filter(col("p").isin(MergeYears.map(_.toLong): _*))
    val del = t.filter(col("k") % 101 === 0)
      .select(col("k"), col("ck"), col("total_c"), col("p"), lit("D").as("op"))
    val upd = t.filter(col("k") % 97 === 0 && col("k") % 101 =!= 0)
      .select(col("k"), col("ck"), (col("total_c") + 100L).as("total_c"),
        col("p"), lit("U").as("op"))
    val ins = t.filter(col("k") % 103 === 0)
      .select((col("k") + InsOffset).as("k"), col("ck"),
        (col("total_c") + 50L).as("total_c"), col("p"), lit("I").as("op"))
    del.unionByName(upd).unionByName(ins)
  }

  /** Run the copy-on-write merge inside `store`; returns
    * (v1, v2, touched partition values). Exposed for the spec.
    */
  private[sources] def runMerge(spark: SparkSession, dir: String,
      store: String): (Int, Int, Seq[Long]) = {
    val base = baseTable(spark, dir)
    base.write.mode(SaveMode.Overwrite).partitionBy("p").parquet(store)
    // drop Spark's _SUCCESS marker etc.: the manifest lists data files
    val v1 = SnapshotStore.commit(store, SnapshotStore.listDataFiles(store))
    val cs = changeset(base).localCheckpoint()
    // the touched-partition list is bounded by the table's partition
    // count (a CDC batch touches a handful of dates) — a legitimate
    // driver-side plan input, like any partition-pruning predicate
    val touched = cs.select("p").distinct().collect().map(_.getLong(0)).toSeq.sorted
    val v1Files = SnapshotStore.files(store, v1)
    val touchedFiles = v1Files.filter(f =>
      touched.exists(p => f.startsWith(s"p=$p/")))
    val untouched = v1Files.filterNot(touchedFiles.toSet)
    val cur = spark.read.option("basePath", store)
      .parquet(touchedFiles.map(f => s"$store/$f"): _*)
      .select(col("k"), col("ck"), col("total_c"), col("p").cast("long").as("p"))
    // MERGE semantics: D/U keys leave, U/I rows enter — one key-keyed
    // anti join over ONLY the touched partitions' rows
    val gone = cs.filter(col("op").isin("D", "U")).select(col("k"))
    val enter = cs.filter(col("op").isin("U", "I"))
      .select(col("k"), col("ck"), col("total_c"), col("p"))
    val before = SnapshotStore.listDataFiles(store).toSet
    cur.join(gone, Seq("k"), "left_anti")
      .unionByName(enter)
      .repartition(col("p"))
      .write.mode(SaveMode.Append).partitionBy("p").parquet(store)
    val newFiles = SnapshotStore.listDataFiles(store).filterNot(before)
    val v2 = SnapshotStore.commit(store, untouched ++ newFiles)
    (v1, v2, touched)
  }

  /** src_snapshot_merge — the oracle row: run the merge, read v2
    * through its manifest, report per-partition row counts and exact
    * checksums. The oracle states the post-merge table in closed form
    * from `orders`, so a lost delete, double-applied update, or
    * leaked untouched-partition rewrite all hash-mismatch.
    */
  def snapshotMerge(spark: SparkSession, dir: String): DataFrame = {
    val store = s"$tmpfsRoot/graft_tmerge_${ProcessHandle.current().pid()}"
    rm(new java.io.File(store))
    try {
      val (_, v2, _) = runMerge(spark, dir, store)
      val out = SnapshotStore.read(spark, store, v2)
        .select(col("k"), col("total_c"), col("p").cast("long").as("p"))
        .groupBy("p")
        .agg(count(lit(1)).as("n_rows"), sum(col("total_c")).as("sum_total_c"),
          sum(col("k")).as("sum_key"))
        .orderBy("p")
      val rows = out.collect().toIndexedSeq
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), out.schema)
    } finally rm(new java.io.File(store))
  }
}
