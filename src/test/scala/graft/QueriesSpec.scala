package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.relational.Queries

/** Semantics checks for the relational core on the sf0.001 tables. */
class QueriesSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed fact tables co-locate the join: no Exchange in the plan") {
    import org.apache.spark.sql.functions.col
    // the SURVEY §3 claim: bucketing both fact tables on the join key
    // replaces the per-query shuffle with a one-time layout cost
    val l = Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables(spark, dir, "orders").select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS l_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("l_bkt")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bkt")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val j = spark.table("l_bkt")
        .join(spark.table("o_bkt"), col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it computes the same thing as the plain shuffle join
      val expected = l.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS l_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }

  test("q_pivot cells reconcile with q_tumbling's long-format sums") {
    import org.apache.spark.sql.functions.col
    val long = Queries.qTumbling(spark, dir).collect()
      .map(r => (r.getAs[Long]("bucket_h"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("sum_value_c")).toMap
    val wide = Queries.qPivot(spark, dir).collect()
    assert(wide.nonEmpty)
    wide.foreach { r =>
      val h = r.getAs[Long]("bucket_h")
      Queries.EventTypes.foreach { t =>
        assert(r.getAs[Long](s"sum_${t}_c") === long.getOrElse((h, t), 0L),
          s"bucket $h type $t")
      }
    }
    // every long-format cell is represented in the wide format: the
    // fixed pivot domain must actually cover the data's domain
    assert(long.keySet.map(_._2).subsetOf(Queries.EventTypes.toSet),
      "events contain a type outside the fixed pivot domain")
    assert(wide.map(_.getAs[Long]("bucket_h")).toSet === long.keySet.map(_._1))
  }

  test("q1 aggregates to the 6 flag/status groups with exact cents") {
    val rows = Queries.q1Agg(spark, dir).collect()
    assert(rows.length === 6)
    assert(rows.map(_.getLong(6)).sum > 0) // cnt
  }

  test("q3 returns exactly 10 rows ordered by revenue desc with key tiebreak") {
    val rows = Queries.q3Topk(spark, dir).collect()
    assert(rows.length === 10)
    val revs = rows.map(_.getLong(2))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("sessionization never splits events closer than the 30-min gap") {
    val sess = Queries.qSessionize(spark, dir)
    // every session's span must be consistent: n_events>=1, dur>=0
    val bad = sess.filter("n_events < 1 or dur_sec < 0").count()
    assert(bad === 0)
    // sessions per user are dense 1..K
    val dense = sess.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("session_id").as("mx"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .filter("mx != n").count()
    assert(dense === 0)
  }

  test("window rn is dense per user") {
    val w = Queries.qWindow(spark, dir)
    val perUser = w.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("rn").as("mx"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .filter("mx != n").count()
    assert(perUser === 0)
  }

  test("rollup contains per-nation, per-region and grand-total strata") {
    val gids = Queries.qRollup(spark, dir).select("gid").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(gids === Set(0L, 1L, 3L))
  }
}
