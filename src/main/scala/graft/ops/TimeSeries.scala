package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.relational.Queries.{cents, nsToSec}

/** Time-series ANALYSIS over the hourly event series — the
  * monitoring layer a 100 TB event pipeline runs on top of the
  * resample family ([[graft.relational.Queries.qOhlc]] builds bars,
  * qGapfill fills holes, qEwma smooths; these three rows DETECT:
  * rolling-baseline anomalies, seasonal structure, and level shifts).
  *
  * All three ride one shared hourly aggregate (event_type, bucket_h,
  * x_c) — a map-side-combinable groupBy that reduces the raw event
  * stream to a bounded series frame (buckets × types, metadata scale:
  * the 100 TB of events collapse to the time horizon in hours before
  * any window runs). Every derived statistic is EXACT integer
  * arithmetic — linear terms in BIGINT, squared terms lifted to
  * DECIMAL(38,0) (HUGEINT on the DuckDB side) so the z² comparison
  * never sees a float — both engines agree bit-for-bit.
  */
object TimeSeries {

  /** Rolling baseline width (buckets) for [[anomaly]]. */
  val AnomW = 24

  /** Minimum baseline occupancy before a flag can fire. */
  val AnomMinN = 12

  /** The shared hourly series: one row per (event_type, bucket_h)
    * carrying the exact cent sum and event count.
    */
  private def series(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_type"), nsToSec(col("ts")).as("sec"),
        cents(col("value")).as("v_c"))
      .withColumn("bucket_h", expr("sec div 3600").cast("long"))
      .groupBy("event_type", "bucket_h")
      .agg(sum(col("v_c")).as("x_c"), count(lit(1)).as("n_ev"))

  /** The shared series CTE, DuckDB dialect — the same grouping the
    * Spark side computes, restated once and prefixed to all three
    * oracles so the bucket arithmetic cannot drift between rows.
    */
  private val seriesSql: String =
    """WITH b AS (
      |  SELECT event_type,
      |    CAST((epoch_ns(ts) // 1000000000) // 3600 AS BIGINT) AS bucket_h,
      |    CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) AS BIGINT) AS x_c,
      |    COUNT(*) AS n_ev
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** ts_anomaly — rolling-baseline anomaly flags over the hourly
    * revenue series: each bucket is scored against the PRECEDING
    * [[AnomW]] buckets of its event_type (ROWS BETWEEN 24 PRECEDING
    * AND 1 PRECEDING — strictly causal, the current bucket never
    * contaminates its own baseline). The classic z > 3 test is
    * evaluated WITHOUT ever forming z: z² = (n·x−s)² ∕ (n·ss−s²), so
    * flag ⟺ (n·x−s)² > 9·(n·ss−s²) — linear terms in BIGINT, both
    * squared sides lifted to DECIMAL(38,0)/HUGEINT, pure integer
    * comparison, no sqrt/float seam between engines. A zero-variance
    * baseline with x off the constant is an anomaly by convention
    * (z = ∞); z2_x100 reports ⌊100·z²⌋ (−1 when undefined) so the
    * row carries the magnitude, not just the bit.
    *
    * Scale shape: the raw scan reduces to the bounded series frame
    * first; the rolling window then runs over buckets × types rows
    * (metadata scale — the horizon in hours), partitioned by type.
    * At extreme bucket sums the BIGINT linear terms would lift to
    * DECIMAL too; at the gate scales they sit 300× under the 2⁶³
    * line (bounds in the spec).
    */
  def anomaly(spark: SparkSession, dir: String): DataFrame =
    scoreAnomaly(series(spark, dir))

  /** The causal scoring pass over a (event_type, bucket_h, x_c)
    * series frame — the seam [[graft.streaming.EventStreams]]'s
    * stream_anomaly twin shares: the stream assembles the SAME series
    * through watermarked window closure, then scores the bounded
    * closed-bucket frame here (the scoring input is metadata scale —
    * the horizon in hours — so the post-drain pass is free at any
    * corpus size).
    */
  private[graft] def scoreAnomaly(ser: DataFrame): DataFrame = {
    val win = Window.partitionBy("event_type").orderBy("bucket_h")
      .rowsBetween(-AnomW, -1)
    val xd = col("x_c").cast("decimal(19,0)")
    val b = ser
      .withColumn("n_b", count(lit(1)).over(win))
      .withColumn("s_b", coalesce(sum(col("x_c")).over(win), lit(0L)))
      .withColumn("ss_b",
        coalesce(sum((xd * xd).cast("decimal(38,0)")).over(win),
          lit(0L).cast("decimal(38,0)")))
    val dv = (col("n_b") * col("x_c") - col("s_b")).cast("decimal(19,0)")
    val num = (dv * dv).cast("decimal(38,0)")
    val den = (col("n_b").cast("decimal(19,0)") * col("ss_b").cast("decimal(19,0)"))
      .cast("decimal(38,0)") -
      (col("s_b").cast("decimal(19,0)") * col("s_b").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
    b.withColumn("is_anomaly",
        when(col("n_b") >= AnomMinN &&
          ((den > 0 && num > den * 9) || (den === 0 && dv =!= 0)), 1L)
          .otherwise(0L))
      .withColumn("z2_x100",
        when(den > 0, expr("CAST((100 * ((n_b*x_c - s_b)*(n_b*x_c - s_b))) div " +
          "(n_b*ss_b - s_b*s_b) AS BIGINT)"))
          .otherwise(lit(-1L)))
      .select(col("event_type"), col("bucket_h"), col("x_c"),
        col("n_b"), col("is_anomaly"), col("z2_x100"))
      .orderBy("event_type", "bucket_h")
  }

  private val anomalyOracle: String =
    s"""$seriesSql,
       |w AS (
       |  SELECT *, COUNT(*) OVER win AS n_b,
       |    COALESCE(SUM(x_c) OVER win, 0) AS s_b,
       |    COALESCE(SUM(CAST(x_c AS HUGEINT) * x_c) OVER win, 0) AS ss_b
       |  FROM b WINDOW win AS (PARTITION BY event_type ORDER BY bucket_h
       |    ROWS BETWEEN $AnomW PRECEDING AND 1 PRECEDING)),
       |z AS (
       |  SELECT *, CAST(n_b AS HUGEINT)*x_c - s_b AS dv,
       |    CAST(n_b AS HUGEINT)*ss_b - CAST(s_b AS HUGEINT)*s_b AS den
       |  FROM w)
       |SELECT event_type, bucket_h, x_c, n_b,
       |  CAST(CASE WHEN n_b >= $AnomMinN AND
       |      ((den > 0 AND dv*dv > 9*den) OR (den = 0 AND dv <> 0))
       |    THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly,
       |  CAST(CASE WHEN den > 0 THEN (100*dv*dv) // den ELSE -1 END AS BIGINT)
       |    AS z2_x100
       |FROM z ORDER BY event_type, bucket_h""".stripMargin

  /** ts_seasonal — classical additive decomposition of the hourly
    * series: x = seasonal + trend + residual. The seasonal component
    * is the hour-of-day profile (per (event_type, bucket_h mod 24):
    * the exact integer mean of all buckets sharing that clock hour —
    * the "traffic peaks at 9am" shape), the trend a centered
    * 24-bucket moving average (ROWS 11 PRECEDING..12 FOLLOWING,
    * emitted only where the window is FULL — a partial-edge mean
    * would mix scales), the residual the exact difference. All
    * divisions are positive-integer // — floor and truncate agree,
    * so the decomposition is bit-identical across engines.
    *
    * Scale shape: one bounded series frame, one (type, hod) profile
    * aggregate (≤ types × 24 rows, broadcast back), one centered
    * window over the bounded series — nothing rescans events.
    */
  def seasonal(spark: SparkSession, dir: String): DataFrame = {
    val b = series(spark, dir).withColumn("hod", col("bucket_h") % 24)
    val prof = b.groupBy("event_type", "hod")
      .agg(expr("CAST(sum(x_c) div count(1) AS BIGINT)").as("seasonal_c"))
    val ctr = Window.partitionBy("event_type").orderBy("bucket_h")
      .rowsBetween(-11, 12)
    b.withColumn("n_w", count(lit(1)).over(ctr))
      .withColumn("s_w", sum(col("x_c")).over(ctr))
      .filter(col("n_w") === 24)
      .join(broadcast(prof), Seq("event_type", "hod"))
      .withColumn("trend_c", expr("CAST(s_w div 24 AS BIGINT)"))
      .select(col("event_type"), col("bucket_h"), col("hod"), col("x_c"),
        col("seasonal_c"), col("trend_c"),
        (col("x_c") - col("seasonal_c") - col("trend_c")).as("resid_c"))
      .orderBy("event_type", "bucket_h")
  }

  private val seasonalOracle: String =
    s"""$seriesSql,
       |h AS (SELECT *, bucket_h % 24 AS hod FROM b),
       |prof AS (
       |  SELECT event_type, hod,
       |    CAST(SUM(x_c) // COUNT(*) AS BIGINT) AS seasonal_c
       |  FROM h GROUP BY event_type, hod),
       |t AS (
       |  SELECT *, COUNT(*) OVER ctr AS n_w, SUM(x_c) OVER ctr AS s_w
       |  FROM h WINDOW ctr AS (PARTITION BY event_type ORDER BY bucket_h
       |    ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING))
       |SELECT t.event_type, t.bucket_h, t.hod, t.x_c, prof.seasonal_c,
       |  CAST(t.s_w // 24 AS BIGINT) AS trend_c,
       |  CAST(t.x_c - prof.seasonal_c - t.s_w // 24 AS BIGINT) AS resid_c
       |FROM t JOIN prof ON t.event_type = prof.event_type AND t.hod = prof.hod
       |WHERE t.n_w = 24
       |ORDER BY t.event_type, t.bucket_h""".stripMargin

  /** ts_changepoint — single level-shift detection per event_type
    * (the AMOC/CUSUM statistic): over the ordered bucket series, the
    * split k maximizing |T_k| with T_k = n·S_k − k·S_n (the centered
    * cumulative sum — zero when the series is level, extremal at the
    * point where the mean shifts), ties to the earliest k. The row
    * reports the split bucket, the statistic, and the exact integer
    * pre/post means — "revenue stepped at hour H from A to B".
    *
    * Scale shape: one prefix-sum window + one per-type total over the
    * bounded series frame; the argmax is a single
    * max(struct(t_abs, −k, payload)) aggregation — never a sort of
    * the series, never a second pass. T_k stays in BIGINT: n ≤
    * horizon hours, S ≤ corpus cents — n·S sits orders under 2⁶³ at
    * any realistic horizon (the spec pins the bound).
    */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("event_type").orderBy("bucket_h")
    val wAll = Window.partitionBy("event_type")
    val c = series(spark, dir)
      .withColumn("k", row_number().over(wOrd).cast("long"))
      .withColumn("sk", sum(col("x_c")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("sn", sum(col("x_c")).over(wAll))
      .filter(col("k") < col("n"))
      .withColumn("tk", col("n") * col("sk") - col("k") * col("sn"))
    c.groupBy("event_type")
      .agg(max(struct(abs(col("tk")).as("t_abs"), (-col("k")).as("nk"),
        col("bucket_h"), col("n"), col("k"), col("sk"), col("sn"))).as("m"))
      .select(col("event_type"), col("m.n").as("n_buckets"),
        col("m.bucket_h").as("split_bucket"), col("m.t_abs").as("t_abs"),
        expr("CAST(m.sk div m.k AS BIGINT)").as("pre_mean_c"),
        expr("CAST((m.sn - m.sk) div (m.n - m.k) AS BIGINT)").as("post_mean_c"))
      .orderBy("event_type")
  }

  private val changepointOracle: String =
    s"""$seriesSql,
       |c AS (
       |  SELECT event_type, bucket_h, x_c,
       |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
       |    SUM(x_c) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sk,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n,
       |    SUM(x_c) OVER (PARTITION BY event_type) AS sn
       |  FROM b WINDOW w AS (PARTITION BY event_type ORDER BY bucket_h)),
       |t AS (SELECT *, n*sk - k*sn AS tk FROM c WHERE k < n),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
       |    ORDER BY ABS(tk) DESC, k) AS rn FROM t)
       |SELECT event_type, n AS n_buckets, bucket_h AS split_bucket,
       |  CAST(ABS(tk) AS BIGINT) AS t_abs,
       |  CAST(sk // k AS BIGINT) AS pre_mean_c,
       |  CAST((sn - sk) // (n - k) AS BIGINT) AS post_mean_c
       |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_anomaly" -> (anomaly _),
    "ts_seasonal" -> (seasonal _),
    "ts_changepoint" -> (changepoint _)
  )

  val oracles: Map[String, String] = Map(
    "ts_anomaly" -> anomalyOracle,
    "ts_seasonal" -> seasonalOracle,
    "ts_changepoint" -> changepointOracle
  )
}
