package graft.relational

/** Oracle SQL shared by BATCH and STREAMING twins of the same
  * operator. The invariant "one SQL certifies N independent
  * implementations" only holds if the text physically cannot drift —
  * so the strings live here, referenced by BOTH
  * [[graft.SparkEntry.oracleSql]] and
  * [[graft.streaming.EventStreams]]'s oracle map (EventStreams cannot
  * reference SparkEntry.oracleSql directly: SparkEntry MERGES the
  * streaming map, so that reference would recurse).
  */
object SharedOracles {

  /** q_asof / q_asof_native / stream_asof — THREE independent as-of
    * implementations (union-and-window, the native AsOfJoinExec
    * physical operator, stream-static max-of-packed aggregation)
    * certified against this one SQL.
    */
  val asof: String =
    """WITH ev AS (
      |  SELECT event_id, CAST(user_id % 100 + 1 AS BIGINT) AS key,
      |    788918400 + (event_id % 2400) * 86400 AS t,
      |    1 AS kind, CAST(NULL AS BIGINT) AS o_orderkey, CAST(NULL AS BIGINT) AS osec
      |  FROM events),
      |ord AS (
      |  SELECT CAST(NULL AS BIGINT) AS event_id, CAST(o_custkey AS BIGINT) AS key,
      |    epoch_us(o_orderdate) // 1000000 AS t,
      |    0 AS kind, o_orderkey, epoch_us(o_orderdate) // 1000000 AS osec
      |  FROM orders),
      |u AS (SELECT * FROM ev UNION ALL SELECT * FROM ord),
      |m AS (
      |  SELECT *,
      |    last_value(o_orderkey IGNORE NULLS) OVER w AS asof_orderkey,
      |    last_value(osec IGNORE NULLS) OVER w AS asof_osec
      |  FROM u WINDOW w AS (PARTITION BY key
      |    ORDER BY t, kind, COALESCE(o_orderkey, event_id)
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, key,
      |  CAST(COALESCE(asof_orderkey, -1) AS BIGINT) AS asof_orderkey,
      |  CAST(COALESCE(asof_osec, -1) AS BIGINT) AS asof_osec
      |FROM m WHERE kind = 1 ORDER BY event_id""".stripMargin

  /** q_gapfill / stream_gapfill — LOCF per-user accounting, batch
    * window-pass and live mapGroupsWithState against one SQL.
    */
  val gapfill: String =
    """WITH e AS (
      |  SELECT event_id, user_id,
      |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS sec,
      |    CASE WHEN event_type = 'purchase'
      |      THEN CAST(FLOOR(value*100) AS BIGINT) END AS obs_c
      |  FROM events),
      |f AS (
      |  SELECT *, last_value(obs_c IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY sec, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill_c
      |  FROM e)
      |SELECT user_id, COUNT(*) AS n_events, COUNT(obs_c) AS n_obs,
      |  CAST(SUM(CASE WHEN fill_c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unfilled,
      |  CAST(COALESCE(SUM(CASE WHEN obs_c IS NULL THEN fill_c END), 0) AS BIGINT) AS carried_c
      |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q_ohlc / stream_ohlc — hourly OHLC resample, batch window-pass
    * and live min_by/max_by aggregation against one SQL.
    */
  val ohlc: String =
    """WITH e AS (
      |  SELECT event_id, event_type,
      |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS sec,
      |    CAST(FLOOR(value*100) AS BIGINT) AS value_c
      |  FROM events),
      |b AS (
      |  SELECT *, CAST(FLOOR(sec / 3600.0) AS BIGINT) AS bucket_h,
      |    row_number() OVER (PARTITION BY CAST(FLOOR(sec / 3600.0) AS BIGINT), event_type
      |      ORDER BY sec, event_id) AS rn_a,
      |    row_number() OVER (PARTITION BY CAST(FLOOR(sec / 3600.0) AS BIGINT), event_type
      |      ORDER BY sec DESC, event_id DESC) AS rn_d
      |  FROM e)
      |SELECT bucket_h, event_type,
      |  CAST(MAX(CASE WHEN rn_a = 1 THEN value_c END) AS BIGINT) AS open_c,
      |  MAX(value_c) AS high_c,
      |  MIN(value_c) AS low_c,
      |  CAST(MAX(CASE WHEN rn_d = 1 THEN value_c END) AS BIGINT) AS close_c,
      |  COUNT(*) AS n, CAST(SUM(value_c) AS BIGINT) AS vol_c
      |FROM b GROUP BY bucket_h, event_type
      |ORDER BY bucket_h, event_type""".stripMargin

  /** q_range_join / stream_range_join — the bucketed no-equi-key
    * containment join, batch and live, against one SQL.
    */
  val rangeJoin: String =
    """WITH ev AS (
      |  SELECT event_id, 788918400 + (event_id % 2400) * 86400 AS t FROM events),
      |iv AS (
      |  SELECT o_orderkey, epoch_us(o_orderdate) // 1000000 AS lo,
      |    epoch_us(o_orderdate) // 1000000 + 604800 AS hi
      |  FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT event_id, COUNT(*) AS n_orders,
      |  CAST(MIN(o_orderkey) AS BIGINT) AS min_orderkey,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_orderkey
      |FROM ev JOIN iv ON t >= lo AND t < hi
      |GROUP BY event_id ORDER BY event_id""".stripMargin

  /** q_ewma / stream_ewma — exact dyadic-decay EWMA + spike counters
    * per user; the batch bounded-frame window fold and the live
    * bounded-queue state machine certify against this one SQL (which
    * derives the same numerator through a THIRD formulation — a
    * rank-distance self-join: weight 2^(len−1−dist) for each of the
    * ≤ 32 preceding observations, norm 2^len − 1).
    */
  val ewma: String = {
    val d = graft.relational.Queries.EwmaDepth
    s"""WITH e AS (
      |  SELECT event_id, user_id,
      |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS sec,
      |    CAST(FLOOR(value*100) AS BIGINT) AS v_c
      |  FROM events),
      |r AS (SELECT *, row_number() OVER (
      |        PARTITION BY user_id ORDER BY sec, event_id) AS rk FROM e),
      |s AS (
      |  SELECT a.user_id, a.rk, a.event_id, a.v_c,
      |    CAST(SUM(b.v_c * (CAST(1 AS BIGINT) <<
      |      CAST(LEAST(a.rk, $d) - 1 - (a.rk - b.rk) AS INTEGER))) AS BIGINT) AS e_num,
      |    (CAST(1 AS BIGINT) << CAST(LEAST(a.rk, $d) AS INTEGER)) - 1 AS w_norm
      |  FROM r a JOIN r b ON b.user_id = a.user_id
      |    AND b.rk BETWEEN a.rk - ${d - 1} AND a.rk
      |  GROUP BY a.user_id, a.rk, a.event_id, a.v_c),
      |m AS (
      |  SELECT user_id, rk, v_c, (1000 * e_num) // w_norm AS ewma_mc,
      |    lag((1000 * e_num) // w_norm) OVER (
      |      PARTITION BY user_id ORDER BY rk) AS prev_mc
      |  FROM s),
      |d AS (
      |  SELECT user_id, rk, ewma_mc,
      |    COALESCE(ABS(1000 * v_c - prev_mc), 0) AS dev_mc,
      |    CASE WHEN prev_mc IS NOT NULL
      |      AND ABS(1000 * v_c - prev_mc) > 2 * prev_mc THEN 1 ELSE 0 END AS spike,
      |    MAX(rk) OVER (PARTITION BY user_id) AS max_rk
      |  FROM m)
      |SELECT user_id, COUNT(*) AS n_events,
      |  CAST(MAX(CASE WHEN rk = max_rk THEN ewma_mc END) AS BIGINT) AS ewma_last_mc,
      |  CAST(MAX(dev_mc) AS BIGINT) AS max_dev_mc,
      |  CAST(SUM(spike) AS BIGINT) AS n_spikes
      |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin
  }
}
