package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.relational.Queries

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every entry in [[queries]] is one operator from the inventory; every
  * SQL-expressible one has a matching DuckDB oracle in [[oracleSql]]
  * with identical column names and exact-arithmetic semantics.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Queries.q1Agg _),
    "q3_topk" -> (Queries.q3Topk _),
    "q5_join" -> (Queries.q5Join _),
    "q_window" -> (Queries.qWindow _),
    "q_sessionize" -> (Queries.qSessionize _),
    "q_session_native" -> (Queries.qSessionNative _),
    "q_tumbling" -> (Queries.qTumbling _),
    "q_distinct" -> (Queries.qDistinct _),
    "q_topk_orders" -> (Queries.qTopkOrders _),
    "q_semijoin" -> (Queries.qSemijoin _),
    "q_rollup" -> (Queries.qRollup _),
    "q_grouping_sets" -> (Queries.qGroupingSets _),
    "q_skew_join" -> (Queries.qSkewJoin _),
    "q_bucket_join" -> (Queries.qBucketJoin _),
    "q_runtime_filter" -> (Queries.qRuntimeFilter _),
    "q_asof" -> (Queries.qAsof _),
    "q_asof_native" -> (Queries.qAsofNative _),
    "q_asof_fwd" -> (Queries.qAsofFwd _),
    "q_asof_fwd_native" -> (Queries.qAsofFwdNative _),
    "q_asof_nearest" -> (Queries.qAsofNearest _),
    "q_asof_tolerance" -> (Queries.qAsofTolerance _),
    "q_asof_tolerance_native" -> (Queries.qAsofToleranceNative _),
    "q_gapfill" -> (Queries.qGapfill _),
    "q_ohlc" -> (Queries.qOhlc _),
    "q_ewma" -> (Queries.qEwma _),
    "q_zorder_skip" -> (Queries.qZorderSkip _),
    "q_dpp" -> (Queries.qDpp _),
    "q_range_join" -> (Queries.qRangeJoin _),
    "q_interval_join" -> (Queries.qIntervalJoin _),
    "q7_nations" -> (Queries.q7Nations _),
    "q17_avg_qty" -> (Queries.q17AvgQty _),
    "q10_returns" -> (Queries.q10Returns _),
    "q_json_extract" -> (Queries.qJsonExtract _),
    "q_pivot" -> (Queries.qPivot _),
    "q_unpivot" -> (Queries.qUnpivot _),
    "q_corr" -> (Queries.qCorr _),
    "q_autocorr" -> (Queries.qAutocorr _),
    "q4_priority" -> (Queries.q4Priority _),
    "q6_revenue" -> (Queries.q6Revenue _),
    "q8_mktshare" -> (Queries.q8Mktshare _),
    "q9_profit" -> (Queries.q9Profit _),
    "q13_custdist" -> (Queries.q13Custdist _),
    "q14_promo" -> (Queries.q14Promo _),
    "q16_suppcnt" -> (Queries.q16Suppcnt _),
    "q18_large" -> (Queries.q18Large _),
    "q19_disjunct" -> (Queries.q19Disjunct _),
    "q_cube" -> (Queries.qCube _),
    "q15_topsupp" -> (Queries.q15Topsupp _),
    "q22_global" -> (Queries.q22Global _),
    "q12_shipmode" -> (Queries.q12Shipmode _),
    "q2_mincost" -> (Queries.q2Mincost _),
    "q11_impstock" -> (Queries.q11Impstock _),
    "q20_excess" -> (Queries.q20Excess _),
    "q21_waiting" -> (Queries.q21Waiting _),
    "q_funnel" -> (Queries.qFunnel _),
    "q_match_recognize" -> (Queries.qMatchRecognize _),
    "q_match_recognize_win" -> (Queries.qMatchRecognizeWin _),
    "q_table_profile" -> (Queries.qTableProfile _),
    "q_setops" -> (Queries.qSetops _),
    "q_recursive" -> (Queries.qRecursive _),
    "q_rank_family" -> (Queries.qRankFamily _),
    "q_variant" -> (Queries.qVariant _),
    "q_lateral" -> (Queries.qLateral _),
    "q_range_frame" -> (Queries.qRangeFrame _),
    "q_retention" -> (Queries.qRetention _),
    "q_scd2" -> (Queries.qScd2 _)
  ) ++ graft.ops.TimeSeries.all ++
    graft.octree.OctreeQueries.all ++ graft.ops.Graph.all ++
    graft.ops.TextAnalysis.all ++ graft.ops.Dedup.all ++
    graft.ops.Similarity.all ++ graft.ops.Multimodal.all ++
    graft.ops.Sampling.all ++ graft.ops.Pipeline.all ++
    graft.streaming.EventStreams.all ++ graft.sources.VolumeQueries.all

  /** Exact integer cents expression, DuckDB dialect. */
  private def C(x: String) = s"CAST(FLOOR(($x)*100) AS BIGINT)"
  private def SUMC(x: String) = s"CAST(SUM(${C(x)}) AS BIGINT)"

  /** Shared by q_sessionize (lag/cumsum windows) and q_session_native
    * (the built-in session_window operator).
    */
  private val sessionizeOracle: String =
    s"""WITH e AS (
       |  SELECT event_id, user_id,
       |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS sec,
       |    ${C("value")} AS value_c
       |  FROM events),
       |s AS (
       |  SELECT *, CASE WHEN lag(sec) OVER w IS NULL
       |                   OR sec - lag(sec) OVER w > 1800
       |            THEN 1 ELSE 0 END AS is_new
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
       |t AS (
       |  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM s)
       |SELECT user_id, session_id, COUNT(*) AS n_events,
       |  CAST(MAX(sec) - MIN(sec) AS BIGINT) AS dur_sec,
       |  CAST(SUM(value_c) AS BIGINT) AS sum_value_c
       |FROM t GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  /** Shared by q_asof (union-and-window) and q_asof_native (the
    * custom physical operator) — one SQL, two engines' worth of
    * independent implementations; the TEXT lives in
    * [[graft.relational.SharedOracles]] because the streaming twin
    * certifies against it too.
    */
  private val asofOracle: String = graft.relational.SharedOracles.asof

  /** Shared by q_asof_fwd (union-and-window, reversed frame) and
    * q_asof_fwd_native (the custom operator's forward direction) —
    * one SQL, two independent implementations.
    */
  private val fwdAsofOracle: String =
    """WITH ev AS (
      |  SELECT event_id, CAST(user_id % 100 + 1 AS BIGINT) AS key,
      |    788918400 + (event_id % 2400) * 86400 AS t,
      |    0 AS kind, CAST(NULL AS BIGINT) AS o_orderkey, CAST(NULL AS BIGINT) AS osec
      |  FROM events),
      |ord AS (
      |  SELECT CAST(NULL AS BIGINT) AS event_id, CAST(o_custkey AS BIGINT) AS key,
      |    epoch_us(o_orderdate) // 1000000 AS t,
      |    1 AS kind, o_orderkey, epoch_us(o_orderdate) // 1000000 AS osec
      |  FROM orders),
      |u AS (SELECT * FROM ev UNION ALL SELECT * FROM ord),
      |m AS (
      |  SELECT *,
      |    first_value(o_orderkey IGNORE NULLS) OVER w AS fwd_orderkey,
      |    first_value(osec IGNORE NULLS) OVER w AS fwd_osec
      |  FROM u WINDOW w AS (PARTITION BY key
      |    ORDER BY t, kind, COALESCE(o_orderkey, event_id)
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT event_id, key,
      |  CAST(COALESCE(fwd_orderkey, -1) AS BIGINT) AS fwd_orderkey,
      |  CAST(COALESCE(fwd_osec, -1) AS BIGINT) AS fwd_osec
      |FROM m WHERE kind = 0 ORDER BY event_id""".stripMargin

  /** Shared by q_asof_tolerance (post-window filter) and
    * q_asof_tolerance_native (the bound enforced inside the custom
    * operator's merge loop) — one SQL, two implementations.
    */
  private val tolAsofOracle: String =
    s"""WITH ev AS (
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
       |    last_value(o_orderkey IGNORE NULLS) OVER w AS ak,
       |    last_value(osec IGNORE NULLS) OVER w AS ao
       |  FROM u WINDOW w AS (PARTITION BY key
       |    ORDER BY t, kind, COALESCE(o_orderkey, event_id)
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |p AS (SELECT *, ao IS NOT NULL AND t - ao <= ${Queries.AsofToleranceSec} AS fresh
       |      FROM m WHERE kind = 1)
       |SELECT event_id, key,
       |  CAST(CASE WHEN fresh THEN ak ELSE -1 END AS BIGINT) AS asof_orderkey,
       |  CAST(CASE WHEN fresh THEN ao ELSE -1 END AS BIGINT) AS asof_osec,
       |  CAST(CASE WHEN fresh THEN t - ao ELSE -1 END AS BIGINT) AS staleness
       |FROM p ORDER BY event_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |${SUMC("l_quantity")} AS sum_qty_c,
         |${SUMC("l_extendedprice")} AS sum_base_c,
         |${SUMC("l_extendedprice*(1.0-l_discount)")} AS sum_disc_c,
         |${SUMC("l_extendedprice*(1.0-l_discount)*(1.0+l_tax)")} AS sum_charge_c,
         |COUNT(*) AS cnt
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      s"""SELECT l_orderkey, epoch_us(o_orderdate) AS odate_us,
         |${SUMC("l_extendedprice*(1.0-l_discount)")} AS revenue_c
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15'
         |  AND l_shipdate > TIMESTAMP '1998-03-15'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue_c DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_join" ->
      s"""SELECT n_name, ${SUMC("l_extendedprice*(1.0-l_discount)")} AS revenue_c
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1995-07-01'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_window" ->
      s"""SELECT event_id, user_id,
         |CAST(row_number() OVER w AS BIGINT) AS rn,
         |CAST(SUM(${C("value")}) OVER w AS BIGINT) AS run_value_c
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, rn""".stripMargin,
    "q_sessionize" -> sessionizeOracle,
    // the built-in session_window path certifies against the SAME SQL
    "q_session_native" -> sessionizeOracle,
    "q_tumbling" ->
      s"""WITH e AS (
         |  SELECT CAST(FLOOR((epoch_ns(ts) // 1000000000)/3600.0) AS BIGINT) AS bucket_h,
         |    event_type, user_id, ${C("value")} AS value_c
         |  FROM events)
         |SELECT bucket_h, event_type, COUNT(*) AS cnt,
         |  COUNT(DISTINCT user_id) AS users,
         |  CAST(SUM(value_c) AS BIGINT) AS sum_value_c
         |FROM e GROUP BY bucket_h, event_type
         |ORDER BY bucket_h, event_type""".stripMargin,
    "q_distinct" ->
      s"""SELECT event_type, COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS users,
         |CAST(MIN(${C("value")}) AS BIGINT) AS min_value_c,
         |CAST(MAX(${C("value")}) AS BIGINT) AS max_value_c,
         |CAST(SUM(${C("value")}) AS BIGINT) AS sum_value_c
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_topk_orders" ->
      s"""SELECT o_orderkey, ${C("o_totalprice")} AS totalprice_c
         |FROM orders ORDER BY totalprice_c DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_semijoin" ->
      s"""WITH w AS (
         |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey, COUNT(*) AS n_with_orders
         |  FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |  GROUP BY c_nationkey),
         |a AS (
         |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey, COUNT(*) AS n_customers,
         |    ${SUMC("c_acctbal")} AS sum_acctbal_c
         |  FROM customer GROUP BY c_nationkey)
         |SELECT a.nationkey, a.n_customers,
         |  CAST(COALESCE(w.n_with_orders, 0) AS BIGINT) AS n_with_orders,
         |  CAST(a.n_customers - COALESCE(w.n_with_orders, 0) AS BIGINT) AS n_without_orders,
         |  a.sum_acctbal_c
         |FROM a LEFT JOIN w ON a.nationkey = w.nationkey
         |ORDER BY a.nationkey""".stripMargin,
    // the general grouping-sets shape (rollup/cube's parent): same
    // exact-cents arithmetic, gid = grouping(r)*2 + grouping(seg)
    "q_grouping_sets" ->
      """SELECT COALESCE(r_name, '(all)') AS region,
        |  COALESCE(c_mktsegment, '(all)') AS segment,
        |  CAST(GROUPING(r_name) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS gid,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_acctbal_c
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name),
        |  (c_mktsegment))
        |ORDER BY gid, region, segment""".stripMargin,
    "q_rollup" ->
      s"""SELECT COALESCE(r_name, '(all)') AS region, COALESCE(n_name, '(all)') AS nation,
         |CAST(GROUPING(r_name)*2 + GROUPING(n_name) AS BIGINT) AS gid,
         |COUNT(*) AS n_customers, ${SUMC("c_acctbal")} AS sum_acctbal_c
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY gid, region, nation""".stripMargin,
    // the bucketed layout must be invisible to semantics: plain join SQL
    "q_bucket_join" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_li,
         |${SUMC("l_extendedprice*(1.0-l_discount)")} AS revenue_c
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // lag-1 Pearson over (prev, current) pairs — the qCorr moment
    // chain with HUGEINT widening, pairs from one event-time lag
    "q_autocorr" ->
      s"""WITH e AS (
         |  SELECT event_type,
         |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS sec,
         |    event_id, ${C("value")} AS v
         |  FROM events),
         |p AS (SELECT event_type,
         |    lag(v) OVER (PARTITION BY event_type ORDER BY sec, event_id)
         |      AS x, v AS y
         |  FROM e),
         |q AS (SELECT * FROM p WHERE x IS NOT NULL),
         |m AS (SELECT event_type, COUNT(*) AS n,
         |    SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx,
         |    SUM(y*y) AS syy, SUM(x*y) AS sxy
         |  FROM q GROUP BY 1),
         |w AS (SELECT *,
         |    CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
         |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS dx,
         |    CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS dy
         |  FROM m)
         |SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
         |  CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
         |  CAST(CASE WHEN dx > 0 AND dy > 0
         |    THEN FLOOR(CAST(num AS DOUBLE) / sqrt(CAST(dx AS DOUBLE))
         |               / sqrt(CAST(dy AS DOUBLE)) * CAST(1000000.0 AS DOUBLE))
         |    ELSE 0 END AS BIGINT) AS corr_u
         |FROM w ORDER BY event_type""".stripMargin,
    // the injected bloom filter must be invisible to semantics
    "q_runtime_filter" ->
      s"""SELECT l_returnflag, COUNT(*) AS n_li,
         |${SUMC("l_extendedprice*(1.0-l_discount)")} AS revenue_c
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |  AND year(o_orderdate) = 1996
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_skew_join" ->
      s"""WITH e AS (
         |  SELECT CASE WHEN user_id % 2 = 0 THEN -1 ELSE user_id END AS uid,
         |    ${C("value")} AS value_c
         |  FROM events),
         |d AS (
         |  SELECT CASE WHEN user_id % 2 = 0 THEN -1 ELSE user_id END AS uid,
         |    MIN(event_id) AS first_event
         |  FROM events GROUP BY 1)
         |SELECT CAST(((e.uid % 16) + 16) % 16 AS BIGINT) AS bucket,
         |  COUNT(*) AS n_events, CAST(SUM(e.value_c) AS BIGINT) AS sum_value_c,
         |  CAST(MIN(d.first_event) AS BIGINT) AS min_first_event
         |FROM e JOIN d ON e.uid = d.uid
         |GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_asof" -> asofOracle,
    "q_asof_fwd" -> fwdAsofOracle,
    "q_asof_fwd_native" -> fwdAsofOracle,
    "q_gapfill" -> graft.relational.SharedOracles.gapfill,
    // the batch bounded-frame EWMA fold, the live bounded-queue state
    // machine, and the oracle's rank-distance self-join are three
    // independent formulations certified against one SQL
    "q_ewma" -> graft.relational.SharedOracles.ewma,
    // the full data-skipping arithmetic (Z-value assignment, min/max
    // envelopes, overlap planning, matched-row cross-check) re-stated
    // in closed form over the same interleave expression
    // plain-join semantics (DPP is transparent to results — the plan
    // audit pins the dynamicpruning subquery in the fact scan)
    "q_dpp" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(FLOOR(o_totalprice*100) AS BIGINT) AS total_c,
        |    CAST(year(o_orderdate) AS BIGINT) AS p,
        |    o_orderpriority AS prio
        |  FROM orders),
        |dim AS (SELECT p, COUNT(*) AS n_urgent FROM o
        |  WHERE prio = '1-URGENT' AND p % 2 = 0
        |  GROUP BY 1 HAVING COUNT(*) > 20)
        |SELECT o.p, COUNT(*) AS n_rows,
        |  CAST(SUM(o.total_c) AS BIGINT) AS sum_total_c,
        |  CAST(MAX(dim.n_urgent) AS BIGINT) AS n_urgent
        |FROM o JOIN dim ON o.p = dim.p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_zorder_skip" -> {
      val F = Queries.ZFiles
      s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk,
         |             l_suppkey AS sk FROM lineitem),
         |mx AS (SELECT MAX(ok) AS mok, MAX(pk) AS mpk, MAX(sk) AS msk FROM li),
         |wf AS (SELECT ok, pk, sk, mok, mpk, msk,
         |         (pk * ${1L << Queries.ZBits}) // (mpk + 1) AS pkn,
         |         (sk * ${1L << Queries.ZBits}) // (msk + 1) AS skn
         |       FROM li, mx),
         |wf2 AS (SELECT *, ${Queries.zInterleaveSql("pkn", "skn")} AS z FROM wf),
         |a AS (
         |  SELECT 'linear' AS layout, (ok * $F) // (mok + 1) AS fid,
         |    pk, sk, mpk, msk FROM wf2
         |  UNION ALL SELECT 'sorted', (pk * $F) // (mpk + 1), pk, sk, mpk, msk FROM wf2
         |  UNION ALL SELECT 'zorder', z // ${1L << (2 * Queries.ZBits - 6)},
         |    pk, sk, mpk, msk FROM wf2),
         |st AS (SELECT layout, fid, MIN(pk) AS lo_pk, MAX(pk) AS hi_pk,
         |         MIN(sk) AS lo_sk, MAX(sk) AS hi_sk, COUNT(*) AS n_rows,
         |         MAX(mpk) AS mpk, MAX(msk) AS msk
         |       FROM a GROUP BY 1, 2),
         |pp AS (
         |  SELECT layout, 'box2d' AS pred, fid, n_rows,
         |    (hi_pk >= (30*mpk)//100 AND lo_pk <= (35*mpk)//100 AND
         |     hi_sk >= (30*msk)//100 AND lo_sk <= (35*msk)//100) AS scanned
         |  FROM st
         |  UNION ALL
         |  SELECT layout, 'sk_band', fid, n_rows,
         |    (hi_sk >= (60*msk)//100 AND lo_sk <= (65*msk)//100)
         |  FROM st),
         |rep AS (SELECT layout, pred, COUNT(*) AS files_total,
         |          CAST(SUM(CASE WHEN scanned THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
         |          CAST(SUM(CASE WHEN scanned THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
         |        FROM pp GROUP BY 1, 2),
         |m AS (SELECT
         |  CAST(SUM(CASE WHEN pk BETWEEN (30*mpk)//100 AND (35*mpk)//100
         |    AND sk BETWEEN (30*msk)//100 AND (35*msk)//100 THEN 1 ELSE 0 END) AS BIGINT) AS m_box2d,
         |  CAST(SUM(CASE WHEN sk BETWEEN (60*msk)//100 AND (65*msk)//100
         |    THEN 1 ELSE 0 END) AS BIGINT) AS m_sk_band
         |  FROM wf)
         |SELECT layout, pred, files_total, files_scanned, rows_scanned,
         |  CASE WHEN pred = 'box2d' THEN m_box2d ELSE m_sk_band END AS rows_matched
         |FROM rep, m ORDER BY layout, pred""".stripMargin
    },
    "q_asof_tolerance" -> tolAsofOracle,
    "q_asof_tolerance_native" -> tolAsofOracle,
    "q_asof_nearest" ->
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
        |    last_value(o_orderkey IGNORE NULLS) OVER wb AS bk_key,
        |    last_value(osec IGNORE NULLS) OVER wb AS bk_osec,
        |    first_value(o_orderkey IGNORE NULLS) OVER wf AS fw_key,
        |    first_value(osec IGNORE NULLS) OVER wf AS fw_osec
        |  FROM u WINDOW
        |    wb AS (PARTITION BY key ORDER BY t, kind, COALESCE(o_orderkey, event_id)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY key ORDER BY t, kind, COALESCE(o_orderkey, event_id)
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |p AS (
        |  SELECT *, CASE WHEN bk_osec IS NULL AND fw_osec IS NULL THEN -1
        |    WHEN bk_osec IS NULL THEN 1 WHEN fw_osec IS NULL THEN 0
        |    WHEN fw_osec - t < t - bk_osec THEN 1 ELSE 0 END AS side
        |  FROM m WHERE kind = 1)
        |SELECT event_id, key,
        |  CAST(CASE WHEN side = 1 THEN fw_key WHEN side = 0 THEN bk_key
        |    ELSE -1 END AS BIGINT) AS near_orderkey,
        |  CAST(CASE WHEN side = 1 THEN fw_osec WHEN side = 0 THEN bk_osec
        |    ELSE -1 END AS BIGINT) AS near_osec,
        |  CAST(side AS BIGINT) AS side
        |FROM p ORDER BY event_id""".stripMargin,
    "q_ohlc" -> graft.relational.SharedOracles.ohlc,
    // the native physical operator certifies against the SAME oracle
    // as the union-and-window composition
    "q_asof_native" -> asofOracle,
    "q_range_join" -> graft.relational.SharedOracles.rangeJoin,
    "q_interval_join" ->
      s"""WITH a AS (
         |  SELECT o_orderkey AS a_key, epoch_us(o_orderdate) // 1000000 AS a_lo,
         |    epoch_us(o_orderdate) // 1000000 + 604800 AS a_hi
         |  FROM orders WHERE o_orderpriority = '1-URGENT'),
         |b AS (
         |  SELECT o_orderkey AS b_key, epoch_us(o_orderdate) // 1000000 AS b_lo,
         |    epoch_us(o_orderdate) // 1000000 + 864000 AS b_hi
         |  FROM orders WHERE o_orderpriority = '2-HIGH')
         |SELECT a_key, COUNT(*) AS n_overlaps,
         |  CAST(MIN(b_key) AS BIGINT) AS min_b_key,
         |  CAST(SUM(LEAST(a_hi, b_hi) - GREATEST(a_lo, b_lo)) AS BIGINT) AS sum_overlap_s
         |FROM a JOIN b ON a_lo < b_hi AND b_lo < a_hi
         |GROUP BY a_key ORDER BY a_key""".stripMargin,
    "q7_nations" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         |${SUMC("l_extendedprice*(1.0-l_discount)")} AS revenue_c,
         |COUNT(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_pivot" -> {
      val cols = Queries.EventTypes.map { t =>
        s"CAST(COALESCE(SUM(CASE WHEN event_type = '$t' THEN value_c END), 0) AS BIGINT) AS sum_${t}_c"
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT CAST(FLOOR((epoch_ns(ts) // 1000000000)/3600.0) AS BIGINT) AS bucket_h,
         |    event_type, ${C("value")} AS value_c
         |  FROM events)
         |SELECT bucket_h,
         |$cols
         |FROM e GROUP BY bucket_h ORDER BY bucket_h""".stripMargin
    },
    // the pivot round-tripped back to long form: groupBy over the
    // (bucket × full type domain) grid, zero-filled like the pivot
    "q_unpivot" ->
      s"""WITH e AS (
         |  SELECT CAST(FLOOR((epoch_ns(ts) // 1000000000)/3600.0) AS BIGINT) AS bucket_h,
         |    event_type, ${C("value")} AS value_c
         |  FROM events),
         |g AS (SELECT DISTINCT bucket_h FROM e),
         |t AS (SELECT UNNEST(['click','error','purchase','signup','view'])
         |        AS event_type)
         |SELECT g.bucket_h, t.event_type,
         |  CAST(COALESCE((SELECT SUM(value_c) FROM e
         |    WHERE e.bucket_h = g.bucket_h
         |      AND e.event_type = t.event_type), 0) AS BIGINT) AS sum_c
         |FROM g, t ORDER BY 1, 2""".stripMargin,
    "q_corr" ->
      s"""WITH e AS (
         |  SELECT event_type, ${C("value")} AS x,
         |    CASE WHEN json_type(json_extract(props, '$$.k')) IN ('BIGINT', 'UBIGINT')
         |         THEN CAST(json_extract_string(props, '$$.k') AS BIGINT)
         |         ELSE NULL END AS y
         |  FROM events),
         |f AS (SELECT * FROM e WHERE y IS NOT NULL),
         |m AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy
         |  FROM f GROUP BY event_type),
         |d AS (
         |  SELECT event_type, n, sx, sy,
         |    CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
         |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS dx,
         |    CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS dy
         |  FROM m)
         |SELECT event_type, n, sx, sy,
         |  CAST(CASE WHEN dx > 0 AND dy > 0
         |    THEN FLOOR(CAST(num AS DOUBLE) / sqrt(CAST(dx AS DOUBLE))
         |               / sqrt(CAST(dy AS DOUBLE)) * CAST(1000000.0 AS DOUBLE))
         |    ELSE 0 END AS BIGINT) AS corr_u
         |FROM d ORDER BY event_type""".stripMargin,
    "q_json_extract" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CASE WHEN json_type(json_extract(props, '$.k')) IN ('BIGINT', 'UBIGINT')
        |         THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
        |         ELSE NULL END AS k
        |  FROM events)
        |SELECT event_type, COUNT(*) AS cnt,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  CAST(MIN(k) AS BIGINT) AS min_k,
        |  CAST(MAX(k) AS BIGINT) AS max_k,
        |  CAST(COUNT(DISTINCT k) AS BIGINT) AS distinct_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q10_returns" ->
      s"""SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, n_name,
         |CAST(MAX(${C("c_acctbal")}) AS BIGINT) AS acctbal_c,
         |${SUMC("l_extendedprice*(1.0-l_discount)")} AS revenue_c,
         |COUNT(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-07-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue_c DESC, c_custkey LIMIT 20""".stripMargin,
    "q17_avg_qty" ->
      s"""WITH a AS (
         |  SELECT l_partkey AS pk,
         |    ${SUMC("l_quantity")} / (COUNT(*) * CAST(100.0 AS DOUBLE)) AS avg_qty
         |  FROM lineitem GROUP BY 1)
         |SELECT CAST(COALESCE(SUM(${C("l_extendedprice")}), 0) AS BIGINT) AS sum_price_c,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |JOIN a ON l_partkey = a.pk
         |WHERE p_brand = 'Brand#1'
         |  AND l_quantity < CAST(0.2 AS DOUBLE) * avg_qty""".stripMargin,
    "q2_mincost" ->
      """WITH offers AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(MIN(CAST(FLOOR(l_extendedprice * 100) AS BIGINT) // CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS offer_c
        |  FROM lineitem WHERE l_quantity > 0
        |  GROUP BY 1, 2),
        |best AS (
        |  SELECT l_partkey,
        |    CAST(MIN(offer_c * 1000000 + l_suppkey) // 1000000 AS BIGINT) AS offer_c,
        |    CAST(MIN(offer_c * 1000000 + l_suppkey) % 1000000 AS BIGINT) AS best_suppkey
        |  FROM offers GROUP BY 1)
        |SELECT p_partkey, p_name, s_suppkey, s_name, n_name AS supp_nation, offer_c
        |FROM best
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON best_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_type = 'ECONOMY'
        |ORDER BY p_partkey""".stripMargin,
    "q11_impstock" ->
      s"""WITH v AS (
         |  SELECT l_partkey, ${SUMC("l_extendedprice")} AS value_c
         |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |  WHERE s_nationkey IN (3, 8, 13, 18)
         |  GROUP BY 1),
         |t AS (SELECT CAST(SUM(value_c) AS BIGINT) AS total_c, COUNT(*) AS n_parts FROM v)
         |SELECT l_partkey, value_c FROM v, t
         |WHERE value_c * n_parts * 2 > total_c * 3
         |ORDER BY value_c DESC, l_partkey""".stripMargin,
    "q20_excess" ->
      s"""WITH ps AS (
         |  SELECT l_partkey, l_suppkey, ${SUMC("l_quantity")} AS qty_c
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_name LIKE 'blue%'
         |    AND l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1997-01-01'
         |  GROUP BY 1, 2),
         |st AS (
         |  SELECT *, CAST(SUM(qty_c) OVER w AS BIGINT) AS part_qty_c,
         |    CAST(COUNT(*) OVER w AS BIGINT) AS n_supps
         |  FROM ps WINDOW w AS (PARTITION BY l_partkey))
         |SELECT s_suppkey, s_name, n_name AS supp_nation
         |FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |WHERE s_suppkey IN (SELECT l_suppkey FROM st
         |                    WHERE qty_c * n_supps > part_qty_c * 2)
         |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting" ->
      """WITH pair AS (
        |  SELECT l_orderkey, l_suppkey,
        |    CAST(MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |      THEN 1 ELSE 0 END) AS BIGINT) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY 1, 2),
        |st AS (
        |  SELECT *, CAST(COUNT(*) OVER w AS BIGINT) AS n_supps,
        |    CAST(SUM(late) OVER w AS BIGINT) AS n_late
        |  FROM pair WINDOW w AS (PARTITION BY l_orderkey)),
        |nw AS (
        |  SELECT l_suppkey, COUNT(*) AS numwait FROM st
        |  WHERE late = 1 AND n_supps > 1 AND n_late = 1 GROUP BY 1)
        |SELECT s_suppkey, s_name, numwait
        |FROM nw JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin,
    "q_funnel" -> Queries.funnelOracleSql,
    "q_match_recognize" -> Queries.matchRecognizeOracleSql,
    "q_match_recognize_win" -> Queries.matchRecognizeWinOracleSql,
    "q_table_profile" -> Queries.tableProfileOracleSql,
    "q_setops" -> Queries.setopsOracleSql,
    "q_recursive" -> Queries.recursiveOracleSql,
    "q_rank_family" -> Queries.rankFamilyOracleSql,
    "q_variant" -> Queries.variantOracleSql,
    "q_lateral" -> Queries.lateralOracleSql,
    "q_range_frame" -> Queries.rangeFrameOracleSql,
    "q_scd2" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS sec
        |  FROM events),
        |f AS (SELECT *, CAST(CASE WHEN lag(event_type) OVER w IS NULL
        |          OR lag(event_type) OVER w != event_type
        |        THEN 1 ELSE 0 END AS BIGINT) AS changed
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |i AS (SELECT *, CAST(SUM(changed) OVER (PARTITION BY user_id
        |        ORDER BY sec, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
        |      FROM f)
        |SELECT user_id, island AS version, MIN(event_type) AS event_type,
        |  CAST(MIN(sec) AS BIGINT) AS valid_from_s,
        |  CAST(MAX(sec) AS BIGINT) AS valid_to_s,
        |  COUNT(*) AS n_events
        |FROM i GROUP BY user_id, island
        |ORDER BY user_id, version""".stripMargin,
    "q_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id,
        |    CAST((epoch_ns(ts) // 1000000000) // 86400 AS BIGINT) AS day
        |  FROM events),
        |c AS (SELECT user_id, MIN(day) AS cohort_day FROM a GROUP BY 1)
        |SELECT c.cohort_day, a.day - c.cohort_day AS offset_d,
        |  COUNT(*) AS n_users
        |FROM a JOIN c ON a.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q12_shipmode" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q15_topsupp" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, ${SUMC("l_extendedprice*(1.0-l_discount)")} AS total_rev_c
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_rev_c
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_rev_c = (SELECT MAX(total_rev_c) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "q22_global" ->
      s"""WITH c AS (
         |  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS cntrycode,
         |    ${C("c_acctbal")} AS bal_c
         |  FROM customer WHERE c_nationkey IN (1,3,5,7,9,11,13)),
         |stats AS (
         |  SELECT CAST(SUM(bal_c) AS BIGINT) AS sum_c, COUNT(*) AS n_pos
         |  FROM c WHERE bal_c > 0)
         |SELECT cntrycode, COUNT(*) AS numcust,
         |  CAST(SUM(bal_c) AS BIGINT) AS totacctbal_c
         |FROM c, stats
         |WHERE bal_c * n_pos > sum_c
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |                  AND o_orderpriority = '1-URGENT')
         |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q6_revenue" ->
      s"""SELECT CAST(COALESCE(SUM(${C("l_extendedprice*l_discount")}), 0) AS BIGINT) AS revenue_c,
         |COUNT(*) AS n_items
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07
         |  AND l_quantity < 24""".stripMargin,
    "q8_mktshare" ->
      s"""WITH y AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    CAST(SUM(CASE WHEN ns.n_name = 'NATION_1'
         |      THEN ${C("l_extendedprice*(1.0-l_discount)")} ELSE 0 END) AS BIGINT) AS nation_rev_c,
         |    ${SUMC("l_extendedprice*(1.0-l_discount)")} AS total_rev_c
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation nc ON c_nationkey = nc.n_nationkey
         |  JOIN region ON nc.n_regionkey = r_regionkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ns ON s_nationkey = ns.n_nationkey
         |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
         |    AND o_orderdate >= TIMESTAMP '1995-01-01'
         |    AND o_orderdate < TIMESTAMP '1997-01-01'
         |  GROUP BY 1)
         |SELECT o_year, nation_rev_c, total_rev_c,
         |  CAST(CASE WHEN total_rev_c > 0
         |    THEN FLOOR(1000000.0 * nation_rev_c / total_rev_c) ELSE 0 END AS BIGINT)
         |    AS mkt_share_u
         |FROM y ORDER BY o_year""".stripMargin,
    "q9_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |CAST(SUM(CAST(FLOOR((l_extendedprice*(1.0-l_discount)
        |  - p_retailprice*0.1*l_quantity)*1000) AS BIGINT)) AS BIGINT) AS profit_m,
        |COUNT(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q13_custdist" ->
      """WITH cc AS (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM cc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14_promo" ->
      s"""WITH m AS (
         |  SELECT
         |    CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO'
         |      THEN ${C("l_extendedprice*(1.0-l_discount)")} ELSE 0 END), 0) AS BIGINT)
         |      AS promo_revenue_c,
         |    CAST(COALESCE(SUM(${C("l_extendedprice*(1.0-l_discount)")}), 0) AS BIGINT)
         |      AS total_revenue_c
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01')
         |SELECT promo_revenue_c, total_revenue_c,
         |  CAST(CASE WHEN total_revenue_c > 0
         |    THEN FLOOR(1000000.0 * promo_revenue_c / total_revenue_c) ELSE 0 END AS BIGINT)
         |    AS promo_ratio_u
         |FROM m""".stripMargin,
    "q16_suppcnt" ->
      """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q18_large" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, ${SUMC("l_quantity")} AS sum_qty_c
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING CAST(SUM(${C("l_quantity")}) AS BIGINT) > 21000)
         |SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, o_orderkey,
         |  epoch_us(o_orderdate) AS odate_us,
         |  ${C("o_totalprice")} AS totalprice_c, sum_qty_c
         |FROM big JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY totalprice_c DESC, o_orderkey LIMIT 100""".stripMargin,
    "q19_disjunct" ->
      s"""SELECT CAST(COALESCE(SUM(${C("l_extendedprice*(1.0-l_discount)")}), 0) AS BIGINT)
         |  AS revenue_c, COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity >= 1 AND l_quantity <= 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
         |        AND l_quantity >= 10 AND l_quantity <= 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
         |        AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,
    "q_cube" ->
      s"""SELECT COALESCE(r_name, '(all)') AS region,
         |COALESCE(c_mktsegment, '(all)') AS segment,
         |CAST(GROUPING(r_name)*2 + GROUPING(c_mktsegment) AS BIGINT) AS gid,
         |COUNT(*) AS n_customers, ${SUMC("c_acctbal")} AS sum_acctbal_c
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY CUBE(r_name, c_mktsegment)
         |ORDER BY gid, region, segment""".stripMargin
  ) ++ graft.ops.TimeSeries.oracles ++
    graft.octree.OctreeOracles.all ++ graft.ops.OpsOracles.all ++
    graft.streaming.EventStreams.oracles ++ graft.sources.VolumeQueries.oracles
}
