package graft.octree

/** DuckDB oracle SQL for the octree operators — each statement is the
  * independent re-derivation of the operator's semantics over the same
  * parquet tables, with column names/types matching the Spark side
  * exactly (see Queries' determinism rules).
  */
object OctreeOracles {

  /** The synthetic voxel volume — must match [[graft.VoxelGrid]]. */
  val voxelCte: String =
    """voxels AS (
      |  SELECT CAST(l_linenumber % 2 AS BIGINT) AS c,
      |         CAST(l_orderkey % 16 AS BIGINT) AS z,
      |         CAST(l_partkey % 16 AS BIGINT) AS y,
      |         CAST(l_suppkey % 16 AS BIGINT) AS x,
      |         CAST(MAX((CAST(FLOOR(l_quantity) AS BIGINT)*1000
      |                   + CAST(FLOOR(l_extendedprice) AS BIGINT)) % 65535 + 1) AS BIGINT) AS v
      |  FROM lineitem GROUP BY 1, 2, 3, 4)""".stripMargin

  private val blocksCte: String =
    """blocks AS (
      |  SELECT c, z//4 + 1 AS bz, y//4 + 1 AS "by", x//4 + 1 AS bx,
      |         COUNT(*) AS n_voxels, CAST(MAX(v) AS BIGINT) AS max_v
      |  FROM voxels GROUP BY 1, 2, 3, 4)""".stripMargin

  /** Octant digits for 1-based block coords at levels=3 (2 digits). */
  private val pathExpr: String =
    """CAST(1 + (((bx-1) >> 1) & 1) + 2*((("by"-1) >> 1) & 1) + 4*(((bz-1) >> 1) & 1) AS VARCHAR)
      | || CAST(1 + ((bx-1) & 1) + 2*(("by"-1) & 1) + 4*((bz-1) & 1) AS VARCHAR)""".stripMargin.replace("\n", "")

  private def downCte(kernelAgg: String, grouped: String = "z//2 AS z, y//2 AS y, x//2 AS x"): String =
    s"""half AS (
       |  SELECT c, $grouped, $kernelAgg AS v
       |  FROM voxels GROUP BY 1, 2, 3, 4)""".stripMargin

  private val second = "(list_sort(list(v), 'DESC'))[2]"

  private def downQuery(kernelAgg: String, grouped: String = "z//2 AS z, y//2 AS y, x//2 AS x"): String =
    s"""WITH $voxelCte,
       |${downCte(kernelAgg, grouped)}
       |SELECT c, z, y, x, CAST(v AS BIGINT) AS v FROM half WHERE v > 0
       |ORDER BY c, z, y, x""".stripMargin

  /** Percentile-table CTEs (after `voxels`); exposes `pct(c, p, pv)`. */
  private val pctCtes: String =
    """hist AS (SELECT c, v, COUNT(*) AS cnt FROM voxels GROUP BY c, v),
      |cum AS (
      |  SELECT c, v, cnt,
      |         CAST(SUM(cnt) OVER (PARTITION BY c ORDER BY v) AS BIGINT) AS acc,
      |         CAST(SUM(cnt) OVER (PARTITION BY c) AS BIGINT) AS total
      |  FROM hist),
      |rng AS (
      |  SELECT c, v, (100*(acc - cnt))//total + 1 AS lo, (100*acc)//total AS hi
      |  FROM cum WHERE (100*acc)//total >= (100*(acc - cnt))//total + 1),
      |slots AS (SELECT c, CAST(unnest(range(lo, hi + 1)) AS BIGINT) AS p, v AS pv FROM rng),
      |slot0 AS (SELECT c, CAST(0 AS BIGINT) AS p, CAST(MIN(v) AS BIGINT) AS pv FROM voxels GROUP BY c),
      |pct AS (SELECT * FROM slot0 UNION ALL SELECT * FROM slots)""".stripMargin

  /** Black/white/gamma CTEs (after `pct`); exposes `par(c, black_level, white_level)`. */
  private val paramCtes: String =
    """pagg AS (
      |  SELECT c,
      |    CAST(SUM(CASE WHEN p BETWEEN 20 AND 95 THEN pv END) AS BIGINT) AS s1,
      |    CAST(SUM(CASE WHEN p BETWEEN 20 AND 95 THEN pv*pv END) AS BIGINT) AS s2,
      |    MAX(CASE WHEN p = 20 THEN pv END) AS p20,
      |    MAX(CASE WHEN p = 95 THEN pv END) AS p95,
      |    MAX(CASE WHEN p = 100 THEN pv END) AS p100
      |  FROM pct GROUP BY c),
      |pw AS (
      |  SELECT *, FLOOR(p95 + 6.0 * sqrt((s2*76 - s1*s1) / (76.0*76.0))) AS w0
      |  FROM pagg),
      |pw1 AS (SELECT *, CAST(FLOOR(GREATEST(w0, 0.75 * p100)) AS BIGINT) AS w1 FROM pw),
      |pw2 AS (SELECT *, GREATEST(LEAST(w1, p100), 254) AS white_level FROM pw1),
      |par AS (
      |  SELECT c, CAST(GREATEST(LEAST(p20, white_level - 253), 1) AS BIGINT) AS black_level,
      |         CAST(white_level AS BIGINT) AS white_level
      |  FROM pw2)""".stripMargin

  private lazy val pyramidOracle: String =
    s"""WITH $voxelCte,
       |lv2 AS (
       |  SELECT c, z//2 AS z, y//2 AS y, x//2 AS x,
       |         CASE WHEN COUNT(*) >= 2 THEN $second ELSE MAX(v) END AS v
       |  FROM voxels GROUP BY 1, 2, 3, 4),
       |lv1 AS (
       |  SELECT c, z//2 AS z, y//2 AS y, x//2 AS x,
       |         CASE WHEN COUNT(*) >= 2 THEN $second ELSE MAX(v) END AS v
       |  FROM lv2 GROUP BY 1, 2, 3, 4)
       |SELECT CAST(3 AS BIGINT) AS level, c, z, y, x, CAST(v AS BIGINT) AS v FROM voxels
       |UNION ALL
       |SELECT CAST(2 AS BIGINT), c, z, y, x, CAST(v AS BIGINT) FROM lv2 WHERE v > 0
       |UNION ALL
       |SELECT CAST(1 AS BIGINT), c, z, y, x, CAST(v AS BIGINT) FROM lv1 WHERE v > 0
       |ORDER BY level, c, z, y, x""".stripMargin

  private val base: Map[String, String] = Map(
    "oct_blockify" ->
      s"""WITH $voxelCte
         |SELECT c, z, y, x, v, z//4 + 1 AS bz, y//4 + 1 AS "by", x//4 + 1 AS bx,
         |       z % 4 AS lz, y % 4 AS ly, x % 4 AS lx
         |FROM voxels ORDER BY c, z, y, x""".stripMargin,
    "oct_path" ->
      s"""WITH $voxelCte,
         |$blocksCte
         |SELECT c, bz, "by", bx, $pathExpr AS path, n_voxels, max_v
         |FROM blocks ORDER BY c, bz, "by", bx""".stripMargin,
    "oct_levels" ->
      s"""WITH dims AS (
         |  SELECT CAST(o_orderkey AS BIGINT) AS id,
         |         CAST(o_orderkey % 4000 + 600 AS BIGINT) AS dz,
         |         CAST(o_custkey % 3000 + 500 AS BIGINT) AS dy,
         |         CAST(o_orderkey % 2500 + 400 AS BIGINT) AS dx
         |  FROM orders WHERE o_orderkey % 97 = 0),
         |cand AS (
         |  SELECT id, dz, dy, dx, CAST(unnest(range(1, 21)) AS BIGINT) AS lv FROM dims),
         |ok AS (
         |  SELECT * FROM cand
         |  WHERE ((dz - dz % (1 << lv)) // (1 << (lv - 1)))
         |      * ((dy - dy % (1 << lv)) // (1 << (lv - 1)))
         |      * ((dx - dx % (1 << lv)) // (1 << (lv - 1))) < 134217728),
         |sel AS (SELECT id, dz, dy, dx, CAST(MIN(lv) AS BIGINT) AS nlevels FROM ok GROUP BY 1, 2, 3, 4)
         |SELECT id, dz, dy, dx, nlevels,
         |       CAST(dz - dz % (1 << nlevels) AS BIGINT) AS adj_dz,
         |       CAST(dy - dy % (1 << nlevels) AS BIGINT) AS adj_dy,
         |       CAST(dx - dx % (1 << nlevels) AS BIGINT) AS adj_dx
         |FROM sel ORDER BY id""".stripMargin,
    "oct_mipmap_dims" ->
      """SELECT CAST(lvl AS BIGINT) AS lvl,
        |       CAST(GREATEST(1, 16 >> lvl) AS BIGINT) AS mz,
        |       CAST(GREATEST(1, 16 >> lvl) AS BIGINT) AS my,
        |       CAST(GREATEST(1, 16 >> lvl) AS BIGINT) AS mx
        |FROM range(0, 5) t(lvl) ORDER BY lvl""".stripMargin,
    "oct_down_2ndmax" ->
      downQuery(s"CASE WHEN COUNT(*) >= 2 THEN $second ELSE 0 END"),
    "oct_down_area" ->
      downQuery("CAST(SUM(v) AS BIGINT) // 8"),
    "oct_down_mean_nz" ->
      downQuery("CAST(SUM(v) AS BIGINT) // COUNT(*)"),
    "oct_down_max" ->
      downQuery("MAX(v)"),
    "oct_down_arthur" ->
      downQuery(s"CASE WHEN COUNT(*) >= 2 THEN $second ELSE MAX(v) END"),
    "oct_down_aa" -> {
      // the 512-row quantized weight table comes from the SAME Scala
      // constants the Spark side broadcasts — one source of truth
      val values = Downsample.AaProducts
        .map { case (jz, jy, jx, iz, iy, ix, wq) =>
          s"($jz,$jy,$jx,$iz,$iy,$ix,$wq)" }
        .mkString(",")
      val scale = 1L << Downsample.AaScaleBits
      s"""WITH $voxelCte,
         |wt(jz, jy, jx, iz, iy, ix, wq) AS (VALUES $values),
         |agg AS (
         |  SELECT c, (z // 4) * 2 + jz AS z, (y // 4) * 2 + jy AS y,
         |    (x // 4) * 2 + jx AS x,
         |    (CAST(SUM(wq * v) AS BIGINT) + ${scale / 2}) // $scale AS v
         |  FROM voxels JOIN wt
         |    ON z % 4 = iz AND y % 4 = iy AND x % 4 = ix
         |  GROUP BY 1, 2, 3, 4)
         |SELECT c, CAST(z AS BIGINT) AS z, CAST(y AS BIGINT) AS y,
         |  CAST(x AS BIGINT) AS x, CAST(v AS BIGINT) AS v
         |FROM agg WHERE v > 0 ORDER BY c, z, y, x""".stripMargin
    },
    "oct_down_spline3" ->
      s"""WITH $voxelCte
         |SELECT c,
         |  CAST((z // 4) * 2 + CASE WHEN z % 4 = 3 THEN 1 ELSE 0 END AS BIGINT) AS z,
         |  CAST((y // 4) * 2 + CASE WHEN y % 4 = 3 THEN 1 ELSE 0 END AS BIGINT) AS y,
         |  CAST((x // 4) * 2 + CASE WHEN x % 4 = 3 THEN 1 ELSE 0 END AS BIGINT) AS x,
         |  CAST(v AS BIGINT) AS v
         |FROM voxels
         |WHERE z % 4 IN (0, 3) AND y % 4 IN (0, 3) AND x % 4 IN (0, 3)
         |ORDER BY c, z, y, x""".stripMargin,
    "oct_down_linear" ->
      s"""WITH $voxelCte,
         |contrib AS (
         |  SELECT c,
         |    CASE WHEN kz.k = 0 THEN z // 2 WHEN z % 2 = 0 THEN z // 2 - 1 ELSE (z + 1) // 2 END AS oz,
         |    CASE WHEN ky.k = 0 THEN y // 2 WHEN y % 2 = 0 THEN y // 2 - 1 ELSE (y + 1) // 2 END AS oy,
         |    CASE WHEN kx.k = 0 THEN x // 2 WHEN x % 2 = 0 THEN x // 2 - 1 ELSE (x + 1) // 2 END AS ox,
         |    (CASE WHEN kz.k = 0 THEN 3 ELSE 1 END)
         |      * (CASE WHEN ky.k = 0 THEN 3 ELSE 1 END)
         |      * (CASE WHEN kx.k = 0 THEN 3 ELSE 1 END) * v AS wv
         |  FROM voxels, range(0, 2) kz(k), range(0, 2) ky(k), range(0, 2) kx(k)),
         |agg AS (
         |  SELECT c, oz AS z, oy AS y, ox AS x, CAST(SUM(wv) AS BIGINT) // 512 AS v
         |  FROM contrib
         |  WHERE oz BETWEEN 0 AND 7 AND oy BETWEEN 0 AND 7 AND ox BETWEEN 0 AND 7
         |  GROUP BY 1, 2, 3, 4)
         |SELECT c, z, y, x, CAST(v AS BIGINT) AS v FROM agg WHERE v > 0
         |ORDER BY c, z, y, x""".stripMargin,
    "oct_downsample_xy" ->
      downQuery(s"CASE WHEN COUNT(*) >= 2 THEN $second ELSE MAX(v) END",
        grouped = "z AS z, y//2 AS y, x//2 AS x"),
    "oct_pyramid" -> pyramidOracle,
    // the INCREMENTAL maintenance path must reproduce the full
    // rebuild bit-for-bit — sharing the oracle IS the claim
    "oct_pyramid_delta" -> pyramidOracle,
    "oct_empty_prune" ->
      s"""WITH $voxelCte,
         |$blocksCte,
         |slots AS (
         |  SELECT CAST(cc.c AS BIGINT) AS c, zz.bz, yy."by", xx.bx
         |  FROM (VALUES (0), (1)) cc(c), range(1, 5) zz(bz), range(1, 5) yy("by"), range(1, 5) xx(bx))
         |SELECT s.c, s.bz, s."by", s.bx,
         |       CAST(COALESCE(b.n_voxels, 0) AS BIGINT) AS n_voxels,
         |       CAST(COALESCE(b.max_v, 0) AS BIGINT) AS max_v,
         |       CAST(CASE WHEN b.max_v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_empty
         |FROM slots s LEFT JOIN blocks b
         |  ON s.c = b.c AND s.bz = b.bz AND s."by" = b."by" AND s.bx = b.bx
         |ORDER BY s.c, s.bz, s."by", s.bx""".stripMargin,
    "oct_resume" ->
      s"""WITH $voxelCte,
         |$blocksCte
         |SELECT c, bz, "by", bx, n_voxels FROM blocks
         |WHERE (bz + "by" + bx) % 3 != 0
         |ORDER BY c, bz, "by", bx""".stripMargin,
    "oct_interleave" ->
      s"""WITH $voxelCte
         |SELECT z, y, x,
         |       CAST(MAX(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS v0,
         |       CAST(MAX(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS v1,
         |       COUNT(*) AS n_channels
         |FROM voxels GROUP BY z, y, x ORDER BY z, y, x""".stripMargin,
    "oct_stats" ->
      s"""WITH $voxelCte
         |SELECT c, z//4 + 1 AS bz, y//4 + 1 AS "by", x//4 + 1 AS bx,
         |       COUNT(*) AS n_voxels, CAST(MIN(v) AS BIGINT) AS min_v,
         |       CAST(MAX(v) AS BIGINT) AS max_v, CAST(SUM(v) AS BIGINT) AS sum_v,
         |       (64 - COUNT(*)) / 64.0 AS zero_frac
         |FROM voxels GROUP BY 1, 2, 3, 4 ORDER BY c, bz, "by", bx""".stripMargin,
    "oct_histogram" ->
      s"""WITH $voxelCte
         |SELECT c, v, COUNT(*) AS cnt FROM voxels GROUP BY c, v ORDER BY c, v""".stripMargin,
    "oct_percentiles" ->
      s"""WITH $voxelCte,
         |$pctCtes
         |SELECT c, p, pv FROM pct ORDER BY c, p""".stripMargin,
    "oct_intensity_params" ->
      s"""WITH $voxelCte,
         |$pctCtes,
         |$paramCtes
         |SELECT c, black_level, white_level, 0.5 AS gamma FROM par ORDER BY c""".stripMargin,
    "oct_rescale_u8" ->
      s"""WITH $voxelCte,
         |$pctCtes,
         |$paramCtes,
         |t AS (
         |  SELECT v.c, v.z, v.y, v.x,
         |         CASE WHEN CAST(v.v - p.black_level AS DOUBLE) <= 1.0 THEN 1.0
         |              ELSE CAST(v.v - p.black_level AS DOUBLE) END
         |         * (1.0 / GREATEST(1.0, CAST(p.white_level - p.black_level AS DOUBLE))) AS t2
         |  FROM voxels v JOIN par p ON v.c = p.c)
         |SELECT c, z, y, x,
         |       CAST(CEIL(sqrt(CASE WHEN t2 >= 1.0 THEN 1.0 ELSE t2 END) * 254.0) AS BIGINT) AS v8
         |FROM t ORDER BY c, z, y, x""".stripMargin,
    "oct_retile" ->
      s"""WITH $voxelCte
         |SELECT c, z//8 + 1 AS bz, y//8 + 1 AS "by", x//8 + 1 AS bx,
         |       COUNT(*) AS n_voxels, CAST(MAX(v) AS BIGINT) AS max_v,
         |       CAST(MIN(z % 8) AS BIGINT) AS min_lz,
         |       CAST(MAX(x % 8) AS BIGINT) AS max_lx
         |FROM voxels GROUP BY 1, 2, 3, 4
         |ORDER BY c, bz, "by", bx""".stripMargin,
    "oct_ktx_name" ->
      s"""WITH $voxelCte,
         |$blocksCte,
         |p AS (SELECT c, bz, "by", bx, $pathExpr AS path FROM blocks)
         |SELECT c, bz, "by", bx,
         |       substr(path, 1, 1) || '/' || substr(path, 2, 1) AS relpath,
         |       'block_8_xy_' || path || '.ktx' AS ktx_name
         |FROM p ORDER BY c, bz, "by", bx""".stripMargin,
    "oct_adjust_dims" ->
      """WITH dims AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS id,
        |         CAST(o_orderkey % 4000 + 600 AS BIGINT) AS dz,
        |         CAST(o_custkey % 3000 + 500 AS BIGINT) AS dy,
        |         CAST(o_orderkey % 2500 + 400 AS BIGINT) AS dx
        |  FROM orders WHERE o_orderkey % 97 = 0),
        |s AS (SELECT id, dz, dy, dx, CAST(unnest(range(1, 7)) AS BIGINT) AS lv FROM dims)
        |SELECT id, lv, dz, dy, dx,
        |       CAST(dz - dz % (1 << lv) AS BIGINT) AS adj_dz,
        |       CAST(dy - dy % (1 << lv) AS BIGINT) AS adj_dy,
        |       CAST(dx - dx % (1 << lv) AS BIGINT) AS adj_dx
        |FROM s ORDER BY id, lv""".stripMargin,
    "oct_ktx_header" ->
      s"""WITH $voxelCte,
         |$blocksCte,
         |sb AS (SELECT bz, "by", bx, COUNT(*) AS n_channels_present
         |       FROM blocks GROUP BY 1, 2, 3),
         |p AS (SELECT bz, "by", bx, n_channels_present, $pathExpr AS path FROM sb),
         |k AS (SELECT *, CAST(12 + 2 * length(path) AS BIGINT) AS psize FROM p),
         |h AS (SELECT bz, "by", bx, n_channels_present, path,
         |        CAST(124 AS BIGINT) + psize + (3 - (psize + 3) % 4) AS kv_bytes
         |      FROM k),
         |m(mip, mz, my, mx, mip_bytes, prior_bytes) AS (
         |  VALUES (0, 4, 4, 4, 256, 0), (1, 2, 2, 2, 32, 260), (2, 1, 1, 1, 4, 296))
         |SELECT h.bz, h."by", h.bx, h.path, h.n_channels_present,
         |  CAST(5123 AS BIGINT) AS gl_type, CAST(2 AS BIGINT) AS gl_type_size,
         |  CAST(33319 AS BIGINT) AS gl_format, CAST(33324 AS BIGINT) AS gl_internal_format,
         |  CAST(33319 AS BIGINT) AS gl_base_internal_format,
         |  CAST(4 AS BIGINT) AS pixel_width, CAST(4 AS BIGINT) AS pixel_height,
         |  CAST(4 AS BIGINT) AS pixel_depth, CAST(3 AS BIGINT) AS n_mipmaps,
         |  h.kv_bytes, CAST(64 + h.kv_bytes + 304 AS BIGINT) AS file_bytes,
         |  CAST(m.mip AS BIGINT) AS mip, CAST(m.mz AS BIGINT) AS mz,
         |  CAST(m.my AS BIGINT) AS my, CAST(m.mx AS BIGINT) AS mx,
         |  CAST(m.mip_bytes AS BIGINT) AS mip_bytes,
         |  CAST(64 + h.kv_bytes + m.prior_bytes AS BIGINT) AS mip_offset
         |FROM h, m ORDER BY h.bz, h."by", h.bx, mip""".stripMargin,
    "oct_ktx_parse" ->
      s"""WITH $voxelCte,
         |$blocksCte,
         |sb AS (SELECT bz, "by", bx FROM blocks GROUP BY 1, 2, 3),
         |p AS (SELECT bz, "by", bx, $pathExpr AS path FROM sb),
         |k AS (SELECT *, CAST(12 + 2 * length(path) AS BIGINT) AS psize FROM p),
         |h AS (SELECT bz, "by", bx, path,
         |        CAST(124 AS BIGINT) + psize + (3 - (psize + 3) % 4) AS kv_bytes
         |      FROM k),
         |m(mip, mz, my, mx, mip_bytes, prior_bytes) AS (
         |  VALUES (0, 4, 4, 4, 256, 0), (1, 2, 2, 2, 32, 260), (2, 1, 1, 1, 4, 296)),
         |pr AS (SELECT h.*, CAST(j.range AS BIGINT) AS probe,
         |         64 + h.kv_bytes + (CAST(j.range AS BIGINT) * 304) // 23 AS pos
         |       FROM h CROSS JOIN range(23) j),
         |sel AS (SELECT pr.bz, pr."by", pr.bx, pr.path, pr.probe, pr.pos,
         |          m.mip, m.mz, m.my, m.mx, m.mip_bytes,
         |          64 + pr.kv_bytes + m.prior_bytes + 4 AS data_start
         |        FROM pr JOIN m
         |          ON pr.pos >= 64 + pr.kv_bytes + m.prior_bytes
         |         AND pr.pos < 64 + pr.kv_bytes + m.prior_bytes + 4 + m.mip_bytes
         |                      + (3 - (m.mip_bytes + 3) % 4)),
         |d AS (SELECT *,
         |        CASE WHEN pos < data_start THEN 'size'
         |             WHEN pos < data_start + mip_bytes THEN 'data'
         |             ELSE 'pad' END AS region,
         |        pos - data_start AS b
         |      FROM sel),
         |e AS (SELECT *, b // 2 AS elem, (b // 2) // 2 AS sp FROM d)
         |SELECT bz, "by", bx, path, probe, CAST(pos AS BIGINT) AS pos,
         |  CAST(mip AS BIGINT) AS mip, region,
         |  CAST(CASE WHEN region = 'data' THEN b ELSE -1 END AS BIGINT) AS byte_in_mip,
         |  CAST(CASE WHEN region = 'data' THEN b % 2 ELSE -1 END AS BIGINT) AS byte_in_elem,
         |  CAST(CASE WHEN region = 'data' THEN elem % 2 ELSE -1 END AS BIGINT) AS channel,
         |  CAST(CASE WHEN region = 'data' THEN sp // (mx * my) ELSE -1 END AS BIGINT) AS lz,
         |  CAST(CASE WHEN region = 'data' THEN (sp // mx) % my ELSE -1 END AS BIGINT) AS ly,
         |  CAST(CASE WHEN region = 'data' THEN sp % mx ELSE -1 END AS BIGINT) AS lx,
         |  CAST(CASE WHEN region = 'data' THEN (bz - 1) * mz + sp // (mx * my) ELSE -1 END AS BIGINT) AS az,
         |  CAST(CASE WHEN region = 'data' THEN ("by" - 1) * my + (sp // mx) % my ELSE -1 END AS BIGINT) AS ay,
         |  CAST(CASE WHEN region = 'data' THEN (bx - 1) * mx + sp % mx ELSE -1 END AS BIGINT) AS ax
         |FROM e ORDER BY bz, "by", bx, probe""".stripMargin,
    "oct_transform" ->
      """SELECT 0.0 AS ox, 0.0 AS oy, 0.0 AS oz,
        |       4000.0 AS sx, 4000.0 AS sy, 4000.0 AS sz,
        |       CAST(3 AS BIGINT) AS nl,
        |       16.0 AS vx_um, 16.0 AS vy_um, 16.0 AS vz_um""".stripMargin,
    "oct_transform_aniso" ->
      """SELECT 100.5 AS ox, -20.25 AS oy, 7.75 AS oz,
        |       1000.0 AS sx, 1500.0 AS sy, 6000.0 AS sz,
        |       CAST(3 AS BIGINT) AS nl,
        |       4.0 AS vx_um, 6.0 AS vy_um, 24.0 AS vz_um""".stripMargin,
    "oct_block_geom" ->
      s"""WITH $voxelCte,
         |$blocksCte
         |SELECT c, bz, "by", bx, $pathExpr AS path,
         |       CAST(bx - 1 AS DOUBLE) * 4.0 AS ox,
         |       CAST("by" - 1 AS DOUBLE) * 4.0 AS oy,
         |       CAST(bz - 1 AS DOUBLE) * 4.0 AS oz,
         |       4.0 AS sx, 4.0 AS sy, 4.0 AS sz,
         |       CAST(bx - 1 AS DOUBLE) * 4.0 + 0.5 * 4.0 AS cx,
         |       CAST("by" - 1 AS DOUBLE) * 4.0 + 0.5 * 4.0 AS cy,
         |       CAST(bz - 1 AS DOUBLE) * 4.0 + 0.5 * 4.0 AS cz,
         |       sqrt(4.0*4.0 + 4.0*4.0 + 4.0*4.0) / 16.0 AS radius
         |FROM blocks ORDER BY c, bz, "by", bx""".stripMargin,
    "oct_block_geom_aniso" ->
      s"""WITH $voxelCte,
         |$blocksCte
         |SELECT c, bz, "by", bx, $pathExpr AS path,
         |       100.5 + CAST(bx - 1 AS DOUBLE) * 1.0 AS ox,
         |       -20.25 + CAST("by" - 1 AS DOUBLE) * 1.5 AS oy,
         |       7.75 + CAST(bz - 1 AS DOUBLE) * 6.0 AS oz,
         |       1.0 AS sx, 1.5 AS sy, 6.0 AS sz,
         |       100.5 + CAST(bx - 1 AS DOUBLE) * 1.0 + 0.5 * 1.0 AS cx,
         |       -20.25 + CAST("by" - 1 AS DOUBLE) * 1.5 + 0.5 * 1.5 AS cy,
         |       7.75 + CAST(bz - 1 AS DOUBLE) * 6.0 + 0.5 * 6.0 AS cz,
         |       sqrt(1.0*1.0 + 1.5*1.5 + 6.0*6.0) / 16.0 AS radius
         |FROM blocks ORDER BY c, bz, "by", bx""".stripMargin
  )

  /** The physical byte round trip (oct_ktx_bytes) shares the parse
    * oracle verbatim: the bytes written to disk must parse back to
    * exactly the frame the relational layout model predicts.
    */
  val all: Map[String, String] =
    base +
      ("oct_ktx_bytes" -> base("oct_ktx_parse")) +
      // the TIFF byte round trip must decode back to exactly the
      // volume model — the oracle is its independent re-derivation
      ("oct_tiff_bytes" ->
        s"""WITH $voxelCte
           |SELECT c, z, y, x, CAST(v AS BIGINT) AS v FROM voxels
           |ORDER BY c, z, y, x""".stripMargin) +
      // strip→tiled rewrite must be lossless: same volume identity
      ("oct_retile_bytes" ->
        s"""WITH $voxelCte
           |SELECT c, z, y, x, CAST(v AS BIGINT) AS v FROM voxels
           |ORDER BY c, z, y, x""".stripMargin) +
      // the end-to-end capstone (slices → ingest → pyramid →
      // interrupted+resumed per-level tree write → byte parse) must
      // return the pyramid EXACTLY — volume identity, shared verbatim
      ("pipeline_octree" -> pyramidOracle) +
      // per-artifact audit of the finished tree: per level, file
      // counts per family (a TIFF per nonempty (block, channel), a
      // KTX per nonempty block), voxel stats and a position-weighted
      // checksum from the TIFF bytes, and the same count/checksum
      // independently from the KTX mip-0 bytes — all predicted from
      // the DuckDB pyramid reconstruction
      ("pipeline_octree_audit" ->
        s"""WITH pyr AS ($pyramidOracle),
           |blk AS (
           |  SELECT level, c, z, y, x, v,
           |         z//4 AS bz, y//4 AS "by", x//4 AS bx FROM pyr),
           |tf AS (
           |  SELECT level, COUNT(*) AS n_tif_files
           |  FROM (SELECT DISTINCT level, c, bz, "by", bx FROM blk) GROUP BY level),
           |kf AS (
           |  SELECT level, COUNT(*) AS n_ktx_files
           |  FROM (SELECT DISTINCT level, bz, "by", bx FROM blk) GROUP BY level),
           |vx AS (
           |  SELECT level, COUNT(*) AS n_voxels,
           |         CAST(SUM(v) AS BIGINT) AS sum_v,
           |         CAST(MAX(v) AS BIGINT) AS max_v,
           |         CAST(SUM((((z*16 + y)*16 + x)*2 + c + 1) * v) AS BIGINT) AS cksum
           |  FROM blk GROUP BY level)
           |SELECT tf.level, n_tif_files, n_ktx_files, n_voxels, sum_v, max_v, cksum,
           |       n_voxels AS ktx_n_voxels, cksum AS ktx_cksum
           |FROM tf JOIN kf ON tf.level = kf.level JOIN vx ON tf.level = vx.level
           |ORDER BY tf.level""".stripMargin)
}
