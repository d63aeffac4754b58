package graft.ops

/** DuckDB oracle SQL for the text/dedup/similarity/multimodal
  * operators. Shared numeric contracts with the Spark side:
  * md5-prefix string hashing (re-derived here as a strpos polynomial —
  * identical values to Spark's `conv(hex,16,10)`), double-cast
  * element-wise dot products folded left from 0.0, and integer
  * thresholds on floor(cos·10⁶).
  */
object OpsOracles {
  /** The IVF-ADC oracle stage shared by sim_ivfpq_topk and
    * sim_ivfpq_refine — `tail` consumes the `adc` CTE.
    */
  private def ivfpqOracleWith(tail: String): String = {
      val d = Similarity.PqD
      def l2i(a: String, b: String) =
        s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
           |  [(($a)[i] - ($b)[i]) * (($a)[i] - ($b)[i]) for i in range(1, ${d + 1})]),
           |  (acc, v) -> acc + v)""".stripMargin
      def residL(v: String, c: String) =
        s"""[CAST(FLOOR((CAST(($v)[i] AS DOUBLE) - CAST(($c)[i] AS DOUBLE))
           | * CAST(1000000.0 AS DOUBLE)) AS BIGINT) for i in range(1, 65)]""".stripMargin
      def microL(v: String) =
        s"""[CAST(FLOOR(CAST(($v)[i] AS DOUBLE) * CAST(1000000.0 AS DOUBLE)) AS BIGINT)
           | for i in range(1, 65)]""".stripMargin
      def l2i64(a: String, b: String) =
        s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
           |  [(($a)[i] - ($b)[i]) * (($a)[i] - ($b)[i]) for i in range(1, 65)]),
           |  (acc, v) -> acc + v)""".stripMargin
      s"""WITH $ivfModsCte,
         |cbm AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 57) r(g), nn
         |        WHERE (CAST(1 AS BIGINT) << g) * ${Similarity.PqKs} >= nn.n),
         |vqs AS (SELECT vec_id, embedding, ${microL("embedding")} AS vq FROM embeddings),
         |cqs AS (SELECT cent_id, cvec, ${microL("cvec")} AS cq FROM c),
         |asg AS (SELECT e.vec_id, e.embedding, q.cent_id,
         |          ${l2i64("e.vq", "q.cq")} AS cdist
         |        FROM vqs e, cqs q),
         |cell AS (SELECT vec_id, embedding, cent_id AS cell FROM asg
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cdist, cent_id) = 1),
         |rq AS (SELECT cell.vec_id, cell.cell,
         |         ${residL("cell.embedding", "c2.cvec")} AS rvec
         |       FROM cell JOIN c c2 ON cell.cell = c2.cent_id),
         |seeds AS (SELECT rq.*,
         |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cb_idx
         |  FROM rq, cbm WHERE vec_id % cbm.m = 0),
         |cb0 AS (SELECT CAST(mm.m AS BIGINT) AS m, cb_idx,
         |         rvec[mm.m*$d+1 : mm.m*$d+$d] AS cwvec
         |       FROM seeds, range(0, ${Similarity.PqM}) mm(m)),
         |subs AS (SELECT vec_id, cell, CAST(mm.m AS BIGINT) AS m,
         |           rvec[mm.m*$d+1 : mm.m*$d+$d] AS rsub
         |         FROM rq, range(0, ${Similarity.PqM}) mm(m)),
         |cd0 AS (
         |  SELECT vec_id, cell, s.m,
         |    CAST(MIN(${l2i("rsub", "cwvec")} * ${Similarity.PqKs} + cb_idx)
         |      % ${Similarity.PqKs} AS BIGINT) AS cb_idx
         |  FROM subs s JOIN cb0 ON s.m = cb0.m GROUP BY 1, 2, 3),
         |se AS (SELECT vec_id, m, u.pos, rsub[u.pos] AS x
         |       FROM subs, range(1, ${d + 1}) u(pos)),
         |cbd AS (
         |  SELECT se.m, c.cb_idx, se.pos, CAST(SUM(se.x) // COUNT(*) AS BIGINT) AS cw
         |  FROM se JOIN cd0 c ON se.vec_id = c.vec_id AND se.m = c.m
         |  GROUP BY 1, 2, 3),
         |cb AS (SELECT m, cb_idx, list(cw ORDER BY pos) AS cwvec FROM cbd GROUP BY 1, 2),
         |codes AS (
         |  SELECT vec_id, cell, s.m,
         |    CAST(MIN(${l2i("rsub", "cwvec")} * ${Similarity.PqKs} + cb_idx)
         |      % ${Similarity.PqKs} AS BIGINT) AS cb_idx
         |  FROM subs s JOIN cb ON s.m = cb.m GROUP BY 1, 2, 3),
         |pc AS (
         |  SELECT p.probe_id, p.pvec, q.cent_id AS cell,
         |    ${l2i64(s"${microL("p.pvec")}", "q.cq")} AS pdist
         |  FROM p, cqs q
         |  QUALIFY row_number() OVER (PARTITION BY p.probe_id
         |    ORDER BY pdist, q.cent_id) <= 4),
         |prq AS (SELECT pc.probe_id, pc.cell,
         |          ${residL("pc.pvec", "c2.cvec")} AS prvec
         |        FROM pc JOIN c c2 ON pc.cell = c2.cent_id),
         |lut AS (
         |  SELECT probe_id, cell, cb.m, cb.cb_idx,
         |    CAST(${l2i(s"prvec[cb.m*$d+1 : cb.m*$d+$d]", "cwvec")} AS BIGINT) AS dd
         |  FROM prq, cb),
         |adc AS (
         |  SELECT probe_id, vec_id, CAST(SUM(dd) AS BIGINT) AS adc_d,
         |    COUNT(*) AS nm
         |  FROM codes JOIN lut USING (cell, m, cb_idx) GROUP BY 1, 2),
         |$tail""".stripMargin
  }


  private val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  /** strpos-polynomial hex parse of md5(x)'s first 8 digits. */
  def md5Int(x: String): String =
    (1 to 8).map { i =>
      s"(strpos('0123456789abcdef', substr(md5($x), $i, 1)) - 1) * ${1L << (4 * (8 - i))}"
    }.mkString("(", " + ", ")")

  /** Word-3-gram shingles over a token-list column named `t`. */
  private val shingles =
    """CASE WHEN len(t) >= 3 THEN
      |  list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t)-1)])
      |ELSE CAST([] AS VARCHAR[]) END""".stripMargin

  /** Left-fold double dot product over 64-dim float lists. */
  private def dotD(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  [CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE) for i in range(1, 65)]),
       |  (acc, v) -> acc + v)""".stripMargin

  private def cosU(a: String, b: String): String =
    s"""CAST(FLOOR(${dotD(a, b)} / (sqrt(${dotD(a, a)}) * sqrt(${dotD(b, b)})) * 1000000.0) AS BIGINT)"""

  /** Float×micro-int-centroid dot (mirrors [[Similarity.dotQ]]). */
  private def dotQD(a: String, q: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  [CAST(($a)[i] AS DOUBLE) * (CAST(($q)[i] AS DOUBLE) * CAST(1e-6 AS DOUBLE)) for i in range(1, 65)]),
       |  (acc, v) -> acc + v)""".stripMargin

  /** Micro-int centroid self-dot (mirrors [[Similarity.dotQQ]]). */
  private def dotQQD(q: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  [(CAST(($q)[i] AS DOUBLE) * CAST(1e-6 AS DOUBLE)) * (CAST(($q)[i] AS DOUBLE) * CAST(1e-6 AS DOUBLE)) for i in range(1, 65)]),
       |  (acc, v) -> acc + v)""".stripMargin

  /** cos(float a, micro-int q)·10⁶ (mirrors [[Similarity.cosUQPre]]). */
  private def cosUQ(a: String, q: String): String =
    s"""CAST(FLOOR(${dotQD(a, q)} / (sqrt(${dotD(a, a)}) * sqrt(${dotQQD(q)})) * 1000000.0) AS BIGINT)"""

  /** Sign-LSH bucket over coordinate hyperplanes (17j+3)%64 + 1. */
  private val bucketExpr: String =
    (0 until 8).map { j =>
      val pos = (17 * j + 3) % 64 + 1
      s"CAST(embedding[$pos] > 0 AS BIGINT) * ${1L << j}"
    }.mkString(" + ")

  /** CTE chain ending in `sig(doc_id, mh0..mh7, band0, band1)`. */
  private val minhashSigCtes: String = {
    val mhCols = (0 until Dedup.MinhashK).map { j =>
      val (a, bb) = Dedup.perm(j)
      s"CAST(list_min([($a * h + $bb) % ${Dedup.MinhashP} for h in hs]) AS BIGINT) AS mh$j"
    }.mkString(",\n")
    s"""d AS (SELECT doc_id, $toks AS t FROM documents),
       |sh AS (SELECT doc_id, $shingles AS s FROM d),
       |hh AS (SELECT doc_id, [${md5Int("x")} for x in s] AS hs FROM sh WHERE len(s) > 0),
       |m AS (SELECT doc_id, $mhCols FROM hh),
       |sig AS (
       |  SELECT doc_id, mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7,
       |    CAST(mh0 AS VARCHAR) || ':' || CAST(mh1 AS VARCHAR) AS band0,
       |    CAST(mh2 AS VARCHAR) || ':' || CAST(mh3 AS VARCHAR) AS band1,
       |    CAST(mh4 AS VARCHAR) || ':' || CAST(mh5 AS VARCHAR) AS band2,
       |    CAST(mh6 AS VARCHAR) || ':' || CAST(mh7 AS VARCHAR) AS band3
       |  FROM m)""".stripMargin
  }

  /** LSH band-join candidate pairs over `sig` (mirrors
    * [[Dedup.bandCandidates]]): 4 bands × 2 rows, distinct
    * doc_a < doc_b. Appended after [[minhashSigCtes]].
    */
  private val bandCandCtes: String =
    """bands AS (
      |  SELECT doc_id, 0 AS band_i, band0 AS band_v FROM sig
      |  UNION ALL SELECT doc_id, 1, band1 FROM sig
      |  UNION ALL SELECT doc_id, 2, band2 FROM sig
      |  UNION ALL SELECT doc_id, 3, band3 FROM sig),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band_i = b.band_i AND a.band_v = b.band_v AND a.doc_id < b.doc_id)""".stripMargin

  /** aHash fingerprints + distinct-hash banding + expansion — CTE
    * chain ending in `crossp(doc_a, doc_b, hamming)` and
    * `intra(doc_a, doc_b, hamming)`, shared by mm_phash and
    * mm_phash_cluster. Mirrors [[Multimodal.phash]].
    */
  private val phashPairCtes: String = {
    val n = Multimodal.PngEdge * Multimodal.PngEdge
    s"""px AS (
       |  SELECT doc_id, r.i,
       |    CASE WHEN length(text) > r.i
       |         THEN ascii(substr(text, CAST(r.i + 1 AS INT), 1)) % 256
       |         ELSE 0 END AS p
       |  FROM documents, range(0, $n) r(i)),
       |st AS (SELECT doc_id, CAST(SUM(p) AS BIGINT) AS s FROM px GROUP BY doc_id),
       |ph AS (
       |  SELECT px.doc_id,
       |    CAST(SUM(CASE WHEN px.p * $n > st.s AND px.i < 32
       |      THEN (CAST(1 AS BIGINT) << CAST(px.i AS INT)) ELSE 0 END) AS BIGINT) AS ph_lo,
       |    CAST(SUM(CASE WHEN px.p * $n > st.s AND px.i >= 32
       |      THEN (CAST(1 AS BIGINT) << CAST(px.i - 32 AS INT)) ELSE 0 END) AS BIGINT) AS ph_hi
       |  FROM px JOIN st USING (doc_id) GROUP BY px.doc_id),
       |uh AS (SELECT DISTINCT ph_lo, ph_hi FROM ph),
       |pbands AS (
       |  SELECT ph_lo, ph_hi, 0 AS band_i, ph_lo % 65536 AS band_v FROM uh
       |  UNION ALL SELECT ph_lo, ph_hi, 1, ph_lo // 65536 FROM uh
       |  UNION ALL SELECT ph_lo, ph_hi, 2, ph_hi % 65536 FROM uh
       |  UNION ALL SELECT ph_lo, ph_hi, 3, ph_hi // 65536 FROM uh),
       |hp AS (
       |  SELECT DISTINCT a.ph_lo AS lo_a, a.ph_hi AS hi_a,
       |    b.ph_lo AS lo_b, b.ph_hi AS hi_b
       |  FROM pbands a JOIN pbands b
       |    ON a.band_i = b.band_i AND a.band_v = b.band_v
       |   AND (a.ph_lo < b.ph_lo OR (a.ph_lo = b.ph_lo AND a.ph_hi < b.ph_hi))),
       |hpf AS (
       |  SELECT *, CAST(bit_count(xor(lo_a, lo_b))
       |    + bit_count(xor(hi_a, hi_b)) AS BIGINT) AS hamming
       |  FROM hp WHERE bit_count(xor(lo_a, lo_b))
       |    + bit_count(xor(hi_a, hi_b)) <= ${Multimodal.PhashHamMax}),
       |crossp AS (
       |  SELECT LEAST(x.doc_id, y.doc_id) AS doc_a,
       |    GREATEST(x.doc_id, y.doc_id) AS doc_b, hamming
       |  FROM hpf JOIN ph x ON hpf.lo_a = x.ph_lo AND hpf.hi_a = x.ph_hi
       |           JOIN ph y ON hpf.lo_b = y.ph_lo AND hpf.hi_b = y.ph_hi),
       |intra AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, CAST(0 AS BIGINT) AS hamming
       |  FROM ph x JOIN ph y ON x.ph_lo = y.ph_lo AND x.ph_hi = y.ph_hi
       |    AND x.doc_id < y.doc_id)""".stripMargin
  }

  private val bucketedCte =
    s"""b AS (SELECT vec_id, embedding, label, $bucketExpr AS bucket FROM embeddings)"""

  /** Corpus-size-scaled bucket CTE for the pair-generation queries —
    * mirrors [[Similarity.lshBits]] (smallest k in [8,24] with
    * 2^k · 64 ≥ n, pure integer compare) and [[Similarity.bucketN]].
    */
  private val bucketedDynCte: String = {
    val bits = (0 until 24).map { j =>
      val pos = (17 * j + 3) % 64 + 1
      s"CASE WHEN $j < nb.nbits THEN CAST(embedding[$pos] > 0 AS BIGINT) * ${1L << j} ELSE 0 END"
    }.mkString(" + ")
    s"""nb AS (
       |  SELECT COALESCE(MIN(k), 24) AS nbits
       |  FROM range(8, 25) r(k), (SELECT COUNT(*) AS n FROM embeddings) c
       |  WHERE (CAST(1 AS BIGINT) << k) * 64 >= c.n),
       |b AS (SELECT vec_id, embedding, label, $bits AS bucket
       |      FROM embeddings, nb)""".stripMargin
  }

  /** Corpus-size-derived IVF centroid/probe CTEs — mirror
    * [[Similarity.ivfCentMod]] (smallest power of two m with m² ≥ n →
    * k ≤ √n centroids) and [[Similarity.ivfProbeMod]] (smallest m with
    * 64·m ≥ n → ≤64 probes). Pure integer arithmetic on the same
    * count, so both engines select identical centroid/probe sets.
    * Exposes `c(cent_id, cvec)` and `p(probe_id, pvec)`.
    */
  /** ±1 sparse-plane projection of table t, bit j, as exact-integer
    * SQL (`Σ sign·⌊x·10⁶⌋`) — the same plan-time constants
    * [[Similarity.lshPlane]] gives the engine. Shared by the
    * sim_lsh_topk oracle and the sim_recall_eval LSH chain.
    */
  private def lshPlaneSql(t: Int, j: Int): String =
    Similarity.lshPlane(t, j).map { case (d, s) =>
      s"($s * CAST(FLOOR(CAST(embedding[$d] AS DOUBLE) * 1000000.0) AS BIGINT))"
    }.mkString(" + ")

  /** Full LshMaxBits-bit bucket of table t (bit j depends only on
    * (t, j), so masking with the data-derived bit count == building
    * nbits planes).
    */
  private def lshBucketSql(t: Int): String =
    (0 until Similarity.LshMaxBits).map { j =>
      s"CAST((${lshPlaneSql(t, j)}) > 0 AS BIGINT) * ${1L << j}"
    }.mkString("\n     + ")

  /** UNION ALL of the per-table full-bucket scans. */
  private val lshTablesSql: String = (0 until Similarity.LshTables)
    .map(t => s"SELECT vec_id, embedding, $t AS t,\n       ${lshBucketSql(t)} AS fullb FROM embeddings")
    .mkString("\n  UNION ALL ")

  private val ivfModsCte: String =
    s"""nn AS (SELECT COUNT(*) AS n FROM embeddings),
       |cmod AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 32) r(g), nn
       |         WHERE (CAST(1 AS BIGINT) << g) * (CAST(1 AS BIGINT) << g) >= nn.n),
       |pmod AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 57) r(g), nn
       |         WHERE (CAST(1 AS BIGINT) << g) * 64 >= nn.n),
       |c AS (SELECT vec_id AS cent_id, embedding AS cvec
       |      FROM embeddings, cmod WHERE vec_id % cmod.m = 0),
       |p AS (SELECT vec_id AS probe_id, embedding AS pvec
       |      FROM embeddings, pmod WHERE vec_id % pmod.m = 0)""".stripMargin

  private def pairsCte(minCosU: Long) =
    s"""pairs AS (
       |  SELECT a.vec_id AS id_a, a2.vec_id AS id_b,
       |         CAST(a.label AS BIGINT) AS label_a, CAST(a2.label AS BIGINT) AS label_b,
       |         ${cosU("a.embedding", "a2.embedding")} AS cos_u, a.bucket
       |  FROM b a JOIN b a2 ON a.bucket = a2.bucket AND a.vec_id < a2.vec_id)
       |, hits AS (SELECT * FROM pairs WHERE cos_u >= $minCosU)""".stripMargin

  /** Verified near-dup pair CTE chain (mirrors [[Dedup.ngramJaccard]]):
    * band candidates → exact token-set intersect/union at τ=0.5.
    * Exposes `jhits(doc_a, doc_b, inter, nt_a, nt_b)`. Appended after
    * [[minhashSigCtes]] + [[bandCandCtes]].
    */
  private val ngramHitsCtes: String =
    s"""tk AS (
       |  SELECT doc_id, list_distinct($toks) AS t,
       |    CAST(len(list_distinct($toks)) AS BIGINT) AS nt
       |  FROM documents),
       |np AS (
       |  SELECT cand.doc_a, cand.doc_b,
       |    CAST(len(list_intersect(ta.t, tb.t)) AS BIGINT) AS inter,
       |    ta.nt AS nt_a, tb.nt AS nt_b
       |  FROM cand JOIN tk ta ON cand.doc_a = ta.doc_id
       |            JOIN tk tb ON cand.doc_b = tb.doc_id),
       |jhits AS (
       |  SELECT * FROM np WHERE inter * 2 >= nt_a + nt_b - inter)""".stripMargin

  /** text_quality's composite score floored to integer micros — CTE
    * chain ending in `sc(doc_id, score_u)`, shared by dedup_keep_best
    * and sample_curriculum.
    */
  private val scoreCtes: String =
    s"""qq AS (
       |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
       |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS alpha,
       |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS punct,
       |    CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS upper,
       |    CAST(len(regexp_extract_all(lower(text), '${TextAnalysis.stopwordPat}')) AS BIGINT) AS stops,
       |    CAST(len($toks) AS BIGINT) AS n_tokens
       |  FROM documents),
       |qr AS (
       |  SELECT doc_id,
       |    CASE WHEN n > 0 THEN alpha / n ELSE CAST(0.0 AS DOUBLE) END AS alpha_ratio,
       |    CASE WHEN n > 0 THEN punct / n ELSE CAST(0.0 AS DOUBLE) END AS punct_ratio,
       |    CASE WHEN n > 0 THEN upper / n ELSE CAST(0.0 AS DOUBLE) END AS upper_ratio,
       |    CASE WHEN n_tokens > 0 THEN stops / n_tokens ELSE CAST(0.0 AS DOUBLE) END AS stop_ratio
       |  FROM qq),
       |sc AS (
       |  SELECT doc_id, CAST(FLOOR((alpha_ratio * CAST(0.5 AS DOUBLE)
       |    + (CAST(1.0 AS DOUBLE) - punct_ratio) * CAST(0.2 AS DOUBLE)
       |    + (CAST(1.0 AS DOUBLE) - upper_ratio) * CAST(0.2 AS DOUBLE)
       |    + stop_ratio * CAST(0.1 AS DOUBLE)) * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS score_u
       |  FROM qr)""".stripMargin

  /** The two-table k-NN edge CTE chain ending in
    * `r(vec_id, nbr_id, cos_u, rank)` — shared by sim_knn_graph and
    * stats_label_errors. Second bucketing: the same plan-time
    * lshPlane ±1 coefficients Similarity.bucketT(KnnTable2, ·) uses,
    * masked to the bit count nb derives from COUNT(*). UNION (not
    * ALL) dedups cross-table pairs: identical payloads.
    */
  private lazy val knnCtes: String = {
    val planeBucket = (0 until 24).map { j =>
      val proj = Similarity.lshPlane(Similarity.KnnTable2, j).map { case (dd, s) =>
        s"CAST($s.0 AS DOUBLE) * CAST(embedding[$dd] AS DOUBLE)"
      }.mkString(" + ")
      s"CASE WHEN $j < nb.nbits THEN CAST(($proj) > 0.0 AS BIGINT) * ${1L << j} ELSE 0 END"
    }.mkString("\n     + ")
    s"""$bucketedDynCte,
       |b2 AS (SELECT vec_id, embedding, $planeBucket AS bucket
       |       FROM embeddings, nb),
       |pr AS (
       |  SELECT a.vec_id AS id_a, a2.vec_id AS id_b,
       |         ${cosU("a.embedding", "a2.embedding")} AS cos_u
       |  FROM b a JOIN b a2 ON a.bucket = a2.bucket AND a.vec_id < a2.vec_id
       |  UNION
       |  SELECT a.vec_id AS id_a, a2.vec_id AS id_b,
       |         ${cosU("a.embedding", "a2.embedding")} AS cos_u
       |  FROM b2 a JOIN b2 a2 ON a.bucket = a2.bucket AND a.vec_id < a2.vec_id),
       |e AS (
       |  SELECT id_a AS vec_id, id_b AS nbr_id, cos_u FROM pr
       |  UNION ALL
       |  SELECT id_b AS vec_id, id_a AS nbr_id, cos_u FROM pr),
       |r AS (
       |  SELECT vec_id, nbr_id, cos_u,
       |    CAST(row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos_u DESC, nbr_id) AS BIGINT) AS rank
       |  FROM e)""".stripMargin
  }

  /** The NN-descent refinement chain over [[knnCtes]], ending in
    * `g{NdRounds}(vec_id, nbr_id, cos_u)` — shared by sim_nndescent
    * and sim_graph_topk so index build and serving cannot drift.
    * Every g_t MATERIALIZEs: round t+1 references it three times,
    * and the graph frames are n·k rows.
    */
  private lazy val ndChainCtes: String = {
    val rounds = (1 to Similarity.NdRounds).map { t =>
      s"""u${t - 1} AS (SELECT vec_id AS v, nbr_id AS u FROM g${t - 1}
         |  UNION ALL SELECT nbr_id AS v, vec_id AS u FROM g${t - 1}),
         |c$t AS (SELECT DISTINCT a.v AS vec_id, b.u AS nbr_id
         |  FROM u${t - 1} a JOIN u${t - 1} b ON a.u = b.v WHERE a.v != b.u),
         |s$t AS (SELECT c.vec_id, c.nbr_id,
         |    ${cosU("ea.embedding", "eb.embedding")} AS cos_u
         |  FROM c$t c JOIN embeddings ea ON c.vec_id = ea.vec_id
         |             JOIN embeddings eb ON c.nbr_id = eb.vec_id),
         |g$t AS MATERIALIZED (
         |  SELECT vec_id, nbr_id, cos_u FROM (
         |    SELECT DISTINCT vec_id, nbr_id, cos_u FROM
         |      (SELECT * FROM g${t - 1} UNION ALL SELECT * FROM s$t))
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cos_u DESC, nbr_id) <= ${Similarity.KnnK})""".stripMargin
    }.mkString(",\n")
    s"""$knnCtes,
       |g0 AS MATERIALIZED (SELECT vec_id, nbr_id, cos_u FROM r
       |  WHERE rank <= ${Similarity.KnnK}),
       |$rounds""".stripMargin
  }

  /** graph-ANN SERVING over the descent chain, parametrized by the
    * probe cohort's residue mod the [[Similarity.ivfProbeMod]]-style
    * modulus: bounded seeds → BeamB keep → BeamHops unrolled
    * expand/rescore/keep rounds over the undirected graph; per-hop
    * CTEs MATERIALIZE (each beam is referenced three times by the
    * next hop). Shared by sim_graph_topk (residue 0) and
    * sim_graph_topk2 (residue 2) — both oracles restate the SAME
    * index, exactly as both Spark serves read the same persisted one.
    */
  private def graphServeOracle(probeRes: Int): String = {
    val hops = (1 to Similarity.BeamHops).map { t =>
      s"""bc$t AS (SELECT DISTINCT b.probe_id, u.u AS vec_id
         |  FROM bb${t - 1} b JOIN undg u ON b.vec_id = u.v),
         |bs$t AS (SELECT c.probe_id, c.vec_id,
         |    ${cosU("bp.pvec", "e.embedding")} AS cos_u
         |  FROM bc$t c JOIN bp ON c.probe_id = bp.probe_id
         |             JOIN embeddings e ON c.vec_id = e.vec_id
         |  WHERE c.vec_id != c.probe_id),
         |bb$t AS MATERIALIZED (
         |  SELECT probe_id, vec_id, cos_u FROM (
         |    SELECT DISTINCT probe_id, vec_id, cos_u FROM
         |      (SELECT * FROM bb${t - 1} UNION ALL SELECT * FROM bs$t))
         |  QUALIFY row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_u DESC, vec_id) <= ${Similarity.BeamB})""".stripMargin
    }.mkString(",\n")
    s"""WITH $ndChainCtes,
       |undg AS MATERIALIZED (
       |  SELECT vec_id AS v, nbr_id AS u FROM g${Similarity.NdRounds}
       |  UNION
       |  SELECT nbr_id AS v, vec_id AS u FROM g${Similarity.NdRounds}),
       |nn2 AS (SELECT COUNT(*) AS n FROM embeddings),
       |pm AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 57) r(g), nn2
       |       WHERE (CAST(1 AS BIGINT) << g) * 64 >= nn2.n),
       |bp AS (SELECT vec_id AS probe_id, embedding AS pvec
       |       FROM embeddings, pm WHERE vec_id % pm.m = $probeRes),
       |bsd AS (SELECT vec_id, embedding FROM embeddings, pm
       |        WHERE vec_id % pm.m = 1),
       |bb0 AS MATERIALIZED (
       |  SELECT probe_id, vec_id, cos_u FROM (
       |    SELECT bp.probe_id, bsd.vec_id,
       |      ${cosU("bp.pvec", "bsd.embedding")} AS cos_u
       |    FROM bp, bsd WHERE bsd.vec_id != bp.probe_id)
       |  QUALIFY row_number() OVER (PARTITION BY probe_id
       |    ORDER BY cos_u DESC, vec_id) <= ${Similarity.BeamB}),
       |$hops
       |SELECT probe_id,
       |  CAST(row_number() OVER (PARTITION BY probe_id
       |    ORDER BY cos_u DESC, vec_id) AS BIGINT) AS rank,
       |  vec_id, cos_u
       |FROM bb${Similarity.BeamHops}
       |QUALIFY rank <= 5 ORDER BY probe_id, rank""".stripMargin
  }

  /** The synchronous-Louvain phase-1 chain over [[knnCtes]], ending
    * in `a{LvRounds}(v, comm)` plus the shared `ke/und/mm/dg` frames —
    * shared by graph_louvain and graph_louvain2 so the move phase and
    * the multi-level loop cannot drift.
    */
  private lazy val lvChainCtes: String = lvChain(Graph.LvRounds)

  /** The chain generator itself, parametrized by round count —
    * graph_louvain/louvain2 use [[Graph.LvRounds]]; the convergence
    * row unrolls to [[Graph.LvConvMax]] (idempotence at the fixpoint
    * makes the full unroll equal to the early-exiting loop).
    */
  private def lvChain(nRounds: Int): String = {
    val rounds = (1 to nRounds).map { t =>
      s"""nb$t AS (SELECT u.id_b AS v, a.comm, CAST(COUNT(*) AS BIGINT) AS e
         |  FROM und u JOIN a${t - 1} a ON u.id_a = a.v GROUP BY 1, 2),
         |cd$t AS (SELECT v, comm, MAX(e) AS e FROM (
         |    SELECT v, comm, e FROM nb$t
         |    UNION ALL SELECT v, comm, CAST(0 AS BIGINT) FROM a${t - 1})
         |  GROUP BY 1, 2),
         |st$t AS (SELECT a.comm, CAST(SUM(COALESCE(dg.deg, 0)) AS BIGINT) AS stot
         |  FROM a${t - 1} a LEFT JOIN dg ON a.v = dg.v GROUP BY 1),
         |sc$t AS (SELECT c.v, c.comm,
         |    4 * mm.m * c.e - 2 * COALESCE(d.deg, 0) *
         |      (s.stot - CASE WHEN c.comm = a.comm
         |        THEN COALESCE(d.deg, 0) ELSE 0 END) AS score
         |  FROM cd$t c JOIN a${t - 1} a ON c.v = a.v
         |    LEFT JOIN dg d ON c.v = d.v
         |    JOIN st$t s ON c.comm = s.comm, mm),
         |a$t AS MATERIALIZED (SELECT v, comm FROM sc$t
         |  QUALIFY row_number() OVER (PARTITION BY v
         |    ORDER BY score DESC, comm) = 1)""".stripMargin
    }.mkString(",\n")
    s"""$kePreamble,
       |und AS (SELECT id_a, id_b FROM ke
       |        UNION ALL SELECT id_b AS id_a, id_a AS id_b FROM ke),
       |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM ke),
       |dg AS (SELECT id_a AS v, CAST(COUNT(*) AS BIGINT) AS deg
       |       FROM und GROUP BY 1),
       |a0 AS (SELECT vec_id AS v, vec_id AS comm FROM embeddings),
       |$rounds""".stripMargin
  }

  /** The k-NN edge frame (unique undirected pairs) over [[knnCtes]] —
    * shared by the Louvain chains and the k-truss peel so the graphs
    * cannot drift.
    */
  private lazy val kePreamble: String =
    s"""$knnCtes,
       |ke AS MATERIALIZED (SELECT LEAST(vec_id, nbr_id) AS id_a,
       |    GREATEST(vec_id, nbr_id) AS id_b
       |  FROM r WHERE rank <= ${Similarity.KnnK} GROUP BY 1, 2)""".stripMargin

  /** The char-bigram LM scoring chain ending in
    * `lmdoc(doc_id, source, n_bigrams, lm_u)` (zero-bigram docs
    * default-filled) — shared by text_charlm and text_ccnet_buckets.
    */
  private val charLmCtes: String =
    """pos AS (
      |  SELECT doc_id, text, unnest(generate_series(1, length(text)-1)) AS i
      |  FROM documents),
      |bg AS (SELECT doc_id, substr(text, CAST(i AS INT), 2) AS bg FROM pos),
      |c2 AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY 1),
      |c1 AS (SELECT substr(bg, 1, 1) AS p, CAST(SUM(c2) AS BIGINT) AS c1
      |       FROM c2 GROUP BY 1),
      |pr AS (SELECT bg, CAST((1000000 * c2) // c1 AS BIGINT) AS p_u
      |       FROM c2 JOIN c1 ON substr(bg, 1, 1) = c1.p),
      |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |         CAST(SUM(p_u) // COUNT(*) AS BIGINT) AS lm_u
      |       FROM bg JOIN pr USING (bg) GROUP BY 1),
      |lmdoc AS (SELECT d.doc_id, d.source,
      |            COALESCE(sc.n_bigrams, 0) AS n_bigrams,
      |            COALESCE(sc.lm_u, 0) AS lm_u
      |          FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id)""".stripMargin

  /** The label-propagation CTE chain (k-NN edges → undirected frame →
    * [[Graph.LpRounds]] rounds ending in `l{R}(v, lab)`) — shared by
    * the graph_label_prop and graph_modularity oracles so the two
    * cannot drift.
    */
  private lazy val lpChainCtes: String = {
    val rounds = (1 to Graph.LpRounds).map { t =>
      s"""vt$t AS (SELECT u.id_b AS v, l.lab, CAST(COUNT(*) AS BIGINT) AS c
         |         FROM und u JOIN l${t - 1} l ON u.id_a = l.v GROUP BY 1, 2),
         |p$t AS (SELECT v, MIN(lab) AS lab FROM (
         |          SELECT v, lab, c, MAX(c) OVER (PARTITION BY v) AS mc FROM vt$t)
         |        WHERE c = mc GROUP BY v),
         |l$t AS (SELECT l.v, COALESCE(p.lab, l.lab) AS lab
         |        FROM l${t - 1} l LEFT JOIN p$t p ON l.v = p.v)""".stripMargin
    }.mkString(",\n")
    s"""$knnCtes,
       |ke AS (SELECT LEAST(vec_id, nbr_id) AS id_a, GREATEST(vec_id, nbr_id) AS id_b
       |       FROM r WHERE rank <= ${Similarity.KnnK} GROUP BY 1, 2),
       |und AS (SELECT id_a, id_b FROM ke
       |        UNION ALL SELECT id_b AS id_a, id_a AS id_b FROM ke),
       |l0 AS (SELECT vec_id AS v, vec_id AS lab FROM embeddings),
       |$rounds""".stripMargin
  }

  /** Shared PII regexes / filter thresholds (see [[TextAnalysis]]). */
  private val ePat = TextAnalysis.emailPat
  private val iPat = TextAnalysis.ipPat
  private val pPat = TextAnalysis.phonePat

  /** Quality-rule CTE chain ending in `g(doc_id, f_*, n_fail)` —
    * shared by text_filter and pipeline_clean.
    */
  private[graft] val filterCtes: String =
    s"""fd AS (SELECT doc_id, text, $toks AS t FROM documents),
       |fm AS (
       |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
       |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS alpha,
       |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit,
       |    CAST(len(t) AS BIGINT) AS nt,
       |    CAST(len(list_distinct(t)) AS BIGINT) AS nd,
       |    CAST(len(list_filter(t, x -> length(x) > ${TextAnalysis.MaxTokenLen})) AS BIGINT) AS n_long
       |  FROM fd),
       |ff AS (
       |  SELECT doc_id,
       |    CAST(n < ${TextAnalysis.MinChars} AS BIGINT) AS f_short,
       |    CAST(nt < ${TextAnalysis.MinTokens} AS BIGINT) AS f_few_tokens,
       |    CAST(alpha * 2 < n AS BIGINT) AS f_low_alpha,
       |    CAST(digit * 5 > n AS BIGINT) AS f_high_digit,
       |    CAST(nd * 2 < nt AS BIGINT) AS f_repetitive,
       |    CAST(n_long > 0 AS BIGINT) AS f_long_token
       |  FROM fm),
       |g AS (
       |  SELECT *, f_short + f_few_tokens + f_low_alpha + f_high_digit
       |           + f_repetitive + f_long_token AS n_fail FROM ff)""".stripMargin

  /** PII-mask CTE chain ending in
    * `s3(doc_id, n_email, n_ip, n_phone, masked)` — shared by
    * text_pii_mask and pipeline_clean.
    */
  private[graft] val maskCtes: String =
    s"""s1 AS (
       |  SELECT doc_id, CAST(len(regexp_extract_all(text, '$ePat')) AS BIGINT) AS n_email,
       |    regexp_replace(text, '$ePat', '<EMAIL>', 'g') AS m1
       |  FROM documents),
       |s2 AS (
       |  SELECT doc_id, n_email, CAST(len(regexp_extract_all(m1, '$iPat')) AS BIGINT) AS n_ip,
       |    regexp_replace(m1, '$iPat', '<IP>', 'g') AS m2
       |  FROM s1),
       |s3 AS (
       |  SELECT doc_id, n_email, n_ip, CAST(len(regexp_extract_all(m2, '$pPat')) AS BIGINT) AS n_phone,
       |    regexp_replace(m2, '$pPat', '<PHONE>', 'g') AS masked
       |  FROM s2)""".stripMargin

  /** CTE chain of the pipeline_train flow through `sv(doc_id, source,
    * n_dups, n_tokens)` — the decontaminated canonical survivors —
    * shared by the pipeline_train and pipeline_shard oracles.
    */
  private val mtoks = "regexp_extract_all(lower(masked), '[a-z0-9]+')"
  private lazy val trainCtes: String =
    s"""$filterCtes,
       |$maskCtes,
       |kd AS (
       |  SELECT s3.doc_id, s3.masked
       |  FROM s3 JOIN g ON s3.doc_id = g.doc_id WHERE g.n_fail = 0),
       |canon AS (
       |  SELECT md5(masked) AS masked_md5, CAST(MIN(doc_id) AS BIGINT) AS doc_id,
       |    arg_min(masked, doc_id) AS masked, CAST(COUNT(*) AS BIGINT) AS n_dups
       |  FROM kd GROUP BY md5(masked)),
       |cs AS (
       |  SELECT c.doc_id, d.source, c.n_dups, c.masked
       |  FROM canon c JOIN documents d ON c.doc_id = d.doc_id
       |  WHERE c.doc_id % 97 <> 0),
       |bt AS (SELECT doc_id, $toks AS t FROM documents WHERE doc_id % 97 = 0),
       |bs AS (SELECT DISTINCT unnest($shingles) AS s FROM bt),
       |tt AS (SELECT doc_id, $mtoks AS t FROM cs),
       |tsh AS (SELECT doc_id, unnest($shingles) AS s FROM tt),
       |nh AS (SELECT tsh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
       |       FROM tsh JOIN bs USING (s) GROUP BY 1),
       |sv AS (
       |  SELECT cs.doc_id, cs.source, cs.n_dups,
       |    CAST(len($mtoks) AS BIGINT) AS n_tokens
       |  FROM cs LEFT JOIN nh ON cs.doc_id = nh.doc_id
       |  WHERE COALESCE(nh.n_hit, 0) < 3)"""      .stripMargin

  /** Shared by dedup_substring and dedup_substring_hashed: the two
    * engine paths differ only in HOW duplicate windows are found
    * (text groupBy vs hash-first + text verify), never in which
    * windows are duplicates.
    */
  private val substrOracle: String = {
    val L = Dedup.SubstrL
    s"""WITH posn AS (
       |  SELECT doc_id, text, unnest(generate_series(1, length(text) - ${L - 1})) AS i
       |  FROM documents),
       |sh AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
       |         substr(text, CAST(i AS INT), $L) AS sh FROM posn),
       |dup AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) > 1),
       |mk AS (SELECT doc_id, pos FROM sh JOIN dup USING (sh)),
       |sp AS (SELECT doc_id, pos,
       |         MAX(pos + ${L - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |       FROM mk),
       |isl AS (SELECT doc_id, pos,
       |         CAST(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
       |           THEN 1 ELSE 0 END AS BIGINT) AS new_island FROM sp),
       |isl2 AS (SELECT doc_id, pos,
       |          SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |        FROM isl),
       |seg AS (SELECT doc_id, island, MIN(pos) AS s, MAX(pos + ${L - 1}) AS e
       |        FROM isl2 GROUP BY 1, 2),
       |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
       |          CAST(SUM(e - s + 1) AS BIGINT) AS dup_chars
       |        FROM seg GROUP BY 1)
       |SELECT d.doc_id, CAST(length(text) AS BIGINT) AS len,
       |  COALESCE(n_spans, 0) AS n_spans, COALESCE(dup_chars, 0) AS dup_chars,
       |  CAST(CASE WHEN length(text) > 0
       |    THEN (1000 * COALESCE(dup_chars, 0)) // length(text)
       |    ELSE 0 END AS BIGINT) AS dup_milli
       |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  /** Shared BPE training chain (text_bpe + text_bpe_encode): top-word
    * histogram -> char sequences -> one CTE triple per merge round
    * (the Lloyd-unroll pattern): weighted adjacent-pair counts ->
    * best pair (count desc, pair asc) -> left-to-right non-overlapping
    * replace (identical scan-resume semantics in both engines).
    * Exposes w0..wR and b1..bR.
    */
  private val bpeTrainCtes: String = {
    val roundCtes = (1 to TextAnalysis.BpeRounds).map { r =>
      s"""s$r AS (SELECT cnt, string_split(trim(seq), ' ') AS syms FROM w${r - 1}),
         |p$r AS (
         |  SELECT syms[i] AS a, syms[i + 1] AS b, CAST(SUM(cnt) AS BIGINT) AS pair_cnt
         |  FROM (SELECT cnt, syms, unnest(generate_series(1, len(syms) - 1)) AS i FROM s$r)
         |  GROUP BY 1, 2),
         |b$r AS (SELECT a, b, a || b AS merged, pair_cnt FROM p$r
         |        ORDER BY pair_cnt DESC, a, b LIMIT 1),
         |w$r AS (SELECT word, cnt,
         |          replace(seq, ' ' || b$r.a || ' ' || b$r.b || ' ',
         |                  ' ' || b$r.merged || ' ') AS seq
         |        FROM w${r - 1}, b$r)""".stripMargin
    }.mkString(",\n")
    s"""tk AS (SELECT unnest($toks) AS word FROM documents),
       |tw AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM tk
       |       GROUP BY 1 ORDER BY cnt DESC, word LIMIT ${TextAnalysis.BpeWords}),
       |w0 AS (SELECT word, cnt,
       |  ' ' || array_to_string([word[i] for i in range(1, len(word) + 1)], ' ') || ' ' AS seq
       |  FROM tw),
       |$roundCtes""".stripMargin
  }

  /** Shared PCA power-iteration chain (embed_pca_power +
    * embed_project) — mirrors [[Similarity.pcaFit]]. Exposes `m`
    * (means), `c` (centered long form), and per-round w$r / v$r.
    */
  private val pcaTrainCtes: String = {
    val rounds = (1 to Similarity.PcaRounds).map { r =>
      val vPrev = if (r == 1) "v0" else s"v${r - 1}"
      s"""s$r AS (SELECT vec_id, CAST(SUM(cq * v_u) AS BIGINT) // 1000000 AS sp
         |       FROM c JOIN $vPrev USING (dim) GROUP BY vec_id),
         |w$r AS (SELECT dim, CAST(SUM((cq * sp) // 1048576) AS BIGINT) AS vr
         |       FROM c JOIN s$r USING (vec_id) GROUP BY dim),
         |n$r AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |         list(CAST(vr AS DOUBLE) * CAST(vr AS DOUBLE) ORDER BY dim)),
         |         (a, b) -> a + b) AS n2 FROM w$r),
         |v$r AS (SELECT dim, CAST(FLOOR(1000000.0 * vr / sqrt(n2)) AS BIGINT) AS v_u
         |       FROM w$r, n$r)""".stripMargin
    }.mkString(",\n")
    s"""nn AS (SELECT COUNT(*) AS n FROM embeddings),
       |xl AS (SELECT vec_id, CAST(i AS BIGINT) AS dim,
       |         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS xq
       |       FROM embeddings, range(1, 65) r(i)),
       |m AS (SELECT dim, CAST(SUM(xq) // nn.n AS BIGINT) AS mean_q
       |      FROM xl, nn GROUP BY dim, nn.n),
       |c AS (SELECT vec_id, xl.dim, xq - mean_q AS cq FROM xl JOIN m USING (dim)),
       |v0 AS (SELECT dim, CAST(CASE WHEN dim = 1 THEN 1000000 ELSE 0 END AS BIGINT) AS v_u
       |       FROM m),
       |$rounds""".stripMargin
  }

  val all: Map[String, String] = Map(
    "text_filter" ->
      s"""WITH $filterCtes
         |SELECT doc_id, f_short, f_few_tokens, f_low_alpha, f_high_digit,
         |  f_repetitive, f_long_token, n_fail,
         |  CAST(n_fail = 0 AS BIGINT) AS keep,
         |  COALESCE(array_to_string(list_filter([
         |    CASE WHEN f_short = 1 THEN 'short' ELSE '' END,
         |    CASE WHEN f_few_tokens = 1 THEN 'few_tokens' ELSE '' END,
         |    CASE WHEN f_low_alpha = 1 THEN 'low_alpha' ELSE '' END,
         |    CASE WHEN f_high_digit = 1 THEN 'high_digit' ELSE '' END,
         |    CASE WHEN f_repetitive = 1 THEN 'repetitive' ELSE '' END,
         |    CASE WHEN f_long_token = 1 THEN 'long_token' ELSE '' END], x -> x <> ''), ','), '') AS reasons
         |FROM g ORDER BY doc_id""".stripMargin,
    "text_pii_mask" ->
      s"""WITH $maskCtes
         |SELECT doc_id, n_email, n_ip, n_phone,
         |  CAST(length(masked) AS BIGINT) AS masked_len, md5(masked) AS masked_md5
         |FROM s3 ORDER BY doc_id""".stripMargin,
    "pipeline_train" -> {
      val w = TextAnalysis.WinTokens
      s"""WITH $trainCtes,
         |pk AS (
         |  SELECT doc_id, source, n_dups, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
         |  FROM sv)
         |SELECT doc_id, source, n_dups, n_tokens, start_tok,
         |  CAST(start_tok // $w AS BIGINT) AS first_win,
         |  CAST(CASE WHEN n_tokens > 0 THEN (start_tok + n_tokens - 1) // $w
         |       ELSE start_tok // $w END AS BIGINT) AS last_win,
         |  CAST(CASE WHEN n_tokens > 0
         |       THEN (start_tok + n_tokens - 1) // $w - start_tok // $w + 1
         |       ELSE 0 END AS BIGINT) AS n_wins
         |FROM pk ORDER BY doc_id""".stripMargin
    },
    "pipeline_export" -> {
      def vs(x: String) =
        s"(CASE WHEN ($x) < 128 THEN 1 WHEN ($x) < 16384 THEN 2 WHEN ($x) < 2097152 THEN 3 WHEN ($x) < 268435456 THEN 4 ELSE 5 END)"
      s"""WITH $trainCtes,
         |se AS (SELECT sv.doc_id, sv.n_tokens, cs.masked,
         |         ${md5Int("('shard:' || CAST(sv.doc_id AS VARCHAR))")} % ${Pipeline.NShards} AS shard
         |       FROM sv JOIN cs USING (doc_id)),
         |m AS (SELECT *, CAST(octet_length(encode(masked)) AS BIGINT) AS tlen,
         |       CAST(row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS rk
         |      FROM se),
         |x1 AS (SELECT *, 16 + ${vs("doc_id")} AS e_id, 18 + ${vs("n_tokens")} AS e_nt,
         |        1 + ${vs("tlen")} + tlen AS bl FROM m),
         |x2 AS (SELECT *, 1 + ${vs("bl")} + bl AS ft FROM x1),
         |x3 AS (SELECT *, 7 + ${vs("ft")} + ft AS ei FROM x2),
         |x4 AS (SELECT *, e_id + e_nt + 1 + ${vs("ei")} + ei AS fts FROM x3),
         |rec AS (SELECT shard, doc_id, n_tokens, tlen, rk, masked,
         |    17 + ${vs("fts")} + fts AS rec_bytes FROM x4)
         |SELECT CAST(shard AS BIGINT) AS shard, COUNT(*) AS n_records,
         |  CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
         |  CAST(SUM(n_tokens) AS BIGINT) AS sum_n_tokens,
         |  CAST(SUM(tlen) AS BIGINT) AS sum_text_bytes,
         |  CAST(SUM(rec_bytes) AS BIGINT) AS bytes_total,
         |  CAST(SUM(rk * ${md5Int("masked")}) AS BIGINT) AS text_cksum
         |FROM rec GROUP BY shard ORDER BY shard""".stripMargin
    },
    "pipeline_shard" ->
      s"""WITH $trainCtes,
         |sh2 AS (SELECT doc_id, n_tokens,
         |  ${md5Int("('shard:' || CAST(doc_id AS VARCHAR))")} % ${Pipeline.NShards} AS shard
         |  FROM sv)
         |SELECT CAST(shard AS BIGINT) AS shard, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(MIN(doc_id) AS BIGINT) AS min_doc,
         |  CAST(MAX(doc_id) AS BIGINT) AS max_doc,
         |  CAST(SUM(doc_id * doc_id) AS BIGINT) AS doc_chk
         |FROM sh2 GROUP BY shard ORDER BY shard""".stripMargin,
    "pipeline_clean" ->
      s"""WITH $filterCtes,
         |$maskCtes,
         |kd AS (
         |  SELECT s3.doc_id, md5(s3.masked) AS masked_md5
         |  FROM s3 JOIN g ON s3.doc_id = g.doc_id WHERE g.n_fail = 0),
         |canon AS (
         |  SELECT masked_md5, CAST(MIN(doc_id) AS BIGINT) AS doc_id,
         |    CAST(COUNT(*) AS BIGINT) AS n_dups
         |  FROM kd GROUP BY masked_md5),
         |cs AS (
         |  SELECT c.doc_id, d.source, c.masked_md5, c.n_dups,
         |    CAST(${md5Int("d.source || ':' || CAST(c.doc_id AS VARCHAR)")} AS BIGINT) AS samp_hash
         |  FROM canon c JOIN documents d ON c.doc_id = d.doc_id),
         |rk AS (
         |  SELECT source, doc_id, masked_md5, n_dups, samp_hash,
         |    CAST(row_number() OVER (PARTITION BY source ORDER BY samp_hash, doc_id) AS BIGINT) AS rk
         |  FROM cs)
         |SELECT source, doc_id, masked_md5, n_dups, samp_hash, rk
         |FROM rk WHERE rk <= ${Sampling.StratumK} ORDER BY source, rk""".stripMargin,
    "sample_split" -> {
      val h = md5Int("('split:' || CAST(doc_id AS VARCHAR))")
      s"""WITH d AS (
         |  SELECT doc_id, source, n_chars,
         |    CASE WHEN $h % 100 < ${Sampling.SplitTrainPct} THEN 'train'
         |         WHEN $h % 100 < ${Sampling.SplitValPct} THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |SELECT source, split, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
         |  CAST(MIN(doc_id) AS BIGINT) AS min_doc,
         |  CAST(SUM(doc_id) AS BIGINT) AS doc_sum
         |FROM d GROUP BY source, split ORDER BY source, split""".stripMargin
    },
    // the multimodal dedup capstone rides the phash-cluster closure
    "pipeline_mm" ->
      s"""WITH RECURSIVE $phashPairCtes,
         |pr AS (SELECT doc_a, doc_b FROM crossp
         |       UNION ALL SELECT doc_a, doc_b FROM intra),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM pr
         |      UNION ALL SELECT doc_b, doc_a FROM pr),
         |reach(doc, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.src, r.lbl FROM reach r JOIN e ON r.doc = e.dst),
         |mm AS (SELECT doc, CAST(MIN(lbl) AS BIGINT) AS cluster FROM reach GROUP BY doc)
         |SELECT d.source, COUNT(*) AS n_images,
         |  CAST(COUNT(DISTINCT m.cluster) AS BIGINT) AS n_families,
         |  CAST(SUM(CASE WHEN d.doc_id = m.cluster THEN 1 ELSE 0 END) AS BIGINT) AS n_reps,
         |  CAST(SUM(CASE WHEN d.doc_id <> m.cluster THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  CAST(COALESCE(SUM(CASE WHEN d.doc_id = m.cluster THEN d.n_chars END), 0) AS BIGINT) AS kept_chars
         |FROM documents d JOIN mm m ON d.doc_id = m.doc
         |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "pipeline_card" -> {
      val h = md5Int("('split:' || CAST(d.doc_id AS VARCHAR))")
      s"""WITH $filterCtes,
         |cd AS (
         |  SELECT d.doc_id, d.source, fm.n,
         |    CAST(g.n_fail = 0 AS BIGINT) AS keep,
         |    CASE WHEN $h % 100 < ${Sampling.SplitTrainPct} THEN 'train'
         |         WHEN $h % 100 < ${Sampling.SplitValPct} THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents d
         |  JOIN fm ON d.doc_id = fm.doc_id
         |  JOIN g ON d.doc_id = g.doc_id)
         |SELECT source, split, COUNT(*) AS n_docs,
         |  CAST(SUM(n) AS BIGINT) AS n_chars,
         |  CAST(SUM(n // 4) AS BIGINT) AS est_tokens,
         |  CAST(SUM(keep) AS BIGINT) AS n_kept,
         |  CAST(SUM(n * keep) AS BIGINT) AS kept_chars
         |FROM cd GROUP BY source, split ORDER BY source, split""".stripMargin
    },
    "stats_token_hist" -> {
      val w = Sampling.TokHistWidth
      s"""WITH d AS (SELECT source,
         |  CAST(len($toks) AS BIGINT) AS nt FROM documents)
         |SELECT source, CAST(nt // $w AS BIGINT) AS bucket,
         |  COUNT(*) AS n_docs,
         |  CAST(MIN(nt) AS BIGINT) AS min_toks,
         |  CAST(MAX(nt) AS BIGINT) AS max_toks,
         |  CAST(SUM(nt) AS BIGINT) AS sum_toks
         |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "stats_approx_quantile" -> {
      val w = Sampling.HistWidthC
      s"""WITH e AS (SELECT event_type,
         |  CAST(FLOOR((value)*100) AS BIGINT) AS value_c FROM events),
         |h AS (SELECT event_type, CAST(FLOOR(value_c / $w.0) AS BIGINT) AS bucket,
         |        CAST(COUNT(*) AS BIGINT) AS cnt, CAST(MAX(value_c) AS BIGINT) AS max_c
         |      FROM e GROUP BY 1, 2),
         |c AS (SELECT *, CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt,
         |        CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
         |      FROM h),
         |t AS (SELECT event_type, bucket, max_c, cum_cnt, n,
         |        CAST(pp.p AS BIGINT) AS p,
         |        CAST((pp.p * n + 99) // 100 AS BIGINT) AS r
         |      FROM c, (VALUES ${Sampling.QuantPs.map(p => s"($p)").mkString(", ")}) pp(p)
         |      WHERE cum_cnt >= (pp.p * n + 99) // 100)
         |SELECT event_type, p, n, bucket, max_c AS est_c FROM t
         |QUALIFY row_number() OVER (PARTITION BY event_type, p ORDER BY bucket) = 1
         |ORDER BY event_type, p""".stripMargin
    },
    "sample_negatives" ->
      s"""WITH $bucketedDynCte,
         |${pairsCte(-2000000L)},
         |nn2 AS (SELECT COUNT(*) AS n FROM embeddings),
         |pm AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 57) r(g), nn2
         |       WHERE (CAST(1 AS BIGINT) << g) * 64 >= nn2.n),
         |cand AS (
         |  SELECT id_a AS probe_id, id_b AS neg_id, cos_u FROM hits, pm WHERE id_a % pm.m = 0
         |  UNION ALL
         |  SELECT id_b AS probe_id, id_a AS neg_id, cos_u FROM hits, pm WHERE id_b % pm.m = 0),
         |hard AS (
         |  SELECT probe_id, CAST(row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos_u DESC, neg_id) AS BIGINT) AS rank, neg_id, cos_u
         |  FROM cand WHERE cos_u < ${Sampling.NegDupU}
         |  QUALIFY rank <= ${Sampling.NegHard}),
         |mates AS (SELECT DISTINCT probe_id, neg_id FROM cand),
         |pr AS (SELECT vec_id AS probe_id, embedding AS pvec
         |       FROM embeddings, pm WHERE vec_id % pm.m = 0),
         |easy AS (
         |  SELECT p.probe_id,
         |    CAST(${Sampling.NegHard} + row_number() OVER (PARTITION BY p.probe_id
         |      ORDER BY ${md5Int("('neg:' || CAST(p.probe_id AS VARCHAR) || ':' || CAST(e.vec_id AS VARCHAR))")}, e.vec_id) AS BIGINT) AS rank,
         |    e.vec_id AS neg_id, ${cosU("p.pvec", "e.embedding")} AS cos_u
         |  FROM embeddings e, pr p
         |  WHERE e.vec_id != p.probe_id AND NOT EXISTS (
         |    SELECT 1 FROM mates m WHERE m.probe_id = p.probe_id AND m.neg_id = e.vec_id)
         |  QUALIFY rank <= ${Sampling.NegHard + Sampling.NegEasy})
         |SELECT probe_id, rank, neg_id, cos_u, 'hard' AS kind FROM hard
         |UNION ALL SELECT probe_id, rank, neg_id, cos_u, 'easy' AS kind FROM easy
         |ORDER BY probe_id, rank""".stripMargin,
    "agg_kmv_overlap" -> {
      val K = Sampling.KmvK
      s"""WITH du AS (SELECT DISTINCT event_type,
         |    CAST(user_id AS VARCHAR) || '@' ||
         |    CAST((epoch_ns(ts) // 1000000000) // 86400 AS VARCHAR) AS key
         |  FROM events),
         |dh AS (SELECT DISTINCT event_type, ${md5Int("key")} AS h FROM du),
         |kth AS (SELECT event_type, MAX(h) AS kth FROM (
         |          SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk FROM dh)
         |        WHERE rk <= $K GROUP BY event_type),
         |smp AS (SELECT dh.event_type, dh.h FROM dh JOIN kth USING (event_type) WHERE dh.h <= kth.kth),
         |pairs AS (SELECT a.event_type AS ta, b.event_type AS tb
         |          FROM kth a, kth b WHERE a.event_type < b.event_type),
         |un AS (SELECT p.ta, p.tb, s.h FROM pairs p JOIN smp s ON s.event_type = p.ta
         |       UNION SELECT p.ta, p.tb, s.h FROM pairs p JOIN smp s ON s.event_type = p.tb),
         |topu AS (SELECT ta, tb, h FROM (
         |           SELECT ta, tb, h, row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rk FROM un)
         |         WHERE rk <= $K),
         |ug AS (SELECT ta, tb, CAST(COUNT(*) AS BIGINT) AS k_union, MAX(h) AS union_kth
         |       FROM topu GROUP BY 1, 2),
         |mt AS (SELECT t.ta, t.tb, CAST(COUNT(*) AS BIGINT) AS matches FROM topu t
         |       JOIN smp a ON a.event_type = t.ta AND a.h = t.h
         |       JOIN smp b ON b.event_type = t.tb AND b.h = t.h GROUP BY 1, 2),
         |ex AS (SELECT a.event_type AS ta, b.event_type AS tb, CAST(COUNT(*) AS BIGINT) AS exact_inter
         |       FROM du a JOIN du b ON a.key = b.key AND a.event_type < b.event_type GROUP BY 1, 2),
         |est AS (SELECT ug.ta, ug.tb, ug.k_union, ug.union_kth,
         |          CAST(COALESCE(mt.matches, 0) AS BIGINT) AS matches,
         |          CAST(CASE WHEN ug.k_union < $K THEN ug.k_union
         |               ELSE ${K - 1} * 4294967296 // GREATEST(ug.union_kth, 1) END AS BIGINT) AS est_union
         |        FROM ug LEFT JOIN mt USING (ta, tb))
         |SELECT est.ta, est.tb, est.k_union, est.union_kth, est.matches, est.est_union,
         |  CAST(est.matches * est.est_union // est.k_union AS BIGINT) AS est_inter,
         |  CAST(1000000 * est.matches // est.k_union AS BIGINT) AS jacc_u,
         |  CAST(COALESCE(ex.exact_inter, 0) AS BIGINT) AS exact_inter
         |FROM est LEFT JOIN ex USING (ta, tb) ORDER BY ta, tb""".stripMargin
    },
    "stats_ks_drift" ->
      s"""WITH d AS (SELECT source, CAST(n_chars AS BIGINT) AS len FROM documents),
         |pl AS (SELECT source, len, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY 1, 2),
         |al AS (SELECT len, CAST(SUM(c) AS BIGINT) AS cl FROM pl GROUP BY 1),
         |ca AS (SELECT len, CAST(SUM(cl) OVER (ORDER BY len) AS BIGINT) AS call FROM al),
         |src AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_src FROM pl GROUP BY 1),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
         |grid AS (SELECT s.source, ca.len, ca.call
         |         FROM (SELECT DISTINCT source FROM pl) s, ca),
         |g2 AS (SELECT grid.source, grid.len, grid.call, COALESCE(pl.c, 0) AS c
         |       FROM grid LEFT JOIN pl USING (source, len)),
         |g3 AS (SELECT source, len, call,
         |         CAST(SUM(c) OVER (PARTITION BY source ORDER BY len) AS BIGINT) AS c1
         |       FROM g2),
         |g4 AS (SELECT g3.source, g3.len,
         |         ABS(CAST(c1 AS HUGEINT) * (nn.n - src.n_src)
         |           - CAST(call - c1 AS HUGEINT) * src.n_src) AS diff
         |       FROM g3 JOIN src USING (source), nn),
         |mx AS (SELECT source, MAX(diff) AS dd FROM g4 GROUP BY 1),
         |at AS (SELECT g4.source, MIN(g4.len) AS at_len
         |       FROM g4 JOIN mx ON g4.source = mx.source AND g4.diff = mx.dd GROUP BY 1)
         |SELECT mx.source, src.n_src,
         |  CAST(FLOOR(CAST(mx.dd AS DOUBLE)
         |    / (CAST(src.n_src AS DOUBLE) * CAST(nn.n - src.n_src AS DOUBLE))
         |    * 1000000.0) AS BIGINT) AS ks_u,
         |  at.at_len
         |FROM mx JOIN src USING (source) JOIN at USING (source), nn
         |ORDER BY mx.source""".stripMargin,
    "stats_source_drift" ->
      s"""WITH tl AS (SELECT doc_id, source, unnest($toks) AS tok FROM documents),
         |cell AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS o FROM tl GROUP BY 1, 2),
         |st AS (SELECT source, CAST(SUM(o) AS BIGINT) AS src_tot FROM cell GROUP BY 1),
         |tt AS (SELECT tok, CAST(SUM(o) AS BIGINT) AS tok_tot FROM cell GROUP BY 1),
         |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n_total FROM cell),
         |d AS (SELECT c.source, c.tok, c.o,
         |        CAST(c.o AS HUGEINT) * nn.n_total - CAST(st.src_tot AS HUGEINT) * tt.tok_tot AS num,
         |        CAST(st.src_tot AS HUGEINT) * tt.tok_tot * nn.n_total AS den
         |      FROM cell c JOIN st USING (source) JOIN tt USING (tok), nn),
         |r AS (SELECT source, tok, o,
         |        CAST(FLOOR(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
         |          / CAST(den AS DOUBLE) * 1000000.0) AS BIGINT) AS drift_u
         |      FROM d)
         |SELECT source, CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY drift_u DESC, tok) AS BIGINT) AS rank, tok, o, drift_u
         |FROM r QUALIFY rank <= ${Sampling.DriftTopK} ORDER BY source, rank""".stripMargin,
    // mergeable raw power sums (DuckDB SUM(BIGINT) widens to HUGEINT —
    // cast every sum back so the schemas agree)
    "stats_moments" ->
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(value) AS BIGINT) AS v FROM events)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(v) AS BIGINT) AS s1,
        |  CAST(SUM(v*v) AS BIGINT) AS s2,
        |  CAST(SUM(v*v*v) AS BIGINT) AS s3,
        |  CAST(SUM(v*v*v*v) AS BIGINT) AS s4
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    // day-parity period split, top movers by absolute count delta
    "stats_heavy_changers" ->
      s"""WITH e AS (SELECT event_type,
         |    ((epoch_ns(ts) // 1000000000) // 86400) % 2 AS par FROM events),
         |c AS (SELECT event_type,
         |    CAST(SUM(CASE WHEN par = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
         |    CAST(SUM(CASE WHEN par = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
         |  FROM e GROUP BY 1)
         |SELECT event_type, cnt_a, cnt_b,
         |  cnt_b - cnt_a AS delta, ABS(cnt_b - cnt_a) AS abs_delta
         |FROM c ORDER BY abs_delta DESC, event_type
         |LIMIT ${graft.ops.Sampling.ChangersK}""".stripMargin,
    "stats_value_hist" -> {
      val w = Sampling.HistWidthC
      s"""WITH e AS (SELECT event_type,
         |  CAST(FLOOR((value)*100) AS BIGINT) AS value_c FROM events)
         |SELECT event_type, CAST(FLOOR(value_c / $w.0) AS BIGINT) AS bucket,
         |  COUNT(*) AS cnt,
         |  CAST(MIN(value_c) AS BIGINT) AS min_c,
         |  CAST(MAX(value_c) AS BIGINT) AS max_c,
         |  CAST(SUM(value_c) AS BIGINT) AS sum_c
         |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "sample_curriculum" -> {
      val ts = (1 to 9).map { k =>
        s"MIN(CASE WHEN cum >= GREATEST(1, ($k * n) // 10) THEN score_u END) AS t$k"
      }.mkString(",\n  ")
      val ph = (1 to 9).map(k => s"CAST(sc.score_u >= t.t$k AS BIGINT)").mkString(" + ")
      s"""WITH $scoreCtes,
         |h AS (SELECT score_u, COUNT(*) AS c FROM sc GROUP BY 1),
         |w AS (SELECT *,
         |  SUM(c) OVER (ORDER BY score_u
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  SUM(c) OVER () AS n FROM h),
         |t AS (SELECT
         |  $ts
         |FROM w)
         |SELECT sc.doc_id, sc.score_u, CAST($ph AS BIGINT) AS phase
         |FROM sc, t ORDER BY sc.doc_id""".stripMargin
    },
    "stats_gini" ->
      """WITH r AS (
        |  SELECT source, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS BIGINT) AS rk
        |  FROM documents),
        |a AS (
        |  SELECT source, COUNT(*) AS n,
        |    CAST(SUM(n_chars) AS BIGINT) AS sum_x,
        |    CAST(SUM(rk * n_chars) AS BIGINT) AS rank_mass
        |  FROM r GROUP BY source)
        |SELECT source, n, sum_x,
        |  CAST(2 * rank_mass - (n + 1) * sum_x AS BIGINT) AS num,
        |  CAST(n * sum_x AS BIGINT) AS den,
        |  CAST((CAST(1000000 AS HUGEINT) * (2 * rank_mass - (n + 1) * sum_x))
        |    // (n * sum_x) AS BIGINT) AS g_u
        |FROM a ORDER BY source""".stripMargin,
    "stats_mad_outliers" -> {
      def medCte(src: String, out: String): String =
        s"""(SELECT source, (v1 + v2) // 2 AS $out FROM (
           |  SELECT source,
           |    MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS v1,
           |    MIN(CASE WHEN cum >= (n + 2) // 2 THEN v END) AS v2
           |  FROM (SELECT source, v,
           |      SUM(c) OVER (PARTITION BY source ORDER BY v
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           |      SUM(c) OVER (PARTITION BY source) AS n
           |    FROM (SELECT source, v, COUNT(*) AS c FROM $src GROUP BY 1, 2))
           |  GROUP BY source))""".stripMargin
      s"""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
         |med AS ${medCte("(SELECT source, n_chars AS v FROM d)", "med")},
         |dv AS (
         |  SELECT d.doc_id, d.source, abs(d.n_chars - med.med) AS dev, med.med
         |  FROM d JOIN med USING (source)),
         |mad AS ${medCte("(SELECT source, dev AS v FROM dv)", "mad")},
         |j AS (SELECT dv.*, mad.mad,
         |        dv.dev > ${Sampling.MadK} * greatest(mad.mad, 1) AS is_out
         |      FROM dv JOIN mad USING (source))
         |SELECT source, COUNT(*) AS n,
         |  CAST(MAX(med) AS BIGINT) AS median_nc,
         |  CAST(MAX(mad) AS BIGINT) AS mad_nc,
         |  CAST(SUM(CASE WHEN is_out THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
         |  CAST(COALESCE(MIN(CASE WHEN is_out THEN doc_id END), -1) AS BIGINT) AS min_out_doc,
         |  CAST(COALESCE(SUM(CASE WHEN is_out THEN doc_id END), 0) AS BIGINT) AS sum_out_doc
         |FROM j GROUP BY source ORDER BY source""".stripMargin
    },
    "stats_exact_median" ->
      """WITH e AS (SELECT event_type,
        |  CAST(FLOOR((value)*100) AS BIGINT) AS v FROM events),
        |h AS (SELECT event_type, v, COUNT(*) AS c FROM e GROUP BY 1, 2),
        |w AS (SELECT *,
        |  SUM(c) OVER (PARTITION BY event_type ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  SUM(c) OVER (PARTITION BY event_type) AS n FROM h),
        |m1 AS (SELECT event_type, MIN(v) AS v1, CAST(MAX(n) AS BIGINT) AS n
        |       FROM w WHERE cum >= (n + 1) // 2 GROUP BY 1),
        |m2 AS (SELECT event_type, MIN(v) AS v2
        |       FROM w WHERE cum >= (n + 2) // 2 GROUP BY 1)
        |SELECT m1.event_type, m1.n, v1, v2, (v1 + v2) // 2 AS median_c
        |FROM m1 JOIN m2 USING (event_type) ORDER BY event_type""".stripMargin,
    "sample_stratified" ->
      s"""WITH h AS (
         |  SELECT doc_id, source,
         |    CAST(${md5Int("source || ':' || CAST(doc_id AS VARCHAR)")} AS BIGINT) AS samp_hash
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source, samp_hash,
         |    CAST(row_number() OVER (PARTITION BY source ORDER BY samp_hash, doc_id) AS BIGINT) AS rk
         |  FROM h)
         |SELECT doc_id, source, samp_hash, rk FROM r
         |WHERE rk <= ${Sampling.StratumK} ORDER BY source, rk""".stripMargin,
    "sample_diverse" ->
      s"""WITH $bucketedDynCte,
         |h AS (SELECT vec_id, CAST(label AS BIGINT) AS label, bucket,
         |        ${md5Int("('dv:' || CAST(vec_id AS VARCHAR))")} AS samp_hash
         |      FROM b),
         |r AS (SELECT *, CAST(COUNT(*) OVER (PARTITION BY bucket) AS BIGINT) AS n_members,
         |        row_number() OVER (PARTITION BY bucket ORDER BY samp_hash, vec_id) AS rk
         |      FROM h)
         |SELECT bucket, vec_id AS rep_id, label, n_members
         |FROM r WHERE rk = 1 ORDER BY bucket""".stripMargin,
    "agg_hll_distinct" ->
      s"""WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
         |hh AS (SELECT event_type, user_id,
         |         ${md5Int("CAST(user_id AS VARCHAR)")} AS h FROM du),
         |vv AS (SELECT event_type, user_id, h % ${Sampling.HllM} AS bucket,
         |         h // ${Sampling.HllM} AS v FROM hh),
         |rr AS (SELECT event_type, user_id, bucket,
         |         CASE WHEN v = 0 THEN CAST(27 AS BIGINT)
         |              ELSE CAST(log2(v & (-v)) AS BIGINT) + 1 END AS rho
         |       FROM vv),
         |regs AS (SELECT event_type, bucket, MAX(rho) AS m_rho
         |         FROM rr GROUP BY 1, 2),
         |ex AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
         |       FROM du GROUP BY 1),
         |agg AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m_used,
         |    CAST(SUM((bucket + 1) * m_rho) AS BIGINT) AS rho_chk,
         |    SUM(power(2.0, -CAST(m_rho AS DOUBLE))) AS sum_inv
         |  FROM regs GROUP BY 1),
         |est AS (
         |  SELECT event_type, m_used, rho_chk,
         |    ${0.709 * Sampling.HllM * Sampling.HllM} /
         |      (sum_inv + (${Sampling.HllM} - m_used)) AS raw
         |  FROM agg)
         |SELECT est.event_type, m_used, rho_chk,
         |  CAST(FLOOR(1000.0 * CASE
         |    WHEN raw <= ${2.5 * Sampling.HllM} AND m_used < ${Sampling.HllM}
         |    THEN ${Sampling.HllM}.0 * ln(${Sampling.HllM}.0 / CAST(${Sampling.HllM} - m_used AS DOUBLE))
         |    ELSE raw END) AS BIGINT) AS est_u,
         |  exact_distinct
         |FROM est JOIN ex ON est.event_type = ex.event_type
         |ORDER BY est.event_type""".stripMargin,
    // deterministic fractional upsampling: same hash draw both engines
    "sample_class_balance" ->
      s"""WITH v AS (SELECT vec_id, label FROM embeddings),
         |ct AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1),
         |mx AS (SELECT MAX(n) AS max_n FROM ct),
         |w AS (SELECT v.vec_id, v.label, ct.n,
         |        (1000000 * mx.max_n) // ct.n AS weight_ppm
         |      FROM v JOIN ct USING (label), mx),
         |r AS (SELECT label, n, weight_ppm,
         |        weight_ppm // 1000000 +
         |        (CASE WHEN ${md5Int("('bal:' || CAST(vec_id AS VARCHAR))")}
         |           % 1000000 < weight_ppm % 1000000 THEN 1 ELSE 0 END) AS reps
         |      FROM w)
         |SELECT label, CAST(MAX(n) AS BIGINT) AS n,
         |  CAST(MAX(weight_ppm) AS BIGINT) AS weight_ppm,
         |  CAST(SUM(reps) AS BIGINT) AS n_upsampled
         |FROM r GROUP BY label ORDER BY label""".stripMargin,
    // exact-rational Simpson concentration: HUGEINT products on the
    // DuckDB side mirror Spark's DECIMAL(38,0) chain
    "stats_diversity" ->
      s"""WITH tk AS (
         |  SELECT source, unnest($toks) AS t FROM documents),
         |ct AS (SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
         |       FROM tk GROUP BY 1, 2),
         |ag AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |         CAST(COUNT(*) AS BIGINT) AS vocab,
         |         CAST(SUM(c * c) AS BIGINT) AS sum_c2,
         |         CAST(MAX(c) AS BIGINT) AS max_c
         |       FROM ct GROUP BY 1)
         |SELECT source, n_tokens, vocab, sum_c2,
         |  CAST((1000000::HUGEINT * sum_c2) //
         |    (n_tokens::HUGEINT * n_tokens) AS BIGINT) AS conc_ppm,
         |  CAST((1000000::HUGEINT * max_c) // n_tokens AS BIGINT) AS top_ppm
         |FROM ag ORDER BY source""".stripMargin,
    // partial-then-merge must equal the one-pass sketch (register-wise
    // max is the union), and the row carries the equality flag
    "agg_hll_merge" ->
      s"""WITH du AS (SELECT DISTINCT event_type,
         |         (epoch_ns(ts) // 1000000000) // 86400 AS day, user_id FROM events),
         |hh AS (SELECT event_type, day, user_id,
         |         ${md5Int("CAST(user_id AS VARCHAR)")} AS h FROM du),
         |vv AS (SELECT event_type, day, h % ${Sampling.HllM} AS bucket,
         |         h // ${Sampling.HllM} AS v FROM hh),
         |rr AS (SELECT event_type, day, bucket,
         |         CASE WHEN v = 0 THEN CAST(27 AS BIGINT)
         |              ELSE CAST(log2(v & (-v)) AS BIGINT) + 1 END AS rho
         |       FROM vv),
         |dregs AS (SELECT event_type, day, bucket, MAX(rho) AS m_rho
         |          FROM rr GROUP BY 1, 2, 3),
         |dd AS (SELECT event_type, CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
         |       FROM dregs GROUP BY 1),
         |mregs AS (SELECT event_type, bucket, MAX(m_rho) AS m_rho
         |          FROM dregs GROUP BY 1, 2),
         |agg AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m_used,
         |    CAST(SUM((bucket + 1) * m_rho) AS BIGINT) AS rho_chk,
         |    SUM(power(2.0, -CAST(m_rho AS DOUBLE))) AS sum_inv
         |  FROM mregs GROUP BY 1),
         |est AS (
         |  SELECT event_type, m_used, rho_chk,
         |    CAST(FLOOR(1000.0 * CASE
         |      WHEN ${0.709 * Sampling.HllM * Sampling.HllM} /
         |          (sum_inv + (${Sampling.HllM} - m_used)) <= ${2.5 * Sampling.HllM}
         |        AND m_used < ${Sampling.HllM}
         |      THEN ${Sampling.HllM}.0 * ln(${Sampling.HllM}.0 / CAST(${Sampling.HllM} - m_used AS DOUBLE))
         |      ELSE ${0.709 * Sampling.HllM * Sampling.HllM} /
         |          (sum_inv + (${Sampling.HllM} - m_used)) END) AS BIGINT) AS est_u
         |  FROM agg),
         |dregs2 AS (SELECT event_type, bucket, MAX(rho) AS m_rho
         |           FROM rr GROUP BY 1, 2),
         |agg2 AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m_used,
         |    SUM(power(2.0, -CAST(m_rho AS DOUBLE))) AS sum_inv
         |  FROM dregs2 GROUP BY 1),
         |direct AS (
         |  SELECT event_type, CAST(FLOOR(1000.0 * CASE
         |      WHEN ${0.709 * Sampling.HllM * Sampling.HllM} /
         |          (sum_inv + (${Sampling.HllM} - m_used)) <= ${2.5 * Sampling.HllM}
         |        AND m_used < ${Sampling.HllM}
         |      THEN ${Sampling.HllM}.0 * ln(${Sampling.HllM}.0 / CAST(${Sampling.HllM} - m_used AS DOUBLE))
         |      ELSE ${0.709 * Sampling.HllM * Sampling.HllM} /
         |          (sum_inv + (${Sampling.HllM} - m_used)) END) AS BIGINT) AS direct_u
         |  FROM agg2)
         |SELECT est.event_type, n_days, m_used, rho_chk, est_u, direct_u,
         |  est_u = direct_u AS merge_exact
         |FROM est JOIN dd ON est.event_type = dd.event_type
         |JOIN direct ON est.event_type = direct.event_type
         |ORDER BY est.event_type""".stripMargin,
    "dedup_substring" -> substrOracle,
    // the hash-first variant is semantics-identical by construction
    // (equal strings hash equal; collisions are text-verified), so it
    // shares the ONE oracle — the equality is additionally
    // spec-asserted engine-side
    "dedup_substring_hashed" -> substrOracle,
    // DSIR importance weights: hashed-bigram add-1 models over the
    // target source vs the whole corpus, nano-prob means, integer
    // ratio — every division is // (div in Spark).
    "sample_dsir" -> {
      val B = Sampling.DsirBuckets
      val tgt = Sampling.DsirTargetSource
      val h = md5Int("('dsir:' || tok)")
      s"""WITH tl AS (SELECT doc_id, source, $toks AS t FROM documents),
         |tfq AS (SELECT doc_id, source, u.tok AS tok, CAST(COUNT(*) AS BIGINT) AS tf
         |        FROM tl, unnest(
         |          CASE WHEN len(t) >= 2 THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
         |          ELSE CAST([] AS VARCHAR[]) END) u(tok)
         |        GROUP BY 1, 2, 3),
         |tbh AS (SELECT tok, $h % $B AS bucket FROM (SELECT DISTINCT tok FROM tfq)),
         |feats AS (SELECT doc_id, source, bucket, CAST(SUM(tf) AS BIGINT) AS c
         |          FROM tfq JOIN tbh USING (tok) GROUP BY 1, 2, 3),
         |tm AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS ct FROM feats
         |       WHERE source = '$tgt' GROUP BY 1),
         |rm AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS cr FROM feats GROUP BY 1),
         |tot AS (SELECT (SELECT COALESCE(CAST(SUM(ct) AS BIGINT), 0) FROM tm) AS t_tot,
         |               (SELECT CAST(SUM(cr) AS BIGINT) FROM rm) AS r_tot),
         |model AS (SELECT rm.bucket,
         |            (1000000000 * (COALESCE(tm.ct, 0) + 1)) // (tot.t_tot + $B) AS pt_n,
         |            (1000000000 * (rm.cr + 1)) // (tot.r_tot + $B) AS pr_n
         |          FROM rm LEFT JOIN tm USING (bucket), tot),
         |sc AS (SELECT f.doc_id, f.source,
         |         CAST(SUM(f.c * m.pt_n) // SUM(f.c) AS BIGINT) AS lm_t_n,
         |         CAST(SUM(f.c * m.pr_n) // SUM(f.c) AS BIGINT) AS lm_r_n
         |       FROM feats f JOIN model m USING (bucket)
         |       WHERE f.source != '$tgt' GROUP BY 1, 2),
         |wt AS (SELECT *, CAST((1000000 * lm_t_n) // GREATEST(lm_r_n, 1) AS BIGINT)
         |         AS weight_u FROM sc)
         |SELECT CAST(row_number() OVER (ORDER BY weight_u DESC, doc_id) AS BIGINT) AS rank,
         |  doc_id, source, weight_u, lm_t_n, lm_r_n
         |FROM wt QUALIFY rank <= ${Sampling.DsirK} ORDER BY rank""".stripMargin
    },
    "sample_mixture" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(${md5Int("source || ':' || CAST(doc_id AS VARCHAR)")} AS BIGINT) AS samp_hash
         |  FROM documents),
         |wts AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src,
         |    CAST(FLOOR(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_u
         |  FROM d GROUP BY 1),
         |t AS (SELECT CAST(SUM(w_u) AS BIGINT) AS w_tot FROM wts),
         |q AS (SELECT source, n_src,
         |        CAST((${Sampling.MixtureTarget} * w_u) // w_tot AS BIGINT) AS quota
         |      FROM wts, t),
         |r AS (SELECT source, doc_id,
         |        CAST(row_number() OVER (PARTITION BY source
         |          ORDER BY samp_hash, doc_id) AS BIGINT) AS rk
         |      FROM d)
         |SELECT r.source, r.doc_id, r.rk, q.n_src, q.quota
         |FROM r JOIN q USING (source) WHERE rk <= quota
         |ORDER BY source, rk""".stripMargin,
    "stats_length_deciles" ->
      s"""WITH d AS (SELECT source, doc_id, CAST(length(text) AS BIGINT) AS len FROM documents),
         |r AS (SELECT source, doc_id, len,
         |        CAST(row_number() OVER (PARTITION BY source ORDER BY len, doc_id) AS BIGINT) AS rn
         |      FROM d),
         |n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY source),
         |t AS (SELECT n.source, CAST(dd.d AS BIGINT) AS decile, n.n,
         |        (CAST(dd.d AS BIGINT) * n.n + 9) // 10 AS target_rn
         |      FROM n, range(1, 10) dd(d))
         |SELECT t.source, t.decile, t.n, t.target_rn, r.len AS len_at
         |FROM t JOIN r ON t.source = r.source AND t.target_rn = r.rn
         |ORDER BY t.source, t.decile""".stripMargin,
    // The naive restatement of sample_budget's selection rule: one
    // global window cumsum over (quality desc, doc_id). The Spark side
    // never builds this order — it derives the same prefix through the
    // bounded score-bucket threshold — so agreement pins the
    // two-level decomposition, not just the arithmetic.
    "sample_budget" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tok,
         |    CAST(CASE WHEN len($toks) > 0
         |      THEN len(list_distinct($toks)) * 1000000 // len($toks)
         |      ELSE 0 END AS BIGINT) AS q_u
         |  FROM documents),
         |b AS (SELECT CAST(SUM(n_tok) // ${Sampling.BudgetDiv} AS BIGINT)
         |        AS budget FROM d),
         |r AS (SELECT *, SUM(n_tok) OVER (ORDER BY q_u DESC, doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM d)
         |SELECT doc_id, q_u, n_tok FROM r, b WHERE cum <= budget
         |ORDER BY doc_id""".stripMargin,
    "sample_priority" ->
      s"""SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         |CAST(${md5Int("('p:' || CAST(doc_id AS VARCHAR))")} AS BIGINT) AS h,
         |CAST(FLOOR(n_chars * 4294967296.0 /
         |  (${md5Int("('p:' || CAST(doc_id AS VARCHAR))")} + 1)) AS BIGINT) AS prio_u
         |FROM documents
         |ORDER BY prio_u DESC, doc_id LIMIT ${Sampling.PriorityK}""".stripMargin,
    "agg_cms_topk" -> {
      val w = Sampling.CmsWidth
      def h(j: Int) = s"${md5Int(s"(CAST(user_id AS VARCHAR) || '#' || '$j')")} % $w"
      val unions = (0 until Sampling.CmsDepth)
        .map(j => s"SELECT $j AS d, ${h(j)} AS idx FROM ev").mkString("\n  UNION ALL ")
      val joins = (0 until Sampling.CmsDepth)
        .map(j => s"JOIN cells c$j ON c$j.d = $j AND c$j.idx = ${h(j).replace("user_id", "ex.user_id")}")
        .mkString("\n")
      val leastOf = (0 until Sampling.CmsDepth).map(j => s"c$j.cnt").mkString("LEAST(", ", ", ")")
      s"""WITH ev AS (SELECT user_id FROM events),
         |cells AS (
         |  SELECT d, idx, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
         |  $unions) GROUP BY d, idx),
         |ex AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM ev GROUP BY 1),
         |j AS (
         |  SELECT ex.user_id, ex.exact_cnt, $leastOf AS est_cnt
         |  FROM ex
         |$joins)
         |SELECT user_id, exact_cnt, est_cnt FROM j
         |ORDER BY est_cnt DESC, user_id LIMIT ${Sampling.CmsK}""".stripMargin
    },
    "agg_kmv_distinct" ->
      s"""WITH uh AS (
         |  SELECT DISTINCT event_type,
         |    CAST(${md5Int("CAST(user_id AS VARCHAR)")} AS BIGINT) AS h
         |  FROM events),
         |r AS (
         |  SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
         |  FROM uh),
         |k AS (
         |  SELECT event_type, CAST(MAX(h) AS BIGINT) AS kth_hash,
         |    CAST(COUNT(*) AS BIGINT) AS k_used
         |  FROM r WHERE rk <= ${Sampling.KmvK} GROUP BY event_type),
         |nh AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hash_distinct
         |       FROM uh GROUP BY event_type),
         |ex AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
         |       FROM events GROUP BY event_type)
         |SELECT k.event_type, k.k_used, k.kth_hash, nh.n_hash_distinct, ex.exact_users,
         |  CAST(CASE WHEN k.k_used < ${Sampling.KmvK} THEN nh.n_hash_distinct
         |       ELSE (${Sampling.KmvK - 1} * 4294967296) // GREATEST(k.kth_hash, 1)
         |       END AS BIGINT) AS est_distinct
         |FROM k JOIN nh USING (event_type) JOIN ex USING (event_type)
         |ORDER BY event_type""".stripMargin,
    "embed_quantize" ->
      s"""WITH x AS (
         |  SELECT vec_id, CAST(i AS BIGINT) AS pos, CAST(embedding[i] AS DOUBLE) AS xd
         |  FROM embeddings, range(1, 65) r(i)),
         |a AS (SELECT vec_id, MAX(abs(xd)) AS amax FROM x GROUP BY vec_id),
         |q AS (
         |  SELECT x.vec_id, x.pos, x.xd, a.amax,
         |    CASE WHEN a.amax = 0 THEN CAST(0 AS BIGINT)
         |         ELSE CAST(FLOOR(x.xd * CAST(127.0 AS DOUBLE) / a.amax
         |                         + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS q
         |  FROM x JOIN a ON x.vec_id = a.vec_id),
         |e AS (
         |  SELECT vec_id, pos, amax, q,
         |    xd - (CAST(q AS DOUBLE) * amax) / CAST(127.0 AS DOUBLE) AS e
         |  FROM q)
         |SELECT vec_id,
         |  CAST(MAX(CAST(FLOOR(amax * CAST(1000000.0 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS amax_u,
         |  CAST(SUM(q) AS BIGINT) AS qsum,
         |  CAST(SUM(q * q) AS BIGINT) AS qdot,
         |  CAST(SUM((q + 127) * pos) AS BIGINT) AS qchk,
         |  CAST(SUM(CAST(FLOOR(e * e * CAST(1e12 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS err_u
         |FROM e GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "text_line_dedup" -> {
      val k = TextAnalysis.SegTokens
      s"""WITH d AS (SELECT doc_id, $toks AS t FROM documents),
         |sg AS (
         |  SELECT doc_id, list_distinct(list_filter(
         |    [array_to_string(t[(i*$k+1):(i*$k+$k)], ' ')
         |     for i in range(0, CAST(len(t) // $k AS INT))],
         |    x -> length(x) >= ${TextAnalysis.MinSegChars})) AS segs
         |  FROM d),
         |e AS (SELECT doc_id, unnest(segs) AS seg FROM sg),
         |c AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_docs FROM e GROUP BY seg),
         |s AS (
         |  SELECT e.doc_id,
         |    CAST(SUM(CAST(c.n_docs >= 2 AS BIGINT)) AS BIGINT) AS n_shared
         |  FROM e JOIN c USING (seg) GROUP BY e.doc_id)
         |SELECT sg.doc_id, CAST(len(sg.segs) AS BIGINT) AS n_segs,
         |  COALESCE(s.n_shared, 0) AS n_shared,
         |  CAST(CASE WHEN len(sg.segs) > 0
         |       THEN COALESCE(s.n_shared, 0) * 1000 // len(sg.segs) ELSE 0 END AS BIGINT) AS shared_milli
         |FROM sg LEFT JOIN s ON sg.doc_id = s.doc_id
         |ORDER BY sg.doc_id""".stripMargin
    },
    "text_bpe" ->
      s"""WITH $bpeTrainCtes
         |${(1 to TextAnalysis.BpeRounds).map { r =>
             s"SELECT CAST($r AS BIGINT) AS merge_rank, a, b, merged, pair_cnt FROM b$r"
           }.mkString("\nUNION ALL ")}
         |ORDER BY merge_rank""".stripMargin,
    "text_bpe_encode" -> {
      // dictionary encode: distinct corpus words through the learned
      // merges in rank order (1-row CTE per merge), then per-doc
      // integer stats via the word rejoin
      val encCtes = (1 to TextAnalysis.BpeRounds).map { r =>
        s"""e$r AS (SELECT word,
           |          replace(seq, ' ' || b$r.a || ' ' || b$r.b || ' ',
           |                  ' ' || b$r.merged || ' ') AS seq
           |        FROM e${r - 1}, b$r)""".stripMargin
      }.mkString(",\n")
      val R = TextAnalysis.BpeRounds
      s"""WITH $bpeTrainCtes,
         |d AS (SELECT doc_id, unnest($toks) AS word FROM documents),
         |dw AS (SELECT DISTINCT word FROM d),
         |e0 AS (SELECT word,
         |  ' ' || array_to_string([word[i] for i in range(1, len(word) + 1)], ' ') || ' ' AS seq
         |  FROM dw),
         |$encCtes,
         |st AS (SELECT word, string_split(trim(seq), ' ') AS subs FROM e$R),
         |ws AS (SELECT word, CAST(len(subs) AS BIGINT) AS n_subs,
         |         CAST(list_reduce(list_prepend(0, [len(s) * len(s) for s in subs]),
         |           (acc, x) -> acc + x) AS BIGINT) AS sublen2
         |       FROM st),
         |agg AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |    CAST(SUM(n_subs) AS BIGINT) AS n_subwords,
         |    CAST(SUM(sublen2) AS BIGINT) AS sum_sublen2
         |  FROM d JOIN ws USING (word) GROUP BY 1)
         |SELECT doc_id, COALESCE(n_words, 0) AS n_words,
         |  COALESCE(n_subwords, 0) AS n_subwords,
         |  COALESCE(sum_sublen2, 0) AS sum_sublen2
         |FROM documents LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    "text_vocab" ->
      s"""WITH tk AS (SELECT unnest($toks) AS tok FROM documents),
         |vc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM tk GROUP BY tok),
         |rk AS (SELECT tok, cnt,
         |         CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS vocab_id
         |       FROM vc)
         |SELECT vocab_id, tok, cnt FROM rk
         |WHERE vocab_id <= ${TextAnalysis.VocabN} ORDER BY vocab_id""".stripMargin,
    "text_encode" ->
      s"""WITH tk AS (SELECT unnest($toks) AS tok FROM documents),
         |vc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM tk GROUP BY tok),
         |rk AS (SELECT tok, cnt,
         |         CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS vocab_id
         |       FROM vc),
         |v AS (SELECT tok, vocab_id FROM rk WHERE vocab_id <= ${TextAnalysis.VocabN}),
         |d AS (SELECT doc_id, $toks AS t FROM documents),
         |e AS (
         |  SELECT doc_id,
         |    unnest([CAST(i AS BIGINT) for i in range(1, len(t) + 1)]) AS pos,
         |    unnest(t) AS tok
         |  FROM d),
         |m AS (
         |  SELECT e.doc_id, e.pos, COALESCE(v.vocab_id, 0) AS vid
         |  FROM e LEFT JOIN v ON e.tok = v.tok),
         |s AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |    CAST(SUM(CAST(vid = 0 AS BIGINT)) AS BIGINT) AS n_oov,
         |    CAST(SUM(pos * vid) AS BIGINT) AS enc_chk
         |  FROM m GROUP BY doc_id)
         |SELECT documents.doc_id,
         |  COALESCE(s.n_tokens, 0) AS n_tokens,
         |  COALESCE(s.n_oov, 0) AS n_oov,
         |  COALESCE(s.enc_chk, 0) AS enc_chk
         |FROM documents LEFT JOIN s ON documents.doc_id = s.doc_id
         |ORDER BY documents.doc_id""".stripMargin,
    "text_rep_ngram" ->
      s"""WITH d AS (SELECT doc_id, $toks AS t FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    CASE WHEN len(t) >= 2
         |      THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
         |      ELSE CAST([] AS VARCHAR[]) END AS g2,
         |    CASE WHEN len(t) >= 3
         |      THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t)-1)]
         |      ELSE CAST([] AS VARCHAR[]) END AS g3
         |  FROM d),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(g2) AS BIGINT) AS n_2grams,
         |    CAST(len(g2) - len(list_distinct(g2)) AS BIGINT) AS dup_2grams,
         |    CAST(len(g3) AS BIGINT) AS n_3grams,
         |    CAST(len(g3) - len(list_distinct(g3)) AS BIGINT) AS dup_3grams
         |  FROM g)
         |SELECT doc_id, n_2grams, dup_2grams, n_3grams, dup_3grams,
         |  CAST(CASE WHEN n_2grams > 0 THEN dup_2grams * 1000 // n_2grams ELSE 0 END AS BIGINT) AS rep2_milli,
         |  CAST(CASE WHEN n_3grams > 0 THEN dup_3grams * 1000 // n_3grams ELSE 0 END AS BIGINT) AS rep3_milli
         |FROM m ORDER BY doc_id""".stripMargin,
    "text_pmi" -> {
      val g2 = """CASE WHEN len(t) >= 2 THEN
                 |  [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
                 |ELSE CAST([] AS VARCHAR[]) END""".stripMargin
      s"""WITH d AS (SELECT doc_id, $toks AS t FROM documents),
         |uni AS (SELECT unnest(t) AS tok FROM d),
         |uc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c1 FROM uni GROUP BY 1),
         |pg AS (SELECT unnest($g2) AS pair FROM d),
         |pc AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS c_xy FROM pg GROUP BY 1
         |       HAVING COUNT(*) >= ${TextAnalysis.PmiMinCount}),
         |tot AS (SELECT (SELECT CAST(SUM(c1) AS BIGINT) FROM uc) AS n1,
         |               (SELECT CAST(SUM(c_xy) AS BIGINT) FROM pc) AS n2),
         |s AS (
         |  SELECT pair, c_xy, cx.c1 AS c_x, cy.c1 AS c_y,
         |    CAST(FLOOR(1000000.0 * c_xy * n1 * n1 / n2 / cx.c1 / cy.c1) AS BIGINT) AS pmi_u
         |  FROM pc JOIN uc cx ON split_part(pair, ' ', 1) = cx.tok
         |          JOIN uc cy ON split_part(pair, ' ', 2) = cy.tok, tot)
         |SELECT pair, c_xy, c_x, c_y, pmi_u FROM s
         |ORDER BY pmi_u DESC, pair LIMIT ${TextAnalysis.PmiK}""".stripMargin
    },
    "text_hash_embed" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toks) AS tok FROM documents),
         |f AS (SELECT doc_id,
         |        ${md5Int("tok")} % ${TextAnalysis.HashDims} AS dim,
         |        CASE WHEN ${md5Int("('s:' || tok)")} % 2 = 0 THEN 1 ELSE -1 END AS sign
         |      FROM tk)
         |SELECT doc_id, CAST(dim AS BIGINT) AS dim, CAST(SUM(sign) AS BIGINT) AS wt
         |FROM f GROUP BY doc_id, dim
         |HAVING SUM(sign) <> 0
         |ORDER BY doc_id, dim""".stripMargin,
    "text_vocab_growth" ->
      s"""WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
         |tk AS (
         |  SELECT doc_id, unnest($toks) AS tok,
         |    (doc_id * 10) // (mx.mx + 1) AS dec
         |  FROM documents, mx),
         |occ AS (SELECT dec, COUNT(*) AS n_occ FROM tk GROUP BY dec),
         |fst AS (
         |  SELECT first_dec AS dec, COUNT(*) AS n_new FROM
         |    (SELECT tok, MIN(dec) AS first_dec FROM tk GROUP BY tok)
         |  GROUP BY first_dec),
         |j AS (
         |  SELECT occ.dec, occ.n_occ, COALESCE(fst.n_new, 0) AS n_new
         |  FROM occ LEFT JOIN fst ON occ.dec = fst.dec)
         |SELECT CAST(dec AS BIGINT) AS dec,
         |  CAST(SUM(n_occ) OVER w AS BIGINT) AS cum_tokens,
         |  CAST(SUM(n_new) OVER w AS BIGINT) AS cum_vocab,
         |  CAST(n_new AS BIGINT) AS n_new
         |FROM j WINDOW w AS (ORDER BY dec
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY dec""".stripMargin,
    "text_nb_classify" -> {
      val h = md5Int("('nb:' || CAST(doc_id AS VARCHAR))")
      s"""WITH d AS (
         |  SELECT doc_id, source, $h % 100 < ${TextAnalysis.NbTrainPct} AS is_train,
         |    $toks AS t
         |  FROM documents),
         |tk AS (SELECT doc_id, source, is_train, unnest(t) AS tok FROM d),
         |voc AS (
         |  SELECT tok FROM (
         |    SELECT tok, COUNT(*) AS cnt FROM tk WHERE is_train
         |    GROUP BY tok ORDER BY cnt DESC, tok LIMIT ${TextAnalysis.NbVocabN})),
         |cls AS (SELECT DISTINCT source AS cls FROM tk WHERE is_train),
         |cc AS (
         |  SELECT source AS cls, tok, COUNT(*) AS cnt
         |  FROM tk JOIN voc USING (tok) WHERE is_train GROUP BY 1, 2),
         |tot AS (SELECT cls, CAST(SUM(cnt) AS BIGINT) AS tot FROM cc GROUP BY cls),
         |model AS (
         |  SELECT g.tok, g.cls,
         |    CAST((1000000 * (COALESCE(cc.cnt, 0) + 1))
         |      // (t.tot + ${TextAnalysis.NbVocabN}) AS BIGINT) AS p_u
         |  FROM (SELECT v.tok, c.cls FROM voc v CROSS JOIN cls c) g
         |  LEFT JOIN cc ON g.tok = cc.tok AND g.cls = cc.cls
         |  JOIN tot t ON g.cls = t.cls),
         |sc AS (
         |  SELECT tk.doc_id, m.cls, CAST(SUM(m.p_u) AS BIGINT) AS score_u,
         |    COUNT(*) AS n_hits
         |  FROM tk JOIN model m USING (tok) WHERE NOT is_train GROUP BY 1, 2),
         |best AS (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score_u DESC, cls) AS rn FROM sc)
         |SELECT h.doc_id, h.source, COALESCE(b.cls, '') AS pred,
         |  CAST(COALESCE(b.score_u, 0) AS BIGINT) AS score_u,
         |  CAST(COALESCE(b.n_hits, 0) AS BIGINT) AS n_hits
         |FROM (SELECT doc_id, source FROM d WHERE NOT is_train) h
         |LEFT JOIN best b ON h.doc_id = b.doc_id AND b.rn = 1
         |ORDER BY h.doc_id""".stripMargin
    },
    "text_charlm" ->
      s"""WITH $charLmCtes
        |SELECT doc_id, n_bigrams, lm_u FROM lmdoc
        |ORDER BY doc_id""".stripMargin,
    // CCNet head/middle/tail over the SAME scoring chain: per-source
    // rank, pure-integer boundaries, doc_id tiebreak
    "text_ccnet_buckets" ->
      s"""WITH $charLmCtes,
        |rk AS (SELECT doc_id, source, lm_u,
        |         CAST(row_number() OVER (PARTITION BY source
        |           ORDER BY lm_u DESC, doc_id) AS BIGINT) AS rk,
        |         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |       FROM lmdoc),
        |bk AS (SELECT source, doc_id, lm_u,
        |         CASE WHEN rk * 10 <= n THEN 'head'
        |              WHEN rk * 2 <= n THEN 'middle'
        |              ELSE 'tail' END AS bucket
        |       FROM rk)
        |SELECT source, bucket, COUNT(*) AS n_docs,
        |  CAST(MIN(lm_u) AS BIGINT) AS min_lm_u,
        |  CAST(MAX(lm_u) AS BIGINT) AS max_lm_u,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_chk
        |FROM bk GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin,
    "text_tfidf" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toks) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM tk GROUP BY 1, 2),
         |nt AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens FROM tf GROUP BY 1),
         |dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |s AS (
         |  SELECT tf.doc_id, tf.tok, tf.tf, dfq.df, nt.n_tokens,
         |    CAST(FLOOR(1000000.0 * tf.tf * nn.n / dfq.df / nt.n_tokens) AS BIGINT) AS score_u
         |  FROM tf JOIN dfq USING (tok) JOIN nt USING (doc_id), nn),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |        ORDER BY score_u DESC, tok) AS BIGINT) AS rk FROM s)
         |SELECT doc_id, rk, tok, tf, df, n_tokens, score_u
         |FROM r WHERE rk <= ${TextAnalysis.TfidfK} ORDER BY doc_id, rk""".stripMargin,
    "text_cdc_chunks" -> {
      val w = TextAnalysis.CdcW
      val m = TextAnalysis.CdcMod
      s"""WITH bs AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
         |            FROM documents WHERE length(text) >= 1),
         |bn AS (
         |  SELECT doc_id, CAST(k + $w - 1 AS BIGINT) AS e
         |  FROM (SELECT doc_id, text, n,
         |          unnest(range(1, GREATEST(n - $w + 2, 1))) AS k FROM bs)
         |  WHERE ${md5Int(s"substr(text, CAST(k AS INT), $w)")} % $m = 0
         |    AND k + $w - 1 < n),
         |en AS (SELECT doc_id, e FROM bn UNION ALL SELECT doc_id, n AS e FROM bs),
         |ch AS (
         |  SELECT doc_id, CAST(row_number() OVER win AS BIGINT) AS chunk_idx,
         |    COALESCE(LAG(e) OVER win + 1, 1) AS s, e
         |  FROM en WINDOW win AS (PARTITION BY doc_id ORDER BY e)),
         |cc AS (
         |  SELECT ch.doc_id, ch.chunk_idx, CAST(ch.s AS BIGINT) AS chunk_start,
         |    CAST(ch.e - ch.s + 1 AS BIGINT) AS chunk_len,
         |    md5(substr(bs.text, CAST(ch.s AS INT), CAST(ch.e - ch.s + 1 AS INT))) AS chunk_md5
         |  FROM ch JOIN bs USING (doc_id)),
         |shc AS (SELECT chunk_md5, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS shared
         |        FROM cc GROUP BY 1)
         |SELECT cc.doc_id, cc.chunk_idx, cc.chunk_start, cc.chunk_len,
         |  cc.chunk_md5, shc.shared
         |FROM cc JOIN shc USING (chunk_md5)
         |ORDER BY doc_id, chunk_idx""".stripMargin
    },
    "text_chunk" -> {
      val W = TextAnalysis.ChunkW
      val S = TextAnalysis.ChunkS
      s"""WITH d AS (SELECT doc_id, $toks AS t FROM documents),
         |e AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM d WHERE len(t) > 0),
         |c AS (
         |  SELECT doc_id, CAST(u.s // $S AS BIGINT) AS chunk_id,
         |         CAST(u.s AS BIGINT) AS start_tok,
         |         t[u.s + 1 : least(u.s + $W, n)] AS ct
         |  FROM e, unnest([$S * g for g in generate_series(0, (n - 1) // $S)]) u(s))
         |SELECT doc_id, chunk_id, start_tok, CAST(len(ct) AS BIGINT) AS n_tok,
         |  ct[1] AS head_tok,
         |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    [CAST(i AS BIGINT) * ${md5Int("ct[i]")} for i in generate_series(1, len(ct))]),
         |    (a, v) -> a + v) AS BIGINT) AS cksum
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin
    },
    "text_pack" -> {
      val w = TextAnalysis.WinTokens
      s"""WITH d AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens FROM documents),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
         |  FROM d)
         |SELECT doc_id, n_tokens, start_tok,
         |  CAST(start_tok // $w AS BIGINT) AS first_win,
         |  CAST(CASE WHEN n_tokens > 0 THEN (start_tok + n_tokens - 1) // $w
         |       ELSE start_tok // $w END AS BIGINT) AS last_win,
         |  CAST(CASE WHEN n_tokens > 0
         |       THEN (start_tok + n_tokens - 1) // $w - start_tok // $w + 1
         |       ELSE 0 END AS BIGINT) AS n_wins
         |FROM c ORDER BY doc_id""".stripMargin
    },
    "text_tokens" ->
      s"""SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens,
         |CAST(len(list_distinct($toks)) AS BIGINT) AS n_distinct,
         |CAST(len(regexp_extract_all(text, '[^\\s]+')) AS BIGINT) AS n_ws_tokens,
         |CAST(length(text) AS BIGINT) AS len_chars,
         |CAST((length(text) + 3) // 4 AS BIGINT) AS bpe_est
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""WITH q AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
         |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS alpha,
         |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit,
         |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS punct,
         |    CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS upper,
         |    CAST(len(regexp_extract_all(text, ' ')) AS BIGINT) AS spaces,
         |    CAST(len(regexp_extract_all(lower(text), '${TextAnalysis.stopwordPat}')) AS BIGINT) AS stops,
         |    CAST(len($toks) AS BIGINT) AS n_tokens
         |  FROM documents),
         |r AS (
         |  SELECT *,
         |    CASE WHEN n > 0 THEN alpha / n ELSE CAST(0.0 AS DOUBLE) END AS alpha_ratio,
         |    CASE WHEN n > 0 THEN punct / n ELSE CAST(0.0 AS DOUBLE) END AS punct_ratio,
         |    CASE WHEN n > 0 THEN upper / n ELSE CAST(0.0 AS DOUBLE) END AS upper_ratio,
         |    CASE WHEN n_tokens > 0 THEN stops / n_tokens ELSE CAST(0.0 AS DOUBLE) END AS stop_ratio
         |  FROM q)
         |SELECT doc_id, n, alpha, digit, punct, upper, spaces, stops, n_tokens,
         |  alpha_ratio, punct_ratio, upper_ratio, stop_ratio,
         |  alpha_ratio * CAST(0.5 AS DOUBLE)
         |    + (CAST(1.0 AS DOUBLE) - punct_ratio) * CAST(0.2 AS DOUBLE)
         |    + (CAST(1.0 AS DOUBLE) - upper_ratio) * CAST(0.2 AS DOUBLE)
         |    + stop_ratio * CAST(0.1 AS DOUBLE) AS score
         |FROM r ORDER BY doc_id""".stripMargin,
    "text_langid" -> {
      val scores = TextAnalysis.markers.map { case (l, pat) =>
        s"CAST(len(regexp_extract_all(lower(text), '$pat')) AS BIGINT) AS s_$l"
      }.mkString(",\n")
      s"""WITH s AS (
         |  SELECT doc_id, $scores,
         |  CAST(len(regexp_extract_all(text, '${TextAnalysis.cjkPat}')) AS BIGINT) AS s_zh
         |  FROM documents)
         |SELECT doc_id, s_en, s_de, s_fr, s_es, s_zh,
         |  CASE WHEN s_zh > 0 THEN 'zh'
         |       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |       WHEN s_fr >= s_es THEN 'fr'
         |       ELSE 'es' END AS guess
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "text_fingerprint" ->
      s"""WITH d AS (SELECT doc_id, $toks AS t FROM documents)
         |SELECT doc_id, md5(array_to_string(t, ' ')) AS fp_md5,
         |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |        [${md5Int("s")} for s in t]),
         |      (h, x) -> (h * 31 + x) % 2147483647) AS BIGINT) AS fp_roll,
         |  CAST(len(t) AS BIGINT) AS n_tokens
         |FROM d ORDER BY doc_id""".stripMargin,
    "text_ngrams" ->
      s"""WITH d AS (SELECT doc_id, $toks AS t FROM documents),
         |g AS (SELECT unnest(CASE WHEN len(t) >= 3
         |        THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t)-1)]
         |        ELSE CAST([] AS VARCHAR[]) END) AS ngram FROM d)
         |SELECT ngram, COUNT(*) AS cnt FROM g GROUP BY ngram
         |ORDER BY cnt DESC, ngram LIMIT 50""".stripMargin,
    // delta maintenance must land on the SAME table as the one-shot
    // merge and the CDC stream — the third formulation on one SQL
    "pipeline_ivm" -> graft.sources.TableMerge.mergeOracle,
    // the join view recomputed from the post-merge table: the delta
    // path must land pointwise on this (empty groups dropped)
    "pipeline_lineage" -> Pipeline.lineageOracle,
    "pipeline_ivm_join" -> {
      val ys = graft.sources.TableMerge.MergeYears.mkString(", ")
      s"""WITH base AS (
         |  SELECT o_orderkey AS k, o_custkey AS ck,
         |    CAST(FLOOR(o_totalprice*100) AS BIGINT) AS total_c,
         |    CAST(year(o_orderdate) AS BIGINT) AS p
         |  FROM orders),
         |merged AS (
         |  SELECT k, ck,
         |    total_c + CASE WHEN p IN ($ys) AND k % 97 = 0 AND k % 101 <> 0
         |      THEN 100 ELSE 0 END AS total_c
         |  FROM base WHERE NOT (p IN ($ys) AND k % 101 = 0)
         |  UNION ALL
         |  SELECT k + ${graft.sources.TableMerge.InsOffset}, ck, total_c + 50
         |  FROM base WHERE p IN ($ys) AND k % 103 = 0)
         |SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
         |  COUNT(*) AS n_orders,
         |  CAST(SUM(m.total_c) AS BIGINT) AS sum_total_c
         |FROM merged m JOIN customer c ON m.ck = c.c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // the splice (published output for unchanged days + pruned
    // recompute for changed days) must equal the closed-form full
    // recompute, changed-day flags included
    "pipeline_backfill" ->
      s"""WITH e AS (
         |  SELECT event_id, event_type,
         |    (epoch_ns(ts) // 1000000000) // 86400 AS day,
         |    CAST(FLOOR(value*100) AS BIGINT) AS value_c
         |  FROM events),
         |corr AS (
         |  SELECT event_id, event_type, day,
         |    value_c + CASE WHEN event_id % ${Pipeline.BackfillMod} = 0
         |      AND day % 7 = 3 THEN 7 ELSE 0 END AS value_c
         |  FROM e),
         |cd AS (SELECT DISTINCT day FROM e
         |       WHERE event_id % ${Pipeline.BackfillMod} = 0 AND day % 7 = 3)
         |SELECT day, event_type, COUNT(*) AS n,
         |  CAST(SUM(value_c) AS BIGINT) AS sum_value_c,
         |  day IN (SELECT day FROM cd) AS recomputed
         |FROM corr GROUP BY day, event_type
         |ORDER BY day, event_type""".stripMargin,
    "pipeline_incr" ->
      s"""WITH $filterCtes,
         |$minhashSigCtes,
         |elig AS (SELECT doc_id FROM g WHERE n_fail = 0 AND doc_id % 97 <> 0),
         |bat AS (SELECT doc_id, CAST(n_fail = 0 AS BIGINT) AS keep_quality
         |        FROM g WHERE doc_id % 4 = 0 AND doc_id % 97 <> 0),
         |nbase AS (SELECT s.* FROM sig s JOIN elig USING (doc_id)),
         |nb AS (
         |  SELECT doc_id, 0 AS band_i, band0 AS band_v FROM nbase
         |  UNION ALL SELECT doc_id, 1, band1 FROM nbase
         |  UNION ALL SELECT doc_id, 2, band2 FROM nbase
         |  UNION ALL SELECT doc_id, 3, band3 FROM nbase),
         |pr AS (SELECT doc_id AS doc_new, band_i, band_v FROM nb WHERE doc_id % 4 = 0),
         |ix AS (SELECT doc_id AS doc_idx, doc_id % 4 = 0 AS idx_new, band_i, band_v FROM nb),
         |cd AS (
         |  SELECT DISTINCT doc_new, doc_idx
         |  FROM pr JOIN ix USING (band_i, band_v)
         |  WHERE (NOT idx_new OR doc_idx < doc_new) AND doc_idx <> doc_new),
         |tk AS (
         |  SELECT doc_id, list_distinct($toks) AS t,
         |    CAST(len(list_distinct($toks)) AS BIGINT) AS nt
         |  FROM documents),
         |vf AS (
         |  SELECT cd.doc_new, cd.doc_idx,
         |    CAST(len(list_intersect(ta.t, tb.t)) AS BIGINT) AS inter,
         |    ta.nt AS nt_a, tb.nt AS nt_b
         |  FROM cd JOIN tk ta ON cd.doc_new = ta.doc_id
         |          JOIN tk tb ON cd.doc_idx = tb.doc_id),
         |ag AS (
         |  SELECT doc_new, COUNT(*) AS nc,
         |    MIN(CASE WHEN inter * 2 >= nt_a + nt_b - inter THEN doc_idx END) AS dof
         |  FROM vf GROUP BY doc_new),
         |shx AS (SELECT doc_id, unnest($shingles) AS s FROM fd),
         |bs AS (SELECT DISTINCT s FROM shx WHERE doc_id % 97 = 0),
         |nh AS (
         |  SELECT shx.doc_id, CAST(COUNT(*) AS BIGINT) AS nh
         |  FROM shx JOIN bs USING (s)
         |  WHERE shx.doc_id % 4 = 0 AND shx.doc_id % 97 <> 0 GROUP BY 1),
         |fin AS (
         |  SELECT b.doc_id, b.keep_quality,
         |    CASE WHEN b.keep_quality = 0 THEN -1
         |         ELSE COALESCE(ag.nc, 0) END AS n_cands,
         |    CASE WHEN b.keep_quality = 0 THEN -1
         |         ELSE COALESCE(ag.dof, -1) END AS dup_of,
         |    CASE WHEN b.keep_quality = 0
         |           OR (b.keep_quality = 1 AND COALESCE(ag.dof, -1) <> -1) THEN -1
         |         ELSE COALESCE(nh.nh, 0) END AS n_hit
         |  FROM bat b LEFT JOIN ag ON b.doc_id = ag.doc_new
         |             LEFT JOIN nh ON b.doc_id = nh.doc_id)
         |SELECT doc_id, keep_quality,
         |  CAST(n_cands AS BIGINT) AS n_cands, CAST(dup_of AS BIGINT) AS dup_of,
         |  CAST(n_hit AS BIGINT) AS n_hit,
         |  CAST(keep_quality = 1 AND dup_of = -1 AND n_hit < 3 AS BIGINT) AS admitted,
         |  CASE WHEN keep_quality = 0 THEN 'quality'
         |       WHEN dup_of <> -1 THEN 'dup'
         |       WHEN n_hit >= 3 THEN 'contaminated'
         |       ELSE 'admitted' END AS stage
         |FROM fin ORDER BY doc_id""".stripMargin,
    "dedup_decontaminate" ->
      s"""WITH d AS (SELECT doc_id, $toks AS t FROM documents),
         |sh AS (SELECT doc_id, unnest($shingles) AS s FROM d),
         |bs AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0),
         |ns AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles FROM tr GROUP BY doc_id),
         |nh AS (SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
         |       FROM tr JOIN bs USING (s) GROUP BY tr.doc_id)
         |SELECT ns.doc_id, ns.n_shingles,
         |  CAST(COALESCE(nh.n_hit, 0) AS BIGINT) AS n_hit,
         |  CAST(COALESCE(nh.n_hit, 0) >= 3 AS BIGINT) AS contaminated
         |FROM ns LEFT JOIN nh ON ns.doc_id = nh.doc_id ORDER BY ns.doc_id""".stripMargin,
    "graph_pagerank" -> {
      val rounds = (1 to Graph.PrRounds).map { t =>
        s"""r$t AS (
           |  SELECT v.doc_id,
           |    CAST(${Graph.PrBaseU} + (${Graph.PrDampPct} * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r
           |  FROM documents v LEFT JOIN (
           |    SELECT e.dst AS doc_id, CAST(SUM(p.r // dg.deg) AS BIGINT) AS s
           |    FROM ed e JOIN r${t - 1} p ON e.src = p.doc_id
           |    JOIN dg ON e.src = dg.doc_id
           |    GROUP BY e.dst) s ON v.doc_id = s.doc_id)""".stripMargin
      }.mkString(",\n")
      s"""WITH $minhashSigCtes,
         |$bandCandCtes,
         |ed AS (SELECT doc_a AS src, doc_b AS dst FROM cand
         |       UNION ALL SELECT doc_b AS src, doc_a AS dst FROM cand),
         |dg AS (SELECT src AS doc_id, CAST(COUNT(*) AS BIGINT) AS deg FROM ed GROUP BY 1),
         |r0 AS (SELECT doc_id, CAST(${Graph.PrInitU} AS BIGINT) AS r FROM documents),
         |$rounds
         |SELECT v.doc_id, rr.r AS rank_u,
         |  CAST(COALESCE(dg.deg, 0) AS BIGINT) AS degree
         |FROM documents v JOIN r${Graph.PrRounds} rr ON v.doc_id = rr.doc_id
         |LEFT JOIN dg ON v.doc_id = dg.doc_id
         |ORDER BY v.doc_id""".stripMargin
    },
    // personalized PageRank: teleport mass returns to the seed set
    // only; same unrolled exact-integer recurrence as graph_pagerank
    "graph_ppr" -> {
      val rounds = (1 to Graph.PrRounds).map { t =>
        s"""r$t AS (
           |  SELECT v.doc_id, v.seed,
           |    CAST(v.seed * ${Graph.PrBaseU} +
           |      (${Graph.PrDampPct} * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r
           |  FROM r0 v LEFT JOIN (
           |    SELECT e.dst AS doc_id, CAST(SUM(p.r // dg.deg) AS BIGINT) AS s
           |    FROM ed e JOIN r${t - 1} p ON e.src = p.doc_id
           |    JOIN dg ON e.src = dg.doc_id
           |    GROUP BY e.dst) s ON v.doc_id = s.doc_id)""".stripMargin
      }.mkString(",\n")
      s"""WITH $minhashSigCtes,
         |$bandCandCtes,
         |ed AS (SELECT doc_a AS src, doc_b AS dst FROM cand
         |       UNION ALL SELECT doc_b AS src, doc_a AS dst FROM cand),
         |dg AS (SELECT src AS doc_id, CAST(COUNT(*) AS BIGINT) AS deg FROM ed GROUP BY 1),
         |sd AS (SELECT DISTINCT src AS doc_id FROM ed ORDER BY 1 LIMIT 3),
         |r0 AS (SELECT v.doc_id,
         |    CAST(CASE WHEN sd.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS seed,
         |    CAST(CASE WHEN sd.doc_id IS NOT NULL THEN ${Graph.PrInitU}
         |         ELSE 0 END AS BIGINT) AS r
         |  FROM documents v LEFT JOIN sd ON v.doc_id = sd.doc_id),
         |$rounds
         |SELECT doc_id, r AS ppr_u FROM r${Graph.PrRounds}
         |WHERE r > 0 ORDER BY doc_id""".stripMargin
    },
    "dedup_band_cap" ->
      s"""WITH $minhashSigCtes,
         |bands AS (
         |  SELECT doc_id, 0 AS band_i, band0 AS band_v FROM sig
         |  UNION ALL SELECT doc_id, 1, band1 FROM sig
         |  UNION ALL SELECT doc_id, 2, band2 FROM sig
         |  UNION ALL SELECT doc_id, 3, band3 FROM sig),
         |bst AS (SELECT band_i, band_v, COUNT(*) AS bsz, MIN(doc_id) AS bmin
         |        FROM bands GROUP BY 1, 2),
         |bb AS (SELECT bands.doc_id, bands.band_i, bands.band_v, bst.bsz, bst.bmin
         |       FROM bands JOIN bst USING (band_i, band_v)),
         |pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 0 AS via_star
         |  FROM bb a JOIN bb b
         |    ON a.band_i = b.band_i AND a.band_v = b.band_v AND a.doc_id < b.doc_id
         |  WHERE a.bsz <= ${Dedup.BandCap}
         |  UNION ALL
         |  SELECT bmin AS doc_a, doc_id AS doc_b, 1 AS via_star FROM bb
         |  WHERE bsz > ${Dedup.BandCap} AND doc_id <> bmin)
         |SELECT doc_a, doc_b, CAST(MIN(via_star) AS BIGINT) AS via_star
         |FROM pr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dedup_edit" ->
      s"""WITH $minhashSigCtes,
         |$bandCandCtes,
         |dp AS (SELECT doc_id, substr(text, 1, ${Dedup.EditPrefix}) AS pfx,
         |        CAST(length(text) AS BIGINT) AS len FROM documents)
         |SELECT c.doc_a, c.doc_b,
         |  CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS edit_pfx,
         |  a.len AS len_a, b.len AS len_b
         |FROM cand c JOIN dp a ON c.doc_a = a.doc_id JOIN dp b ON c.doc_b = b.doc_id
         |WHERE levenshtein(a.pfx, b.pfx) <= ${Dedup.EditMaxDist}
         |ORDER BY c.doc_a, c.doc_b""".stripMargin,
    "sample_coreset" -> {
      val rounds = (2 to Sampling.CoresetK).map { r =>
        val prev = (1 until r).map(i => s"SELECT cvec FROM c$i").mkString(" UNION ALL ")
        s"""m$r AS (
           |  SELECT e.vec_id,
           |    CAST(MIN(1000000 - ${cosU("e.embedding", "c.cvec")}) AS BIGINT) AS mind
           |  FROM embeddings e, ($prev) c GROUP BY e.vec_id),
           |p$r AS (SELECT MAX(mind * 1099511627776 - vec_id) AS p FROM m$r),
           |c$r AS (SELECT e.vec_id AS center_id, e.embedding AS cvec, m.mind AS radius
           |        FROM m$r m JOIN embeddings e ON m.vec_id = e.vec_id, p$r
           |        WHERE m.mind * 1099511627776 - m.vec_id = p$r.p)""".stripMargin
      }.mkString(",\n")
      val out = (2 to Sampling.CoresetK).map { r =>
        s"SELECT CAST($r AS BIGINT) AS round, center_id, CAST(radius AS BIGINT) AS radius_u FROM c$r"
      }.mkString("\nUNION ALL ")
      s"""WITH c1 AS (
         |  SELECT vec_id AS center_id, embedding AS cvec FROM embeddings
         |  QUALIFY row_number() OVER (
         |    ORDER BY ${md5Int("('cs:' || CAST(vec_id AS VARCHAR))")}, vec_id) = 1),
         |$rounds
         |SELECT CAST(1 AS BIGINT) AS round, center_id,
         |  CAST(2000000 AS BIGINT) AS radius_u FROM c1
         |UNION ALL $out
         |ORDER BY round""".stripMargin
    },
    "pipeline_validate" ->
      """WITH r1 AS (
        |  SELECT 'lineitem_orphan_orderkey' AS rule,
        |    CAST((SELECT COUNT(*) FROM lineitem l
        |          WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                            WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS violations,
        |    (SELECT COUNT(*) FROM lineitem) AS checked),
        |r2 AS (
        |  SELECT 'orders_orphan_custkey' AS rule,
        |    CAST((SELECT COUNT(*) FROM orders o
        |          WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                            WHERE c.c_custkey = o.o_custkey)) AS BIGINT) AS violations,
        |    (SELECT COUNT(*) FROM orders) AS checked),
        |r3 AS (
        |  SELECT 'lineitem_nonpositive_qty' AS rule,
        |    CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS violations,
        |    COUNT(*) AS checked FROM lineitem),
        |r4 AS (
        |  SELECT 'lineitem_nonpositive_price' AS rule,
        |    CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS violations,
        |    COUNT(*) AS checked FROM lineitem),
        |r5 AS (
        |  SELECT 'lineitem_discount_range' AS rule,
        |    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violations,
        |    COUNT(*) AS checked FROM lineitem),
        |r6 AS (
        |  SELECT 'orders_null_custkey' AS rule,
        |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
        |    COUNT(*) AS checked FROM orders)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
        |UNION ALL SELECT * FROM r4 UNION ALL SELECT * FROM r5 UNION ALL SELECT * FROM r6
        |ORDER BY rule""".stripMargin,
    "graph_triangles" ->
      s"""WITH $minhashSigCtes,
         |$bandCandCtes,
         |und AS (SELECT doc_a, doc_b FROM cand
         |        UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b FROM cand),
         |dg AS (SELECT doc_a AS v, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY 1),
         |ke AS (SELECT u.doc_a AS u, u.doc_b AS w
         |       FROM und u JOIN dg a ON u.doc_a = a.v JOIN dg b ON u.doc_b = b.v
         |       WHERE (a.deg, u.doc_a) < (b.deg, u.doc_b)),
         |wg AS (SELECT e1.u AS a, e1.w AS b, e2.w AS c
         |       FROM ke e1 JOIN ke e2 ON e1.u = e2.u AND e1.w < e2.w),
         |tr AS (SELECT wg.a, wg.b, wg.c FROM wg JOIN (
         |         SELECT u AS b, w AS c FROM ke
         |         UNION ALL SELECT w AS b, u AS c FROM ke) x
         |       ON wg.b = x.b AND wg.c = x.c),
         |pv AS (SELECT v AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
         |         SELECT a AS v FROM tr UNION ALL SELECT b AS v FROM tr
         |         UNION ALL SELECT c AS v FROM tr)
         |       GROUP BY 1)
         |SELECT d.doc_id, COALESCE(pv.n_triangles, 0) AS n_triangles
         |FROM documents d LEFT JOIN pv USING (doc_id) ORDER BY doc_id""".stripMargin,
    "graph_clustering_coeff" ->
      s"""WITH $minhashSigCtes,
         |$bandCandCtes,
         |und AS (SELECT doc_a, doc_b FROM cand
         |        UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b FROM cand),
         |dg AS (SELECT doc_a AS v, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY 1),
         |ke AS (SELECT u.doc_a AS u, u.doc_b AS w
         |       FROM und u JOIN dg a ON u.doc_a = a.v JOIN dg b ON u.doc_b = b.v
         |       WHERE (a.deg, u.doc_a) < (b.deg, u.doc_b)),
         |wg AS (SELECT e1.u AS a, e1.w AS b, e2.w AS c
         |       FROM ke e1 JOIN ke e2 ON e1.u = e2.u AND e1.w < e2.w),
         |tr AS (SELECT wg.a, wg.b, wg.c FROM wg JOIN (
         |         SELECT u AS b, w AS c FROM ke
         |         UNION ALL SELECT w AS b, u AS c FROM ke) x
         |       ON wg.b = x.b AND wg.c = x.c),
         |pv AS (SELECT v AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
         |         SELECT a AS v FROM tr UNION ALL SELECT b AS v FROM tr
         |         UNION ALL SELECT c AS v FROM tr)
         |       GROUP BY 1)
         |SELECT d.doc_id, COALESCE(pv.n_triangles, 0) AS tri,
         |  COALESCE(dg.deg, 0) AS deg,
         |  CAST(CASE WHEN COALESCE(dg.deg, 0) >= 2
         |    THEN (2000000 * COALESCE(pv.n_triangles, 0)) // (dg.deg * (dg.deg - 1))
         |    ELSE 0 END AS BIGINT) AS cc_u
         |FROM documents d LEFT JOIN pv USING (doc_id)
         |LEFT JOIN dg ON d.doc_id = dg.v ORDER BY doc_id""".stripMargin,
    "graph_bfs" -> {
      val rounds = (1 to Graph.BfsRounds).map { t =>
        s"""d$t AS (
           |  SELECT doc_id, CAST(MIN(dist) AS BIGINT) AS dist FROM (
           |    SELECT doc_id, dist FROM d${t - 1}
           |    UNION ALL
           |    SELECT e.dst AS doc_id, p.dist + 1 AS dist
           |    FROM ed e JOIN d${t - 1} p ON e.src = p.doc_id)
           |  GROUP BY doc_id)""".stripMargin
      }.mkString(",\n")
      s"""WITH $minhashSigCtes,
         |$bandCandCtes,
         |ed AS (SELECT doc_a AS src, doc_b AS dst FROM cand
         |       UNION ALL SELECT doc_b AS src, doc_a AS dst FROM cand),
         |d0 AS (SELECT doc_id, CAST(0 AS BIGINT) AS dist FROM documents
         |       WHERE doc_id % 97 = 0),
         |$rounds
         |SELECT v.doc_id, COALESCE(dd.dist, -1) AS dist
         |FROM documents v LEFT JOIN d${Graph.BfsRounds} dd ON v.doc_id = dd.doc_id
         |ORDER BY v.doc_id""".stripMargin
    },
    "graph_common_neighbors" ->
      s"""WITH $knnCtes,
         |ke AS (SELECT LEAST(vec_id, nbr_id) AS id_a, GREATEST(vec_id, nbr_id) AS id_b
         |       FROM r WHERE rank <= ${Similarity.KnnK} GROUP BY 1, 2),
         |und AS (SELECT id_a, id_b FROM ke
         |        UNION ALL SELECT id_b AS id_a, id_a AS id_b FROM ke),
         |dgc AS (SELECT id_a AS v, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY 1),
         |spc AS (SELECT u.id_a AS b, u.id_b AS spoke, dgc.deg
         |        FROM und u JOIN dgc ON u.id_a = dgc.v WHERE dgc.deg <= ${Graph.CnMidCap}),
         |wgc AS (SELECT s1.spoke AS id_a, s2.spoke AS id_b,
         |          CAST(${Graph.CnRaU} // s1.deg AS BIGINT) AS ra
         |        FROM spc s1 JOIN spc s2 ON s1.b = s2.b AND s1.spoke < s2.spoke)
         |SELECT wgc.id_a, wgc.id_b, CAST(COUNT(*) AS BIGINT) AS cn,
         |  CAST(SUM(ra) AS BIGINT) AS ra_u
         |FROM wgc ANTI JOIN und ON wgc.id_a = und.id_a AND wgc.id_b = und.id_b
         |GROUP BY wgc.id_a, wgc.id_b ORDER BY id_a, id_b""".stripMargin,
    "graph_jaccard_links" ->
      s"""WITH $knnCtes,
         |ke AS (SELECT LEAST(vec_id, nbr_id) AS id_a, GREATEST(vec_id, nbr_id) AS id_b
         |       FROM r WHERE rank <= ${Similarity.KnnK} GROUP BY 1, 2),
         |und AS (SELECT id_a, id_b FROM ke
         |        UNION ALL SELECT id_b AS id_a, id_a AS id_b FROM ke),
         |dgc AS (SELECT id_a AS v, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY 1),
         |spc AS (SELECT u.id_a AS b, u.id_b AS spoke
         |        FROM und u JOIN dgc ON u.id_a = dgc.v WHERE dgc.deg <= ${Graph.CnMidCap}),
         |wgc AS (SELECT s1.spoke AS id_a, s2.spoke AS id_b
         |        FROM spc s1 JOIN spc s2 ON s1.b = s2.b AND s1.spoke < s2.spoke),
         |cnp AS (SELECT wgc.id_a, wgc.id_b, CAST(COUNT(*) AS BIGINT) AS cn
         |        FROM wgc ANTI JOIN und ON wgc.id_a = und.id_a AND wgc.id_b = und.id_b
         |        GROUP BY wgc.id_a, wgc.id_b)
         |SELECT c.id_a, c.id_b, c.cn, da.deg AS deg_a, db.deg AS deg_b,
         |  CAST((1000000 * c.cn) // (da.deg + db.deg - c.cn) AS BIGINT) AS j_u
         |FROM cnp c JOIN dgc da ON c.id_a = da.v JOIN dgc db ON c.id_b = db.v
         |ORDER BY j_u DESC, c.id_a, c.id_b LIMIT ${Graph.JlTopK}""".stripMargin,
    "graph_kcore" -> {
      val k = Graph.KcoreK
      val rounds = (1 to Graph.KcoreRounds).map { t =>
        s"""v$t AS (SELECT v FROM dg${t - 1} WHERE deg >= $k),
           |e$t AS (SELECT u.doc_a, u.doc_b FROM und u
           |        JOIN v$t a ON u.doc_a = a.v JOIN v$t b ON u.doc_b = b.v),
           |dg$t AS (SELECT doc_a AS v, CAST(COUNT(*) AS BIGINT) AS deg
           |         FROM e$t GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH $minhashSigCtes,
         |$bandCandCtes,
         |und AS (SELECT doc_a, doc_b FROM cand
         |        UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b FROM cand),
         |dg0 AS (SELECT doc_a AS v, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY 1),
         |$rounds,
         |core AS (SELECT v AS doc_id, deg FROM dg${Graph.KcoreRounds} WHERE deg >= $k)
         |SELECT d.doc_id,
         |  CAST(CASE WHEN core.deg IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_core,
         |  CAST(COALESCE(core.deg, 0) AS BIGINT) AS core_deg
         |FROM documents d LEFT JOIN core USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    // community quality over the SAME louvain chain: per-community
    // internal/cut/volume classification + integer-division conductance
    "graph_conductance" -> {
      val r = Graph.LvRounds
      s"""WITH $lvChainCtes,
         |ec AS (SELECT k.id_a, k.id_b, a1.comm AS ca, a2.comm AS cb
         |  FROM ke k JOIN a$r a1 ON k.id_a = a1.v
         |            JOIN a$r a2 ON k.id_b = a2.v),
         |intn AS (SELECT ca AS comm, CAST(COUNT(*) AS BIGINT) AS n_internal
         |  FROM ec WHERE ca = cb GROUP BY 1),
         |cut AS (SELECT comm, CAST(COUNT(*) AS BIGINT) AS n_cut FROM (
         |    SELECT ca AS comm FROM ec WHERE ca <> cb
         |    UNION ALL SELECT cb FROM ec WHERE ca <> cb) GROUP BY 1),
         |vol AS (SELECT a.comm, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |    CAST(SUM(COALESCE(dg.deg, 0)) AS BIGINT) AS vol
         |  FROM a$r a LEFT JOIN dg ON a.v = dg.v GROUP BY 1)
         |SELECT vol.comm, vol.n_nodes,
         |  COALESCE(intn.n_internal, 0) AS n_internal,
         |  COALESCE(cut.n_cut, 0) AS n_cut, vol.vol,
         |  CAST(CASE WHEN LEAST(vol.vol, 2 * mm.m - vol.vol) > 0
         |    THEN (1000000 * COALESCE(cut.n_cut, 0))
         |      // LEAST(vol.vol, 2 * mm.m - vol.vol)
         |    ELSE -1 END AS BIGINT) AS cond_u
         |FROM vol LEFT JOIN intn USING (comm) LEFT JOIN cut USING (comm), mm
         |ORDER BY comm""".stripMargin
    },
    // k-truss peel over the SAME ke frame: unrolled wedge-join rounds
    // with per-round edge counts; n_rounds = first no-removal round
    // (monotone peel → count equality is set equality) or the cap
    "graph_ktruss" -> {
      val (k, mx) = (Graph.TrussK, Graph.TrussMax)
      val rounds = (1 to mx).map { t =>
        s"""w$t AS (SELECT e.id_a, e.id_b, CAST(COUNT(*) AS BIGINT) AS sup
           |  FROM e${t - 1} e
           |  JOIN u${t - 1} x ON x.a = e.id_a
           |  JOIN u${t - 1} y ON y.a = e.id_b AND y.b = x.b
           |  GROUP BY 1, 2),
           |e$t AS MATERIALIZED (
           |  SELECT e.id_a, e.id_b FROM e${t - 1} e
           |  JOIN w$t w ON e.id_a = w.id_a AND e.id_b = w.id_b
           |  WHERE w.sup >= ${k - 2}),
           |u$t AS (SELECT id_a AS a, id_b AS b FROM e$t
           |        UNION ALL SELECT id_b, id_a FROM e$t),
           |c$t AS (SELECT CAST($t AS BIGINT) AS t,
           |  (SELECT COUNT(*) FROM e$t) AS n,
           |  (SELECT COUNT(*) FROM e${t - 1}) AS pn)""".stripMargin
      }.mkString(",\n")
      val cAll = (1 to mx).map(t => s"SELECT t, n, pn FROM c$t")
        .mkString(" UNION ALL ")
      s"""WITH $kePreamble,
         |e0 AS (SELECT id_a, id_b FROM ke),
         |u0 AS (SELECT id_a AS a, id_b AS b FROM e0
         |       UNION ALL SELECT id_b, id_a FROM e0),
         |$rounds,
         |nr AS (SELECT COALESCE(MIN(t), CAST($mx AS BIGINT)) AS n_rounds
         |       FROM ($cAll) WHERE n = pn),
         |wf AS (SELECT e.id_a, e.id_b, CAST(COUNT(*) AS BIGINT) AS sup
         |  FROM e$mx e
         |  JOIN u$mx x ON x.a = e.id_a
         |  JOIN u$mx y ON y.a = e.id_b AND y.b = x.b
         |  GROUP BY 1, 2)
         |SELECT e.id_a, e.id_b, COALESCE(wf.sup, 0) AS sup, nr.n_rounds
         |FROM e$mx e LEFT JOIN wf ON e.id_a = wf.id_a AND e.id_b = wf.id_b,
         |  nr
         |ORDER BY e.id_a, e.id_b""".stripMargin
    },
    "graph_label_prop" ->
      s"""WITH $lpChainCtes,
         |sz AS (SELECT lab, CAST(COUNT(*) AS BIGINT) AS comm_size
         |       FROM l${Graph.LpRounds} GROUP BY 1)
         |SELECT l.v AS vec_id, l.lab AS label, sz.comm_size
         |FROM l${Graph.LpRounds} l JOIN sz ON l.lab = sz.lab
         |ORDER BY vec_id""".stripMargin,
    // synchronous Louvain local moves over the SAME knn chain: per
    // round, per-(node, candidate-community) exact-integer gain
    // numerators 4m·e − 2·deg·Σtot', argmax with smaller-comm ties;
    // every a_t MATERIALIZEs (referenced four times by round t+1)
    "graph_louvain" ->
      s"""WITH $lvChainCtes,
         |sz AS (SELECT comm, COUNT(*) AS comm_size
         |       FROM a${Graph.LvRounds} GROUP BY 1)
         |SELECT a.v AS vec_id, CAST(a.comm AS BIGINT) AS comm, sz.comm_size
         |FROM a${Graph.LvRounds} a JOIN sz USING (comm)
         |ORDER BY vec_id""".stripMargin,
    // convergence loop: the deep chain plus per-round convergence
    // probes — n_rounds = first round whose assignment equals the
    // previous one (fixpoint) OR the one before that (the synchronous
    // variant's 2-cycle oscillation), else the cap. The SAME number
    // the Spark loop's early exit reports, so the termination
    // behavior is verified along with the assignment (which equals
    // the full unroll either way: fixpoints are idempotent, and a
    // periodic tail lands on the parity the Spark side picks).
    "graph_louvain_conv" -> {
      val mx = Graph.LvConvMax
      val mvs = ((1 to mx).map(t =>
        s"""mv$t AS (SELECT CAST($t AS BIGINT) AS t, COUNT(*) AS c
           |  FROM a$t x JOIN a${t - 1} y ON x.v = y.v
           |  WHERE x.comm <> y.comm)""".stripMargin) ++
        (2 to mx).map(t =>
          s"""os$t AS (SELECT CAST($t AS BIGINT) AS t, COUNT(*) AS c
             |  FROM a$t x JOIN a${t - 2} y ON x.v = y.v
             |  WHERE x.comm <> y.comm)""".stripMargin)).mkString(",\n")
      val mvAll = ((1 to mx).map(t => s"SELECT t, c FROM mv$t") ++
        (2 to mx).map(t => s"SELECT t, c FROM os$t"))
        .mkString(" UNION ALL ")
      s"""WITH ${lvChain(mx)},
         |$mvs,
         |nr AS (SELECT COALESCE(MIN(t), CAST($mx AS BIGINT)) AS n_rounds
         |       FROM ($mvAll) WHERE c = 0),
         |sz AS (SELECT comm, COUNT(*) AS comm_size
         |       FROM a$mx GROUP BY 1)
         |SELECT a.v AS vec_id, CAST(a.comm AS BIGINT) AS comm, sz.comm_size,
         |  nr.n_rounds
         |FROM a$mx a JOIN sz USING (comm), nr
         |ORDER BY vec_id""".stripMargin
    },
    // the full multi-level loop: contract phase-1 communities into a
    // weighted super-graph (weighted degree = member degree sum —
    // the self-loop mass), run weighted synchronous rounds, project
    "graph_louvain2" -> {
      val aN = s"a${Graph.LvRounds}"
      val rounds = (1 to Graph.LvRounds2).map { t =>
        s"""wn$t AS (SELECT u.s AS v2, lb.comm2, CAST(SUM(u.w) AS BIGINT) AS e
           |  FROM wund u JOIN lb${t - 1} lb ON u.d = lb.v2 GROUP BY 1, 2),
           |wc$t AS (SELECT v2, comm2, MAX(e) AS e FROM (
           |    SELECT v2, comm2, e FROM wn$t
           |    UNION ALL SELECT v2, comm2, CAST(0 AS BIGINT) FROM lb${t - 1})
           |  GROUP BY 1, 2),
           |ws$t AS (SELECT lb.comm2, CAST(SUM(kk.kw) AS BIGINT) AS stot
           |  FROM lb${t - 1} lb JOIN kk ON lb.v2 = kk.s GROUP BY 1),
           |wg$t AS (SELECT c.v2, c.comm2,
           |    4 * mm.m * c.e - 2 * k.kw *
           |      (s.stot - CASE WHEN c.comm2 = lb.comm2
           |        THEN k.kw ELSE 0 END) AS score
           |  FROM wc$t c JOIN lb${t - 1} lb ON c.v2 = lb.v2
           |    JOIN kk k ON c.v2 = k.s
           |    JOIN ws$t s ON c.comm2 = s.comm2, mm),
           |lb$t AS MATERIALIZED (SELECT v2, comm2 FROM wg$t
           |  QUALIFY row_number() OVER (PARTITION BY v2
           |    ORDER BY score DESC, comm2) = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH $lvChainCtes,
         |ce AS (SELECT x.comm AS ca, y.comm AS cb
         |  FROM ke JOIN $aN x ON ke.id_a = x.v JOIN $aN y ON ke.id_b = y.v),
         |wund AS MATERIALIZED (SELECT s, d, CAST(COUNT(*) AS BIGINT) AS w FROM (
         |    SELECT ca AS s, cb AS d FROM ce WHERE ca <> cb
         |    UNION ALL SELECT cb AS s, ca AS d FROM ce WHERE ca <> cb)
         |  GROUP BY 1, 2),
         |kk AS MATERIALIZED (SELECT a.comm AS s,
         |    CAST(SUM(COALESCE(dg.deg, 0)) AS BIGINT) AS kw
         |  FROM $aN a LEFT JOIN dg ON a.v = dg.v GROUP BY 1),
         |lb0 AS (SELECT s AS v2, s AS comm2 FROM kk),
         |$rounds,
         |proj AS (SELECT a.v, lb.comm2 AS comm
         |  FROM $aN a JOIN lb${Graph.LvRounds2} lb ON a.comm = lb.v2),
         |sz AS (SELECT comm, COUNT(*) AS comm_size FROM proj GROUP BY 1)
         |SELECT p.v AS vec_id, CAST(p.comm AS BIGINT) AS comm, sz.comm_size
         |FROM proj p JOIN sz USING (comm) ORDER BY vec_id""".stripMargin
    },
    // SCC from first principles: recursive-CTE transitive closure of
    // the above-median trade graph, scc id = min mutual-reach partner
    "graph_scc" ->
      """WITH RECURSIVE e0 AS MATERIALIZED (
        |  SELECT CAST(s_nationkey AS BIGINT) AS src,
        |    CAST(c_nationkey AS BIGINT) AS dst, COUNT(*) AS cnt
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE s_nationkey <> c_nationkey
        |  GROUP BY 1, 2),
        |med AS (SELECT cnt AS m FROM (
        |    SELECT cnt, row_number() OVER (ORDER BY cnt) AS rn,
        |      COUNT(*) OVER () AS n FROM e0)
        |  WHERE rn = (n + 1) // 2),
        |e AS MATERIALIZED (SELECT src, dst FROM e0, med WHERE cnt > m),
        |nodes AS (SELECT DISTINCT node FROM (
        |  SELECT src AS node FROM e UNION SELECT dst FROM e)),
        |reach AS (SELECT src, dst FROM e
        |  UNION
        |  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
        |scc AS (SELECT n.node,
        |    LEAST(n.node, COALESCE((SELECT MIN(a.dst) FROM reach a
        |      JOIN reach b ON a.src = b.dst AND a.dst = b.src
        |      WHERE a.src = n.node), n.node)) AS scc_id
        |  FROM nodes n),
        |sz AS (SELECT scc_id, COUNT(*) AS scc_size FROM scc GROUP BY 1)
        |SELECT CAST(node AS BIGINT) AS node,
        |  CAST(scc_id AS BIGINT) AS scc_id,
        |  CAST(scc_size AS BIGINT) AS scc_size
        |FROM scc JOIN sz USING (scc_id) ORDER BY node""".stripMargin,
    // the Newman–Girvan per-community contribution numerators over
    // the SAME chain: 4m·L_c − d_c², never divided (no float seam)
    "graph_modularity" ->
      s"""WITH $lpChainCtes,
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM ke),
         |dg AS (SELECT id_a AS v, CAST(COUNT(*) AS BIGINT) AS deg
         |       FROM und GROUP BY 1),
         |lfin AS (SELECT v, lab FROM l${Graph.LpRounds}),
         |lin AS (SELECT la.lab, CAST(COUNT(*) AS BIGINT) AS l_in
         |        FROM ke JOIN lfin la ON ke.id_a = la.v
         |        JOIN lfin lb ON ke.id_b = lb.v AND la.lab = lb.lab
         |        GROUP BY 1),
         |ds AS (SELECT la.lab, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |         CAST(SUM(COALESCE(dg.deg, 0)) AS BIGINT) AS d_sum
         |       FROM lfin la LEFT JOIN dg ON la.v = dg.v GROUP BY 1)
         |SELECT ds.lab AS label, ds.n_nodes,
         |  CAST(COALESCE(lin.l_in, 0) AS BIGINT) AS l_in, ds.d_sum,
         |  CAST(4 * mm.m * COALESCE(lin.l_in, 0) - ds.d_sum * ds.d_sum
         |    AS BIGINT) AS num_c
         |FROM ds LEFT JOIN lin ON ds.lab = lin.lab CROSS JOIN mm
         |ORDER BY label""".stripMargin,
    "dedup_bloom" -> {
      val m = Dedup.BloomBits
      s"""WITH d AS (SELECT doc_id, $toks AS t FROM documents),
         |sh AS (SELECT doc_id, unnest($shingles) AS s FROM d),
         |ps AS (SELECT doc_id,
         |         ${md5Int("s")} % $m AS b0,
         |         (${md5Int("s")} + ${md5Int("(s || '!')")}) % $m AS b1
         |       FROM sh),
         |bw AS (SELECT b // 32 AS w_idx,
         |         bit_or(CAST(1 AS BIGINT) << CAST(b % 32 AS INT)) AS w
         |       FROM (SELECT unnest([b0, b1]) AS b FROM ps WHERE doc_id % 97 = 0)
         |       GROUP BY 1),
         |t2 AS (SELECT doc_id,
         |         CASE WHEN COALESCE(w0.w & (CAST(1 AS BIGINT) << CAST(b0 % 32 AS INT)), 0) <> 0
         |               AND COALESCE(w1.w & (CAST(1 AS BIGINT) << CAST(b1 % 32 AS INT)), 0) <> 0
         |         THEN 1 ELSE 0 END AS hit
         |       FROM (SELECT * FROM ps WHERE doc_id % 97 <> 0) tr
         |       LEFT JOIN bw w0 ON tr.b0 // 32 = w0.w_idx
         |       LEFT JOIN bw w1 ON tr.b1 // 32 = w1.w_idx)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |  CAST(SUM(hit) AS BIGINT) AS n_bloom_hit,
         |  CAST(SUM(hit) >= 3 AS BIGINT) AS contaminated
         |FROM t2 GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "dedup_exact" ->
      """SELECT md5(text) AS key, COUNT(*) AS n_docs,
        |CAST(MIN(doc_id) AS BIGINT) AS canonical
        |FROM documents GROUP BY md5(text) ORDER BY canonical""".stripMargin,
    "dedup_normalized" ->
      """SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS key,
        |COUNT(*) AS n_docs,
        |CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_variants,
        |CAST(MIN(doc_id) AS BIGINT) AS canonical
        |FROM documents GROUP BY 1 ORDER BY canonical""".stripMargin,
    // rightmost-min selection re-derived window-by-window: each window
    // start j ranks its w hashes by (h, p DESC); rank 1 is the print
    "text_winnow" -> {
      val k = TextAnalysis.WinnowK
      val w = TextAnalysis.WinnowW
      s"""WITH bs AS (
         |  SELECT doc_id,
         |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS nt
         |  FROM documents),
         |b2 AS (SELECT doc_id, nt, CAST(length(nt) - ${k - 1} AS BIGINT) AS nh
         |       FROM bs WHERE length(nt) >= ${k + w - 1}),
         |hp AS (
         |  SELECT doc_id, nh, CAST(kk - 1 AS BIGINT) AS p,
         |    CAST(${md5Int(s"substr(nt, CAST(kk AS INT), $k)")} AS BIGINT) AS h
         |  FROM (SELECT doc_id, nt, nh,
         |          unnest(range(1, CAST(nh + 1 AS BIGINT))) AS kk FROM b2)),
         |wi AS (
         |  SELECT doc_id, p, h, unnest(range(GREATEST(0, p - ${w - 1}),
         |    LEAST(p, nh - $w) + 1)) AS j
         |  FROM hp),
         |rk AS (
         |  SELECT doc_id, j, h, p, row_number() OVER (
         |    PARTITION BY doc_id, j ORDER BY h, p DESC) AS r
         |  FROM wi),
         |sel AS (SELECT DISTINCT doc_id, h, p FROM rk WHERE r = 1),
         |sh AS (SELECT h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
         |       FROM sel GROUP BY 1),
         |ag AS (
         |  SELECT sel.doc_id, COUNT(*) AS n_prints,
         |    CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |    CAST(SUM((p + 1) * (h % 1000000007)) AS BIGINT) AS print_chk
         |  FROM sel JOIN sh USING (h) GROUP BY 1)
         |SELECT b2.doc_id AS doc_id, b2.nh AS n_hashes, n_prints, n_shared, print_chk
         |FROM ag JOIN b2 ON ag.doc_id = b2.doc_id
         |ORDER BY b2.doc_id""".stripMargin
    },
    // Source-pair aggregate over the same jhits chain; j_milli is
    // integer (// here, div in Spark).
    "dedup_overlap_matrix" ->
      s"""WITH $minhashSigCtes,
         |$bandCandCtes,
         |$ngramHitsCtes,
         |jm AS (SELECT doc_a, doc_b,
         |         (inter * 1000) // (nt_a + nt_b - inter) AS j_milli FROM jhits),
         |tg AS (SELECT LEAST(da.source, db.source) AS src_a,
         |         GREATEST(da.source, db.source) AS src_b, j_milli
         |       FROM jm JOIN documents da ON jm.doc_a = da.doc_id
         |               JOIN documents db ON jm.doc_b = db.doc_id)
         |SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(j_milli) // COUNT(*) AS BIGINT) AS mean_j_milli,
         |  CAST(MAX(j_milli) AS BIGINT) AS max_j_milli
         |FROM tg GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dedup_containment" ->
      s"""WITH d AS (SELECT doc_id, $toks AS t FROM documents),
         |sh AS (SELECT doc_id, $shingles AS s FROM d),
         |se AS (SELECT doc_id, unnest(s) AS s FROM sh),
         |dfq AS (SELECT s, COUNT(*) AS df FROM se GROUP BY s),
         |rare AS (
         |  SELECT se.doc_id, se.s FROM se JOIN dfq USING (s)
         |  WHERE dfq.df <= ${Dedup.ContainDfCap}),
         |cand AS (
         |  SELECT a.doc_id AS doc_sub, b.doc_id AS doc_sup, COUNT(*) AS shared
         |  FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= ${Dedup.ContainMinShared}),
         |ns AS (SELECT doc_id, s, CAST(len(s) AS BIGINT) AS ns FROM sh),
         |ver AS (
         |  SELECT c.doc_sub, c.doc_sup,
         |    CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS inter,
         |    sa.ns AS ns_sub, sb.ns AS ns_sup
         |  FROM cand c JOIN ns sa ON c.doc_sub = sa.doc_id
         |              JOIN ns sb ON c.doc_sup = sb.doc_id)
         |SELECT doc_sub, doc_sup, inter, ns_sub, ns_sup,
         |  CAST(inter * 100 // ns_sub AS BIGINT) AS cont_pct
         |FROM ver WHERE ns_sub > 0 AND inter * 100 >= ${Dedup.ContainTauPct} * ns_sub
         |ORDER BY doc_sub, doc_sup""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $minhashSigCtes,
         |$bandCandCtes,
         |$ngramHitsCtes
         |SELECT doc_a, doc_b, inter, nt_a, nt_b, nt_a + nt_b - inter AS uni,
         |  inter / (nt_a + nt_b - inter) AS jaccard
         |FROM jhits ORDER BY doc_a, doc_b""".stripMargin,
    // np in ngramHitsCtes is the UNFILTERED verified-candidate frame;
    // the sweep filters it per tau — one candidate scan, ten rows out
    "dedup_curve" ->
      s"""WITH $minhashSigCtes,
         |$bandCandCtes,
         |$ngramHitsCtes,
         |taus AS (SELECT CAST(t AS BIGINT) AS tau FROM range(50, 100, 5) r(t)),
         |h AS (
         |  SELECT taus.tau, np.doc_a, np.doc_b FROM np, taus
         |  WHERE np.inter * 100 >= taus.tau * (np.nt_a + np.nt_b - np.inter)),
         |pp AS (SELECT tau, COUNT(*) AS n_pairs FROM h GROUP BY tau),
         |dd AS (SELECT tau, COUNT(DISTINCT d) AS n_dup_docs FROM (
         |    SELECT tau, doc_a AS d FROM h
         |    UNION ALL SELECT tau, doc_b AS d FROM h) u GROUP BY tau),
         |nt AS (SELECT COUNT(*) AS n FROM documents)
         |SELECT taus.tau, CAST(COALESCE(pp.n_pairs, 0) AS BIGINT) AS n_pairs,
         |  CAST(COALESCE(dd.n_dup_docs, 0) AS BIGINT) AS n_dup_docs,
         |  CAST(COALESCE(dd.n_dup_docs, 0) * 1000000 // nt.n AS BIGINT) AS dup_ppm
         |FROM taus LEFT JOIN pp USING (tau) LEFT JOIN dd USING (tau), nt
         |ORDER BY taus.tau""".stripMargin,
    "dedup_cluster" ->
      s"""WITH RECURSIVE $minhashSigCtes,
         |$bandCandCtes,
         |$ngramHitsCtes,
         |e AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jhits
         |  UNION ALL SELECT doc_b, doc_a FROM jhits),
         |reach(doc, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.src, r.lbl FROM reach r JOIN e ON r.doc = e.dst),
         |mm AS (SELECT doc, CAST(MIN(lbl) AS BIGINT) AS cluster FROM reach GROUP BY doc),
         |cs AS (SELECT cluster, COUNT(*) AS cluster_size FROM mm GROUP BY cluster)
         |SELECT mm.doc AS doc_id, mm.cluster, cs.cluster_size
         |FROM mm JOIN cs USING (cluster) ORDER BY doc_id""".stripMargin,
    // Shares dedup_cluster's closure chain verbatim; survivor-ness is
    // the min-id representative predicate doc_id = cluster.
    "dedup_yield" ->
      s"""WITH RECURSIVE $minhashSigCtes,
         |$bandCandCtes,
         |$ngramHitsCtes,
         |e AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jhits
         |  UNION ALL SELECT doc_b, doc_a FROM jhits),
         |reach(doc, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.src, r.lbl FROM reach r JOIN e ON r.doc = e.dst),
         |mm AS (SELECT doc, CAST(MIN(lbl) AS BIGINT) AS cluster FROM reach GROUP BY doc)
         |SELECT d.source,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs_raw,
         |  CAST(SUM(d.n_chars // 4) AS BIGINT) AS n_tokens_raw,
         |  CAST(SUM(CASE WHEN mm.cluster = d.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_docs_unique,
         |  CAST(SUM(CASE WHEN mm.cluster = d.doc_id THEN d.n_chars // 4 ELSE 0 END)
         |    AS BIGINT) AS n_tokens_unique,
         |  CAST((COUNT(*) - SUM(CASE WHEN mm.cluster = d.doc_id THEN 1 ELSE 0 END))
         |    * 1000000 // COUNT(*) AS BIGINT) AS dup_docs_ppm
         |FROM documents d JOIN mm ON d.doc_id = mm.doc
         |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "dedup_embed_cluster" ->
      s"""WITH RECURSIVE $bucketedDynCte,
         |${pairsCte(300000L)},
         |e AS (
         |  SELECT id_a AS src, id_b AS dst FROM hits
         |  UNION ALL SELECT id_b, id_a FROM hits),
         |reach(doc, lbl) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT e.src, r.lbl FROM reach r JOIN e ON r.doc = e.dst),
         |mm AS (SELECT doc, CAST(MIN(lbl) AS BIGINT) AS cluster FROM reach GROUP BY doc),
         |cs AS (SELECT cluster, COUNT(*) AS cluster_size FROM mm GROUP BY cluster)
         |SELECT mm.doc AS vec_id, mm.cluster, cs.cluster_size
         |FROM mm JOIN cs USING (cluster) ORDER BY vec_id""".stripMargin,
    "dedup_minhash" ->
      s"""WITH $minhashSigCtes
         |SELECT * FROM sig ORDER BY doc_id""".stripMargin,
    "dedup_incremental" ->
      s"""WITH $minhashSigCtes,
         |nb AS (
         |  SELECT doc_id, 0 AS band_i, band0 AS band_v FROM sig
         |  UNION ALL SELECT doc_id, 1, band1 FROM sig
         |  UNION ALL SELECT doc_id, 2, band2 FROM sig
         |  UNION ALL SELECT doc_id, 3, band3 FROM sig),
         |pr AS (SELECT doc_id AS doc_new, band_i, band_v FROM nb WHERE doc_id % 4 = 0),
         |ix AS (SELECT doc_id AS doc_idx, doc_id % 4 = 0 AS idx_new, band_i, band_v FROM nb),
         |cd AS (
         |  SELECT DISTINCT doc_new, doc_idx
         |  FROM pr JOIN ix USING (band_i, band_v)
         |  WHERE (NOT idx_new OR doc_idx < doc_new) AND doc_idx <> doc_new),
         |tk AS (
         |  SELECT doc_id, list_distinct($toks) AS t,
         |    CAST(len(list_distinct($toks)) AS BIGINT) AS nt
         |  FROM documents),
         |vf AS (
         |  SELECT cd.doc_new, cd.doc_idx,
         |    CAST(len(list_intersect(ta.t, tb.t)) AS BIGINT) AS inter,
         |    ta.nt AS nt_a, tb.nt AS nt_b
         |  FROM cd JOIN tk ta ON cd.doc_new = ta.doc_id
         |          JOIN tk tb ON cd.doc_idx = tb.doc_id),
         |ag AS (
         |  SELECT doc_new, COUNT(*) AS n_cands,
         |    MIN(CASE WHEN inter * 2 >= nt_a + nt_b - inter THEN doc_idx END) AS dup_of
         |  FROM vf GROUP BY doc_new)
         |SELECT d.doc_id, CAST(COALESCE(ag.n_cands, 0) AS BIGINT) AS n_cands,
         |  CAST(COALESCE(ag.dup_of, -1) AS BIGINT) AS dup_of,
         |  CAST(COALESCE(ag.dup_of, -1) = -1 AS BIGINT) AS kept
         |FROM documents d LEFT JOIN ag ON d.doc_id = ag.doc_new
         |WHERE d.doc_id % 4 = 0
         |ORDER BY d.doc_id""".stripMargin,
    "stream_incr_dedup" ->
      s"""WITH $minhashSigCtes,
         |nb AS (
         |  SELECT doc_id, 0 AS band_i, band0 AS band_v FROM sig
         |  UNION ALL SELECT doc_id, 1, band1 FROM sig
         |  UNION ALL SELECT doc_id, 2, band2 FROM sig
         |  UNION ALL SELECT doc_id, 3, band3 FROM sig),
         |pr AS (SELECT doc_id AS doc_new, band_i, band_v FROM nb WHERE doc_id % 4 = 0),
         |ix AS (SELECT doc_id AS doc_idx, band_i, band_v FROM nb WHERE doc_id % 4 <> 0),
         |cd AS (
         |  SELECT DISTINCT doc_new, doc_idx
         |  FROM pr JOIN ix USING (band_i, band_v)),
         |tk AS (
         |  SELECT doc_id, list_distinct($toks) AS t,
         |    CAST(len(list_distinct($toks)) AS BIGINT) AS nt
         |  FROM documents),
         |vf AS (
         |  SELECT cd.doc_new, cd.doc_idx,
         |    CAST(len(list_intersect(ta.t, tb.t)) AS BIGINT) AS inter,
         |    ta.nt AS nt_a, tb.nt AS nt_b
         |  FROM cd JOIN tk ta ON cd.doc_new = ta.doc_id
         |          JOIN tk tb ON cd.doc_idx = tb.doc_id),
         |ag AS (
         |  SELECT doc_new, COUNT(*) AS n_cands,
         |    MIN(CASE WHEN inter * 2 >= nt_a + nt_b - inter THEN doc_idx END) AS dup_of
         |  FROM vf GROUP BY doc_new)
         |SELECT d.doc_id, CAST(COALESCE(ag.n_cands, 0) AS BIGINT) AS n_cands,
         |  CAST(COALESCE(ag.dup_of, -1) AS BIGINT) AS dup_of,
         |  CAST(COALESCE(ag.dup_of, -1) = -1 AS BIGINT) AS kept
         |FROM documents d LEFT JOIN ag ON d.doc_id = ag.doc_new
         |WHERE d.doc_id % 4 = 0
         |ORDER BY d.doc_id""".stripMargin,
    "dedup_keep_best" ->
      s"""WITH RECURSIVE $minhashSigCtes,
         |$bandCandCtes,
         |$ngramHitsCtes,
         |e AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jhits
         |  UNION ALL SELECT doc_b, doc_a FROM jhits),
         |reach(doc, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.src, r.lbl FROM reach r JOIN e ON r.doc = e.dst),
         |mm AS (SELECT doc, CAST(MIN(lbl) AS BIGINT) AS cluster FROM reach GROUP BY doc),
         |cs AS (SELECT cluster, COUNT(*) AS cluster_size FROM mm GROUP BY cluster),
         |$scoreCtes,
         |j AS (
         |  SELECT mm.doc AS doc_id, mm.cluster, cs.cluster_size, sc.score_u
         |  FROM mm JOIN cs USING (cluster) JOIN sc ON mm.doc = sc.doc_id),
         |sv AS (
         |  SELECT cluster, doc_id AS survivor FROM j
         |  QUALIFY row_number() OVER (PARTITION BY cluster ORDER BY score_u DESC, doc_id) = 1)
         |SELECT j.doc_id, j.cluster, j.cluster_size, j.score_u, sv.survivor,
         |  CAST(j.doc_id = sv.survivor AS BIGINT) AS kept
         |FROM j JOIN sv USING (cluster)
         |ORDER BY j.doc_id""".stripMargin,
    // Shares dedup_cluster's transitive-closure chain; the survivor
    // is the hash-min member (uniform among the cluster), and only it
    // carries the inverse-probability weight.
    "sample_soft_dedup" ->
      s"""WITH RECURSIVE $minhashSigCtes,
         |$bandCandCtes,
         |$ngramHitsCtes,
         |e AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jhits
         |  UNION ALL SELECT doc_b, doc_a FROM jhits),
         |reach(doc, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.src, r.lbl FROM reach r JOIN e ON r.doc = e.dst),
         |mm AS (SELECT doc, CAST(MIN(lbl) AS BIGINT) AS cluster FROM reach GROUP BY doc),
         |cs AS (SELECT cluster, COUNT(*) AS cluster_size FROM mm GROUP BY cluster),
         |h AS (
         |  SELECT mm.doc AS doc_id, mm.cluster, cs.cluster_size,
         |    ${md5Int("('sd:' || CAST(mm.doc AS VARCHAR))")} AS u_hash
         |  FROM mm JOIN cs USING (cluster)),
         |sv AS (
         |  SELECT cluster, doc_id AS survivor FROM h
         |  QUALIFY row_number() OVER (PARTITION BY cluster ORDER BY u_hash, doc_id) = 1)
         |SELECT h.doc_id, h.cluster, h.cluster_size, h.u_hash,
         |  CAST(h.doc_id = sv.survivor AS BIGINT) AS kept,
         |  CAST(CASE WHEN h.doc_id = sv.survivor THEN h.cluster_size ELSE 0 END AS BIGINT) AS ht_weight
         |FROM h JOIN sv USING (cluster)
         |ORDER BY h.doc_id""".stripMargin,
    "dedup_minhash_pairs" -> {
      val matches = (0 until Dedup.MinhashK)
        .map(j => s"CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END")
        .mkString("(", " + ", ")")
      s"""WITH $minhashSigCtes,
         |$bandCandCtes
         |SELECT cand.doc_a, cand.doc_b, CAST($matches AS BIGINT) AS n_match,
         |  CAST($matches AS BIGINT) / CAST(8.0 AS DOUBLE) AS est_jaccard
         |FROM cand JOIN sig sa ON cand.doc_a = sa.doc_id
         |          JOIN sig sb ON cand.doc_b = sb.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    "dedup_simhash" -> {
      val fp = (0 until 32).map { i =>
        s"CAST(SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) > 0 AS BIGINT) * ${1L << i}"
      }.mkString(" + ")
      s"""WITH d AS (SELECT doc_id, unnest(list_distinct($toks)) AS tok FROM documents),
         |h AS (SELECT doc_id, ${md5Int("tok")} AS h FROM d)
         |SELECT doc_id, CAST($fp AS BIGINT) AS simhash, COUNT(*) AS n_tokens
         |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "dedup_embed" ->
      s"""WITH $bucketedDynCte,
         |${pairsCte(300000L)},
         |u AS (
         |  SELECT id_a AS doc, id_b AS partner FROM hits
         |  UNION ALL SELECT id_b AS doc, id_a AS partner FROM hits)
         |SELECT doc, LEAST(MIN(partner), doc) AS canonical, COUNT(*) AS n_partners
         |FROM u GROUP BY doc ORDER BY doc""".stripMargin,
    "dedup_semantic" ->
      s"""WITH $ivfModsCte,
         |asg AS (
         |  SELECT e.vec_id, e.embedding, c.cent_id,
         |         ${cosU("e.embedding", "c.cvec")} AS ccos
         |  FROM embeddings e, c),
         |cell AS (
         |  SELECT vec_id, embedding, cent_id AS cell FROM asg
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) = 1),
         |cs AS (SELECT cell, COUNT(*) AS csz, MIN(vec_id) AS rep FROM cell GROUP BY cell),
         |aug AS (SELECT cell.vec_id, cell.embedding, cell.cell, cs.csz, cs.rep
         |        FROM cell JOIN cs USING (cell)),
         |sd AS (
         |  SELECT y.vec_id, MIN(x.vec_id) AS dup_of, 0 AS via_star
         |  FROM aug x JOIN aug y ON x.cell = y.cell AND x.vec_id < y.vec_id
         |  WHERE x.csz <= ${Dedup.SemCap}
         |    AND ${cosU("x.embedding", "y.embedding")} >= ${Dedup.SemTauU}
         |  GROUP BY y.vec_id),
         |hd AS (
         |  SELECT m.vec_id, m.rep AS dup_of, 1 AS via_star
         |  FROM aug m JOIN aug r ON m.cell = r.cell AND r.vec_id = m.rep
         |  WHERE m.csz > ${Dedup.SemCap} AND m.vec_id != m.rep
         |    AND ${cosU("r.embedding", "m.embedding")} >= ${Dedup.SemTauU}),
         |d AS (SELECT * FROM sd UNION ALL SELECT * FROM hd)
         |SELECT cell.vec_id, cell.cell,
         |  CAST(COALESCE(d.dup_of, -1) AS BIGINT) AS dup_of,
         |  CAST(d.dup_of IS NOT NULL AS BIGINT) AS is_dup,
         |  CAST(COALESCE(d.via_star, 0) AS BIGINT) AS via_star
         |FROM cell LEFT JOIN d ON cell.vec_id = d.vec_id
         |ORDER BY cell.vec_id""".stripMargin,
    "sim_pairs_thresh" ->
      s"""WITH $bucketedDynCte,
         |${pairsCte(300000L)}
         |SELECT id_a, id_b, label_a, label_b, cos_u, bucket FROM hits
         |ORDER BY id_a, id_b""".stripMargin,
    "stats_cov_matrix" ->
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM embeddings),
         |xl AS (SELECT vec_id, CAST(i AS BIGINT) AS dim,
         |         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS xq
         |       FROM embeddings, range(1, 65) r(i)),
         |m AS (SELECT dim, CAST(SUM(xq) // nn.n AS BIGINT) AS mean_q
         |      FROM xl, nn GROUP BY dim, nn.n),
         |c AS (SELECT vec_id, xl.dim, xq - mean_q AS cq FROM xl JOIN m USING (dim)),
         |cov AS (
         |  SELECT a.dim AS i, b.dim AS j,
         |    CAST(SUM((a.cq * b.cq) // 1048576) // ANY_VALUE(nn.n) AS BIGINT) AS cov_u,
         |    COUNT(*) AS n_used
         |  FROM c a JOIN c b ON a.vec_id = b.vec_id AND b.dim >= a.dim, nn
         |  GROUP BY 1, 2),
         |v AS (SELECT i AS d, cov_u AS var_u FROM cov WHERE i = j)
         |SELECT cov.i, cov.j, cov.n_used, cov.cov_u,
         |  CAST(CASE WHEN vi.var_u > 0 AND vj.var_u > 0 THEN
         |    FLOOR(1000000.0 * cov.cov_u
         |      / sqrt(CAST(vi.var_u AS DOUBLE) * CAST(vj.var_u AS DOUBLE)))
         |  ELSE 0 END AS BIGINT) AS corr_u
         |FROM cov JOIN v vi ON cov.i = vi.d JOIN v vj ON cov.j = vj.d
         |ORDER BY cov.i, cov.j""".stripMargin,
    "embed_pca_power" ->
      s"""WITH $pcaTrainCtes
         |SELECT m.dim, m.mean_q, w${Similarity.PcaRounds}.vr,
         |  v${Similarity.PcaRounds}.v_u AS pc1_u
         |FROM m JOIN w${Similarity.PcaRounds} USING (dim)
         |JOIN v${Similarity.PcaRounds} USING (dim)
         |ORDER BY dim""".stripMargin,
    "embed_project" ->
      s"""WITH $pcaTrainCtes
         |SELECT vec_id,
         |  CAST(SUM(cq * v_u) AS BIGINT) // 1000000 AS proj_u,
         |  CAST(SUM((cq * cq) // 1048576) AS BIGINT) AS cn2_u
         |FROM c JOIN v${Similarity.PcaRounds} USING (dim)
         |GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "sim_pq_kmeans" -> {
      val d = Similarity.PqD
      def fold(body: String) =
        s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |  [$body for i in range(1, ${d + 1})]),
           |  (acc, v) -> acc + v)""".stripMargin
      val l2F = fold("(CAST(svec[i] AS DOUBLE) - CAST(cvec[i] AS DOUBLE)) * (CAST(svec[i] AS DOUBLE) - CAST(cvec[i] AS DOUBLE))")
      val l2Q = fold("(CAST(svec[i] AS DOUBLE) - CAST(cvq[i] AS DOUBLE) * CAST(1e-6 AS DOUBLE)) * (CAST(svec[i] AS DOUBLE) - CAST(cvq[i] AS DOUBLE) * CAST(1e-6 AS DOUBLE))")
      val selfQ = fold("(CAST(cvq[i] AS DOUBLE) * CAST(1e-6 AS DOUBLE)) * (CAST(cvq[i] AS DOUBLE) * CAST(1e-6 AS DOUBLE))")
      val dotQsub = fold("CAST(psub[i] AS DOUBLE) * (CAST(cvq[i] AS DOUBLE) * CAST(1e-6 AS DOUBLE))")
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM embeddings),
         |cbm AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 57) r(g), nn
         |        WHERE (CAST(1 AS BIGINT) << g) * ${Similarity.PqKs} >= nn.n),
         |pmod AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 57) r(g), nn
         |         WHERE (CAST(1 AS BIGINT) << g) * 64 >= nn.n),
         |seeds AS (
         |  SELECT vec_id, embedding,
         |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cb_idx
         |  FROM embeddings, cbm WHERE vec_id % cbm.m = 0),
         |cb AS (
         |  SELECT CAST(mm.m AS BIGINT) AS m, s.cb_idx,
         |    s.embedding[mm.m*$d+1 : mm.m*$d+$d] AS cvec
         |  FROM seeds s, range(0, ${Similarity.PqM}) mm(m)),
         |subs AS (
         |  SELECT vec_id, CAST(mm.m AS BIGINT) AS m,
         |    embedding[mm.m*$d+1 : mm.m*$d+$d] AS svec
         |  FROM embeddings, range(0, ${Similarity.PqM}) mm(m)),
         |dists0 AS (
         |  SELECT vec_id, s.m, cb_idx,
         |    CAST(FLOOR($l2F * 1000000.0) AS BIGINT) AS du
         |  FROM subs s JOIN cb ON s.m = cb.m),
         |codes0 AS (
         |  SELECT vec_id, m, CAST(MIN(du * ${Similarity.PqKs} + cb_idx) % ${Similarity.PqKs} AS BIGINT) AS cb_idx
         |  FROM dists0 GROUP BY 1, 2),
         |el AS (
         |  SELECT vec_id, m, CAST(i AS BIGINT) AS pos,
         |    CAST(FLOOR(CAST(svec[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS xq
         |  FROM subs, range(1, ${d + 1}) r(i)),
         |${(1 to Similarity.LloydRounds).map { r =>
             // per-round Lloyd unroll: integer means -> micro-int
             // codebook -> re-encode (reads codes{r-1})
             s"""cb${r}d AS (
                |  SELECT el.m, c.cb_idx, el.pos,
                |    CAST(SUM(xq) // COUNT(*) AS BIGINT) AS dimq
                |  FROM el JOIN codes${r - 1} c ON el.vec_id = c.vec_id AND el.m = c.m
                |  GROUP BY 1, 2, 3),
                |cb$r AS (SELECT m, cb_idx, list(dimq ORDER BY pos) AS cvq
                |        FROM cb${r}d GROUP BY 1, 2),
                |cb${r}n AS (SELECT m, cb_idx, cvq, $selfQ AS cn2 FROM cb$r),
                |dq$r AS (
                |  SELECT s.vec_id, s.m, c.cb_idx,
                |    CAST(FLOOR($l2Q * 1000000.0) AS BIGINT) AS du
                |  FROM subs s JOIN cb${r}n c ON s.m = c.m),
                |codes$r AS (
                |  SELECT vec_id, m, CAST(MIN(du * ${Similarity.PqKs} + cb_idx) % ${Similarity.PqKs} AS BIGINT) AS cb_idx
                |  FROM dq$r GROUP BY 1, 2)""".stripMargin
           }.mkString(",\n")},
         |prn AS (
         |  SELECT vec_id AS probe_id, embedding AS pvec,
         |    ${dotD("embedding", "embedding")} AS pn2
         |  FROM embeddings, pmod WHERE vec_id % pmod.m = 0),
         |psubs AS (
         |  SELECT probe_id, pn2, CAST(mm.m AS BIGINT) AS m,
         |    pvec[mm.m*$d+1 : mm.m*$d+$d] AS psub
         |  FROM prn, range(0, ${Similarity.PqM}) mm(m)),
         |lut AS (
         |  SELECT probe_id, pn2, c.m, c.cb_idx,
         |    CAST(FLOOR($dotQsub * 1000000000.0) AS BIGINT) AS pdot_su,
         |    CAST(FLOOR(cn2 * 1000000000.0) AS BIGINT) AS cn2_su
         |  FROM psubs p JOIN cb${Similarity.LloydRounds}n c ON p.m = c.m),
         |adc AS (
         |  SELECT probe_id, vec_id,
         |    CAST(SUM(pdot_su) AS BIGINT) AS adc_su,
         |    CAST(SUM(cn2_su) AS BIGINT) AS vhat_su,
         |    MAX(pn2) AS pn2
         |  FROM codes${Similarity.LloydRounds} JOIN lut USING (m, cb_idx) GROUP BY 1, 2),
         |sc AS (
         |  SELECT probe_id, vec_id,
         |    CAST(CASE WHEN vhat_su > 0 THEN
         |      FLOOR(CAST(adc_su AS DOUBLE) / 1000000000.0
         |        / (sqrt(pn2) * sqrt(CAST(vhat_su AS DOUBLE) / 1000000000.0))
         |        * 1000000.0) ELSE 0 END AS BIGINT) AS adc_u
         |  FROM adc WHERE vec_id <> probe_id),
         |rk AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY adc_u DESC, vec_id) AS BIGINT) AS rank FROM sc),
         |top AS (SELECT * FROM rk WHERE rank <= 5)
         |SELECT t.probe_id, t.rank, t.vec_id, t.adc_u,
         |  ${cosU("prn.pvec", "e.embedding")} AS cos_u
         |FROM top t JOIN embeddings e ON t.vec_id = e.vec_id
         |JOIN prn ON t.probe_id = prn.probe_id
         |ORDER BY t.probe_id, t.rank""".stripMargin
    },
    "sim_hamming_topk" -> {
      val pack = (0 until 64).map { d =>
        s"CAST(embedding[${d + 1}] > 0 AS BIGINT) * ${1L << d}"
      }.mkString("\n     + ")
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM embeddings),
         |pmod AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 57) r(g), nn
         |         WHERE (CAST(1 AS BIGINT) << g) * 64 >= nn.n),
         |pk AS (SELECT vec_id, embedding, $pack AS sig FROM embeddings),
         |pr AS (SELECT vec_id AS probe_id, embedding AS pvec, sig AS psig
         |       FROM pk, pmod WHERE vec_id % pmod.m = 0),
         |h AS (SELECT pr.probe_id, pk.vec_id,
         |        CAST(bit_count(xor(pk.sig, pr.psig)) AS BIGINT) AS ham
         |      FROM pk, pr WHERE pk.vec_id != pr.probe_id),
         |sl AS (SELECT * FROM h
         |       QUALIFY row_number() OVER (PARTITION BY probe_id
         |         ORDER BY ham ASC, vec_id) <= ${Similarity.HamShortlist}),
         |sc AS (SELECT s.probe_id, s.vec_id, s.ham,
         |         ${cosU("pr.pvec", "e.embedding")} AS cos_u
         |       FROM sl s JOIN embeddings e ON s.vec_id = e.vec_id
         |       JOIN pr ON s.probe_id = pr.probe_id)
         |SELECT probe_id,
         |  CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_u DESC, vec_id) AS BIGINT) AS rank,
         |  vec_id, ham, cos_u
         |FROM sc QUALIFY rank <= 5 ORDER BY probe_id, rank""".stripMargin
    },
    "sim_hybrid_rrf" ->
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM documents),
         |pmod AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 57) r(g), nn
         |         WHERE (CAST(1 AS BIGINT) << g) * 64 >= nn.n),
         |tl AS (SELECT doc_id, $toks AS t FROM documents),
         |d AS (SELECT DISTINCT doc_id, unnest(
         |        CASE WHEN len(t) >= 2 THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
         |        ELSE CAST([] AS VARCHAR[]) END) AS tok
         |      FROM tl),
         |rare AS (SELECT tok, CAST(FLOOR(1000000.0 * nn.n / COUNT(*)) AS BIGINT) AS idf_u
         |         FROM d, nn GROUP BY tok, nn.n HAVING COUNT(*) * 4 <= nn.n),
         |pt AS (SELECT doc_id AS probe_id, tok FROM d, pmod WHERE doc_id % pmod.m = 0),
         |lex0 AS (SELECT pt.probe_id, d.doc_id, CAST(SUM(idf_u) AS BIGINT) AS lex_u
         |         FROM d JOIN rare USING (tok) JOIN pt USING (tok)
         |         WHERE d.doc_id != pt.probe_id GROUP BY 1, 2),
         |lex AS (SELECT probe_id, doc_id, lex_u FROM lex0
         |        QUALIFY row_number() OVER (PARTITION BY probe_id
         |          ORDER BY lex_u DESC, doc_id) <= ${Similarity.HybridShortlist}),
         |pe AS (SELECT vec_id AS probe_id, embedding AS pvec
         |       FROM embeddings, pmod WHERE vec_id % pmod.m = 0),
         |sc AS (SELECT l.probe_id, l.doc_id, l.lex_u,
         |         ${cosU("pe.pvec", "e.embedding")} AS cos_u
         |       FROM lex l JOIN embeddings e ON l.doc_id = e.vec_id
         |       JOIN pe ON l.probe_id = pe.probe_id),
         |rk AS (SELECT *,
         |         CAST(row_number() OVER (PARTITION BY probe_id
         |           ORDER BY lex_u DESC, doc_id) AS BIGINT) AS lex_rank,
         |         CAST(row_number() OVER (PARTITION BY probe_id
         |           ORDER BY cos_u DESC, doc_id) AS BIGINT) AS cos_rank
         |       FROM sc),
         |f AS (SELECT *, CAST(1000000 // (${Similarity.RrfK} + lex_rank)
         |        + 1000000 // (${Similarity.RrfK} + cos_rank) AS BIGINT) AS rrf_u
         |      FROM rk)
         |SELECT probe_id,
         |  CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY rrf_u DESC, doc_id) AS BIGINT) AS rank,
         |  doc_id, rrf_u, lex_u, cos_u, lex_rank, cos_rank
         |FROM f QUALIFY rank <= 5 ORDER BY probe_id, rank""".stripMargin,
    // Okapi BM25 with k1=1.2, b=0.75 as scaled-integer constants;
    // shares sim_hybrid_rrf's probe set, bigram terms, rare filter,
    // and integer-idf convention. All divisions integer (// here,
    // div in Spark) so the scores are bit-exact cross-engine.
    "sim_bm25_topk" ->
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM documents),
         |pmod AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 57) r(g), nn
         |         WHERE (CAST(1 AS BIGINT) << g) * 64 >= nn.n),
         |tl AS (SELECT doc_id, $toks AS t FROM documents),
         |tfq AS (SELECT doc_id, u.tok AS tok, CAST(COUNT(*) AS BIGINT) AS tf
         |        FROM tl, unnest(
         |          CASE WHEN len(t) >= 2 THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
         |          ELSE CAST([] AS VARCHAR[]) END) u(tok)
         |        GROUP BY 1, 2),
         |dld AS (SELECT doc_id, tok, tf,
         |          CAST(SUM(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS dl FROM tfq),
         |ad AS (SELECT GREATEST(CAST(1 AS BIGINT),
         |          CAST(SUM(tf) AS BIGINT) // CAST(COUNT(DISTINCT doc_id) AS BIGINT))
         |          AS avgdl FROM tfq),
         |rare AS (SELECT tok, CAST(FLOOR(1000000.0 * nn.n / COUNT(*)) AS BIGINT) AS idf_u
         |         FROM tfq, nn GROUP BY tok, nn.n HAVING COUNT(*) * 4 <= nn.n),
         |pt AS (SELECT t.doc_id AS probe_id, t.tok, r.idf_u
         |       FROM tfq t JOIN rare r USING (tok), pmod WHERE t.doc_id % pmod.m = 0),
         |sc AS (SELECT pt.probe_id, d.doc_id,
         |         CAST(SUM((pt.idf_u * d.tf * 2200)
         |           // (d.tf * 1000 + (1200 * (250 + (750 * ((d.dl * 1000) // ad.avgdl)) // 1000)) // 1000))
         |           AS BIGINT) AS bm25_u
         |       FROM dld d JOIN pt USING (tok), ad
         |       WHERE d.doc_id != pt.probe_id GROUP BY 1, 2)
         |SELECT probe_id,
         |  CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY bm25_u DESC, doc_id) AS BIGINT) AS rank,
         |  doc_id, bm25_u
         |FROM sc QUALIFY rank <= 5 ORDER BY probe_id, rank""".stripMargin,
    "sim_mrl_topk" -> {
      val P = Similarity.MrlPrefix
      def dot16(a: String, b: String) =
        s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |  [CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE) for i in range(1, ${P + 1})]),
           |  (acc, v) -> acc + v)""".stripMargin
      def cos16(a: String, b: String) =
        s"""CAST(FLOOR(${dot16(a, b)} / (sqrt(${dot16(a, a)}) * sqrt(${dot16(b, b)})) * 1000000.0) AS BIGINT)"""
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM embeddings),
         |pmod AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 57) r(g), nn
         |         WHERE (CAST(1 AS BIGINT) << g) * 64 >= nn.n),
         |p AS (SELECT vec_id AS probe_id, embedding AS pvec
         |      FROM embeddings, pmod WHERE vec_id % pmod.m = 0),
         |s AS (SELECT p.probe_id, e.vec_id, p.pvec, e.embedding,
         |        ${cos16("p.pvec", "e.embedding")} AS cos16_u
         |      FROM embeddings e, p WHERE e.vec_id != p.probe_id),
         |top AS (SELECT * FROM s
         |  QUALIFY row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos16_u DESC, vec_id) <= ${Similarity.MrlShortlist}),
         |f AS (SELECT probe_id, vec_id, cos16_u,
         |        ${cosU("pvec", "embedding")} AS cos_u FROM top)
         |SELECT probe_id, CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_u DESC, vec_id) AS BIGINT) AS rank,
         |  vec_id, cos_u, cos16_u
         |FROM f QUALIFY rank <= 5 ORDER BY probe_id, rank""".stripMargin
    },
    "sim_maxsim" -> {
      val D = Similarity.MaxsimD
      val vecList = "[" + (1 to D)
        .map(j => s"(${md5Int(s"(tok || '#$j')")} % 2001) - 1000").mkString(", ") + "]"
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM documents),
         |pmod AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 57) r(g), nn
         |         WHERE (CAST(1 AS BIGINT) << g) * 64 >= nn.n),
         |tl AS (SELECT doc_id, $toks AS t FROM documents),
         |tokpos AS (SELECT doc_id, u.s['tok'] AS tok, MIN(u.s['i']) AS fi
         |           FROM tl, unnest([{'tok': t[i], 'i': i} for i in generate_series(1, len(t))]) u(s)
         |           GROUP BY 1, 2),
         |dtv0 AS (SELECT doc_id, tok,
         |           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY fi) - 1 AS BIGINT) AS ti
         |         FROM tokpos),
         |dtv AS (SELECT doc_id, tok, ti, $vecList AS tv FROM dtv0 WHERE ti < ${Similarity.MaxsimDocT}),
         |dtn AS (SELECT *, CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          [tv[i] * tv[i] for i in range(1, ${D + 1})]), (a, v) -> a + v) AS BIGINT) AS tn2
         |        FROM dtv),
         |dv AS (SELECT * FROM dtn WHERE tn2 > 0),
         |bg AS (SELECT DISTINCT doc_id, unnest(
         |        CASE WHEN len(t) >= 2 THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
         |        ELSE CAST([] AS VARCHAR[]) END) AS bgr FROM tl),
         |rare AS (SELECT bgr FROM bg, nn GROUP BY bgr, nn.n HAVING COUNT(*) * 4 <= nn.n),
         |pbg AS (SELECT doc_id AS probe_id, bgr FROM bg, pmod WHERE doc_id % pmod.m = 0),
         |cand0 AS (SELECT pbg.probe_id, bg.doc_id, COUNT(*) AS nshared
         |          FROM bg JOIN rare USING (bgr) JOIN pbg USING (bgr)
         |          WHERE bg.doc_id != pbg.probe_id GROUP BY 1, 2),
         |cand AS (SELECT probe_id, doc_id FROM cand0
         |         QUALIFY row_number() OVER (PARTITION BY probe_id
         |           ORDER BY nshared DESC, doc_id) <= ${Similarity.MaxsimShortlist}),
         |qtv AS (SELECT dv.doc_id AS probe_id, ti AS qi, tv AS qv, tn2 AS qn2
         |        FROM dv, pmod WHERE dv.doc_id % pmod.m = 0 AND ti < ${Similarity.MaxsimQT}),
         |sc AS (SELECT c.probe_id, c.doc_id, q.qi,
         |         CAST(FLOOR(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           [q.qv[i] * v.tv[i] for i in range(1, ${D + 1})]), (a, x) -> a + x) AS DOUBLE)
         |           / (sqrt(q.qn2) * sqrt(v.tn2)) * 1000000.0) AS BIGINT) AS cc
         |       FROM cand c JOIN dv v ON c.doc_id = v.doc_id
         |       JOIN qtv q ON c.probe_id = q.probe_id),
         |mx AS (SELECT probe_id, doc_id, qi, MAX(cc) AS mc FROM sc GROUP BY 1, 2, 3),
         |s AS (SELECT probe_id, doc_id, CAST(SUM(mc) AS BIGINT) AS maxsim_u,
         |        COUNT(*) AS n_qt FROM mx GROUP BY 1, 2)
         |SELECT probe_id, CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY maxsim_u DESC, doc_id) AS BIGINT) AS rank,
         |  doc_id, maxsim_u, n_qt
         |FROM s QUALIFY rank <= 5 ORDER BY probe_id, rank""".stripMargin
    },
    "sim_knn_graph" ->
      s"""WITH $knnCtes
         |SELECT vec_id, rank, nbr_id, cos_u FROM r
         |WHERE rank <= ${Similarity.KnnK} ORDER BY vec_id, rank""".stripMargin,
    // NN-descent over the SAME knn chain: per round, undirected
    // neighbor sets → two-hop candidates → exact rescore → keep-k.
    // Each g_t is referenced three times by round t+1, so the rounds
    // MATERIALIZE (the graph frames are n·k rows — free), keeping the
    // plan linear instead of 3^rounds re-expansions.
    "sim_nndescent" ->
      s"""WITH $ndChainCtes
         |SELECT vec_id,
         |  CAST(row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cos_u DESC, nbr_id) AS BIGINT) AS rank,
         |  nbr_id, cos_u
         |FROM g${Similarity.NdRounds} ORDER BY vec_id, rank""".stripMargin,
    // graph-ANN SERVING over the same descent chain: bounded seeds →
    // BeamB keep → BeamHops unrolled expand/rescore/keep rounds over
    // the undirected graph; per-hop CTEs MATERIALIZE (each beam is
    // referenced three times by the next hop).
    "sim_graph_topk" -> graphServeOracle(0),
    // a second probe cohort over the SAME descent chain — the Spark
    // side serves both rows from one persisted index, so a drifted
    // (stale or mutated) index hash-mismatches here
    "sim_graph_topk2" -> graphServeOracle(2),
    // One row per val/test doc; the bucket join and cosine are the
    // dedup_embed chain, the split hash is sample_split's.
    "stats_split_leakage" -> {
      val h = md5Int("('split:' || CAST(vec_id AS VARCHAR))")
      s"""WITH $bucketedDynCte,
         |sb AS (SELECT vec_id, embedding, bucket, $h % 100 AS pct FROM b),
         |ev AS (SELECT vec_id AS eval_id, embedding AS ve, bucket, pct
         |       FROM sb WHERE pct >= ${Sampling.SplitTrainPct}),
         |tr AS (SELECT vec_id AS train_id, embedding AS vt, bucket
         |       FROM sb WHERE pct < ${Sampling.SplitTrainPct}),
         |cand AS (SELECT ev.eval_id, tr.train_id,
         |           ${cosU("ev.ve", "tr.vt")} AS cos_u
         |         FROM ev JOIN tr USING (bucket)),
         |best AS (SELECT eval_id, train_id, cos_u FROM cand
         |         QUALIFY row_number() OVER (PARTITION BY eval_id
         |           ORDER BY cos_u DESC, train_id) = 1),
         |nc AS (SELECT eval_id, CAST(COUNT(*) AS BIGINT) AS n_cands
         |       FROM cand GROUP BY 1)
         |SELECT ev.eval_id,
         |  CASE WHEN ev.pct < ${Sampling.SplitValPct} THEN 'val' ELSE 'test' END AS split,
         |  COALESCE(nc.n_cands, 0) AS n_cands,
         |  CAST(COALESCE(best.train_id, -1) AS BIGINT) AS best_train,
         |  CAST(COALESCE(best.cos_u, -1000000) AS BIGINT) AS max_cos_u
         |FROM ev LEFT JOIN best USING (eval_id) LEFT JOIN nc USING (eval_id)
         |ORDER BY ev.eval_id""".stripMargin
    },
    "stats_label_errors" ->
      s"""WITH $knnCtes,
         |kn AS (SELECT vec_id, nbr_id FROM r WHERE rank <= ${Similarity.KnnK}),
         |lv AS (SELECT kn.vec_id, CAST(e2.label AS BIGINT) AS nl
         |       FROM kn JOIN embeddings e2 ON kn.nbr_id = e2.vec_id),
         |vc AS (SELECT vec_id, nl, COUNT(*) AS c FROM lv GROUP BY 1, 2),
         |mj AS (SELECT vec_id, nl AS maj_label, CAST(c AS BIGINT) AS n_maj FROM vc
         |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, nl) = 1),
         |nnb AS (SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_nbrs FROM kn GROUP BY 1),
         |agr AS (SELECT lv.vec_id, CAST(COUNT(*) AS BIGINT) AS n_agree
         |        FROM lv JOIN embeddings l ON lv.vec_id = l.vec_id
         |        WHERE lv.nl = CAST(l.label AS BIGINT) GROUP BY 1)
         |SELECT emb.vec_id, CAST(emb.label AS BIGINT) AS label,
         |  CAST(COALESCE(nnb.n_nbrs, 0) AS BIGINT) AS n_nbrs,
         |  CAST(COALESCE(mj.maj_label, -1) AS BIGINT) AS maj_label,
         |  CAST(COALESCE(mj.n_maj, 0) AS BIGINT) AS n_maj,
         |  CAST(COALESCE(agr.n_agree, 0) AS BIGINT) AS n_agree,
         |  CAST(COALESCE(mj.maj_label, -1) <> CAST(emb.label AS BIGINT)
         |    AND COALESCE(mj.n_maj, 0) * 2 > COALESCE(nnb.n_nbrs, 0) AS BIGINT) AS flagged
         |FROM embeddings emb
         |LEFT JOIN nnb ON emb.vec_id = nnb.vec_id
         |LEFT JOIN mj ON emb.vec_id = mj.vec_id
         |LEFT JOIN agr ON emb.vec_id = agr.vec_id
         |ORDER BY emb.vec_id""".stripMargin,
    "sim_ivfpq_topk" -> ivfpqOracleWith(
      s"""top AS (
         |  SELECT probe_id, vec_id, adc_d,
         |    CAST(row_number() OVER (PARTITION BY probe_id
         |      ORDER BY adc_d, vec_id) AS BIGINT) AS rank
         |  FROM adc WHERE vec_id <> probe_id AND nm = ${Similarity.PqM}
         |  QUALIFY rank <= 5)
         |SELECT t.probe_id, t.rank, t.vec_id, t.adc_d,
         |  ${cosU("p2.pvec", "e.embedding")} AS cos_u
         |FROM top t JOIN embeddings e ON t.vec_id = e.vec_id
         |JOIN p p2 ON t.probe_id = p2.probe_id
         |ORDER BY t.probe_id, t.rank""".stripMargin),
    // the IVF-ADC stage verbatim, then the refine tail: exact cosine
    // on the ADC top-L shortlist, real top-5 of that
    "sim_ivfpq_refine" -> ivfpqOracleWith(
      s"""short AS (
         |  SELECT probe_id, vec_id,
         |    CAST(row_number() OVER (PARTITION BY probe_id
         |      ORDER BY adc_d, vec_id) AS BIGINT) AS adc_rank
         |  FROM adc WHERE vec_id <> probe_id AND nm = ${Similarity.PqM}
         |  QUALIFY adc_rank <= ${Similarity.PqRefineL}),
         |ex AS (
         |  SELECT s.probe_id, s.vec_id, s.adc_rank,
         |    ${cosU("p2.pvec", "e.embedding")} AS cos_u
         |  FROM short s JOIN embeddings e ON s.vec_id = e.vec_id
         |  JOIN p p2 ON s.probe_id = p2.probe_id)
         |SELECT probe_id,
         |  CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_u DESC, vec_id) AS BIGINT) AS rank,
         |  vec_id, adc_rank, cos_u
         |FROM ex QUALIFY rank <= 5 ORDER BY probe_id, rank""".stripMargin),
    "sim_pq_topk" -> {
      val d = Similarity.PqD
      def l2(a: String, b: String) =
        s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |  [(CAST(($a)[i] AS DOUBLE) - CAST(($b)[i] AS DOUBLE))
           |   * (CAST(($a)[i] AS DOUBLE) - CAST(($b)[i] AS DOUBLE)) for i in range(1, ${d + 1})]),
           |  (acc, v) -> acc + v)""".stripMargin
      def dotSubD(a: String, b: String) =
        s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |  [CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE) for i in range(1, ${d + 1})]),
           |  (acc, v) -> acc + v)""".stripMargin
      def selfSubD(a: String) = dotSubD(a, a)
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM embeddings),
         |cbm AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 57) r(g), nn
         |        WHERE (CAST(1 AS BIGINT) << g) * ${Similarity.PqKs} >= nn.n),
         |pmod AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 57) r(g), nn
         |         WHERE (CAST(1 AS BIGINT) << g) * 64 >= nn.n),
         |seeds AS (
         |  SELECT vec_id, embedding,
         |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cb_idx
         |  FROM embeddings, cbm WHERE vec_id % cbm.m = 0),
         |cb AS (
         |  SELECT CAST(mm.m AS BIGINT) AS m, s.cb_idx,
         |    s.embedding[mm.m*$d+1 : mm.m*$d+$d] AS cvec
         |  FROM seeds s, range(0, ${Similarity.PqM}) mm(m)),
         |cbn AS (SELECT m, cb_idx, cvec, ${selfSubD("cvec")} AS cn2 FROM cb),
         |subs AS (
         |  SELECT vec_id, CAST(mm.m AS BIGINT) AS m,
         |    embedding[mm.m*$d+1 : mm.m*$d+$d] AS svec
         |  FROM embeddings, range(0, ${Similarity.PqM}) mm(m)),
         |dists AS (
         |  SELECT vec_id, s.m, cb_idx,
         |    CAST(FLOOR(${l2("svec", "cvec")} * 1000000.0) AS BIGINT) AS du
         |  FROM subs s JOIN cbn ON s.m = cbn.m),
         |codes AS (
         |  SELECT vec_id, m, CAST(MIN(du * ${Similarity.PqKs} + cb_idx) % ${Similarity.PqKs} AS BIGINT) AS cb_idx
         |  FROM dists GROUP BY 1, 2),
         |prn AS (
         |  SELECT vec_id AS probe_id, embedding AS pvec,
         |    ${dotD("embedding", "embedding")} AS pn2
         |  FROM embeddings, pmod WHERE vec_id % pmod.m = 0),
         |lut AS (
         |  SELECT probe_id, pn2, cbn.m, cbn.cb_idx,
         |    CAST(FLOOR(${dotSubD(s"pvec[cbn.m*$d+1 : cbn.m*$d+$d]", "cvec")} * 1000000000.0) AS BIGINT) AS pdot_su,
         |    CAST(FLOOR(cn2 * 1000000000.0) AS BIGINT) AS cn2_su
         |  FROM prn, cbn),
         |adc AS (
         |  SELECT probe_id, vec_id,
         |    CAST(SUM(pdot_su) AS BIGINT) AS adc_su,
         |    CAST(SUM(cn2_su) AS BIGINT) AS vhat_su,
         |    MAX(pn2) AS pn2
         |  FROM codes JOIN lut USING (m, cb_idx) GROUP BY 1, 2),
         |sc AS (
         |  SELECT probe_id, vec_id,
         |    CAST(CASE WHEN vhat_su > 0 THEN
         |      FLOOR(CAST(adc_su AS DOUBLE) / 1000000000.0
         |        / (sqrt(pn2) * sqrt(CAST(vhat_su AS DOUBLE) / 1000000000.0))
         |        * 1000000.0) ELSE 0 END AS BIGINT) AS adc_u
         |  FROM adc WHERE vec_id <> probe_id),
         |rk AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY adc_u DESC, vec_id) AS BIGINT) AS rank FROM sc),
         |top AS (SELECT * FROM rk WHERE rank <= 5)
         |SELECT t.probe_id, t.rank, t.vec_id, t.adc_u,
         |  ${cosU("prn.pvec", "e.embedding")} AS cos_u
         |FROM top t JOIN embeddings e ON t.vec_id = e.vec_id
         |JOIN prn ON t.probe_id = prn.probe_id
         |ORDER BY t.probe_id, t.rank""".stripMargin
    },
    // the ADC stage verbatim from sim_pq_topk, then the refine tail:
    // exact cosine on the ADC top-L shortlist, real top-5 of that
    "sim_pq_refine" -> {
      val d = Similarity.PqD
      def l2(a: String, b: String) =
        s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |  [(CAST(($a)[i] AS DOUBLE) - CAST(($b)[i] AS DOUBLE))
           |   * (CAST(($a)[i] AS DOUBLE) - CAST(($b)[i] AS DOUBLE)) for i in range(1, ${d + 1})]),
           |  (acc, v) -> acc + v)""".stripMargin
      def dotSubD(a: String, b: String) =
        s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |  [CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE) for i in range(1, ${d + 1})]),
           |  (acc, v) -> acc + v)""".stripMargin
      def selfSubD(a: String) = dotSubD(a, a)
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM embeddings),
         |cbm AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 57) r(g), nn
         |        WHERE (CAST(1 AS BIGINT) << g) * ${Similarity.PqKs} >= nn.n),
         |pmod AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 57) r(g), nn
         |         WHERE (CAST(1 AS BIGINT) << g) * 64 >= nn.n),
         |seeds AS (
         |  SELECT vec_id, embedding,
         |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cb_idx
         |  FROM embeddings, cbm WHERE vec_id % cbm.m = 0),
         |cb AS (
         |  SELECT CAST(mm.m AS BIGINT) AS m, s.cb_idx,
         |    s.embedding[mm.m*$d+1 : mm.m*$d+$d] AS cvec
         |  FROM seeds s, range(0, ${Similarity.PqM}) mm(m)),
         |cbn AS (SELECT m, cb_idx, cvec, ${selfSubD("cvec")} AS cn2 FROM cb),
         |subs AS (
         |  SELECT vec_id, CAST(mm.m AS BIGINT) AS m,
         |    embedding[mm.m*$d+1 : mm.m*$d+$d] AS svec
         |  FROM embeddings, range(0, ${Similarity.PqM}) mm(m)),
         |dists AS (
         |  SELECT vec_id, s.m, cb_idx,
         |    CAST(FLOOR(${l2("svec", "cvec")} * 1000000.0) AS BIGINT) AS du
         |  FROM subs s JOIN cbn ON s.m = cbn.m),
         |codes AS (
         |  SELECT vec_id, m, CAST(MIN(du * ${Similarity.PqKs} + cb_idx) % ${Similarity.PqKs} AS BIGINT) AS cb_idx
         |  FROM dists GROUP BY 1, 2),
         |prn AS (
         |  SELECT vec_id AS probe_id, embedding AS pvec,
         |    ${dotD("embedding", "embedding")} AS pn2
         |  FROM embeddings, pmod WHERE vec_id % pmod.m = 0),
         |lut AS (
         |  SELECT probe_id, pn2, cbn.m, cbn.cb_idx,
         |    CAST(FLOOR(${dotSubD(s"pvec[cbn.m*$d+1 : cbn.m*$d+$d]", "cvec")} * 1000000000.0) AS BIGINT) AS pdot_su,
         |    CAST(FLOOR(cn2 * 1000000000.0) AS BIGINT) AS cn2_su
         |  FROM prn, cbn),
         |adc AS (
         |  SELECT probe_id, vec_id,
         |    CAST(SUM(pdot_su) AS BIGINT) AS adc_su,
         |    CAST(SUM(cn2_su) AS BIGINT) AS vhat_su,
         |    MAX(pn2) AS pn2
         |  FROM codes JOIN lut USING (m, cb_idx) GROUP BY 1, 2),
         |sc AS (
         |  SELECT probe_id, vec_id,
         |    CAST(CASE WHEN vhat_su > 0 THEN
         |      FLOOR(CAST(adc_su AS DOUBLE) / 1000000000.0
         |        / (sqrt(pn2) * sqrt(CAST(vhat_su AS DOUBLE) / 1000000000.0))
         |        * 1000000.0) ELSE 0 END AS BIGINT) AS adc_u
         |  FROM adc WHERE vec_id <> probe_id),
         |short AS (
         |  SELECT probe_id, vec_id,
         |    CAST(row_number() OVER (PARTITION BY probe_id
         |      ORDER BY adc_u DESC, vec_id) AS BIGINT) AS adc_rank FROM sc
         |  QUALIFY adc_rank <= ${Similarity.PqRefineL}),
         |ex AS (
         |  SELECT s.probe_id, s.vec_id, s.adc_rank,
         |    ${cosU("prn.pvec", "e.embedding")} AS cos_u
         |  FROM short s JOIN embeddings e ON s.vec_id = e.vec_id
         |  JOIN prn ON s.probe_id = prn.probe_id)
         |SELECT probe_id,
         |  CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_u DESC, vec_id) AS BIGINT) AS rank,
         |  vec_id, adc_rank, cos_u
         |FROM ex QUALIFY rank <= 5 ORDER BY probe_id, rank""".stripMargin
    },
    // unit-scale int8 quantization, integer-dot shortlist, exact
    // cosine refine — the float chain (x·127/sqrt(n2)+0.5) shared
    // left-associated with the engine's sqVec
    "sim_sq_topk" ->
      s"""WITH n AS (SELECT vec_id, embedding,
         |    ${dotD("embedding", "embedding")} AS n2 FROM embeddings),
         |qv AS (SELECT vec_id, embedding, n2,
         |    CASE WHEN n2 > 0 THEN
         |      [CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 127.0 / sqrt(n2)
         |        + 0.5) AS BIGINT) for i in range(1, 65)]
         |    ELSE [CAST(0 AS BIGINT) for i in range(1, 65)] END AS q
         |  FROM n),
         |p AS (SELECT vec_id AS probe_id, embedding AS pvec, q AS pq
         |      FROM qv WHERE vec_id % 101 = 0),
         |sc AS (SELECT p.probe_id, e.vec_id, e.embedding, p.pvec,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      [e.q[i] * p.pq[i] for i in range(1, 65)]),
         |      (a, v) -> a + v) AS sq_dot
         |  FROM qv e, p WHERE e.vec_id != p.probe_id),
         |short AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY sq_dot DESC, vec_id) AS BIGINT) AS sq_rank FROM sc
         |  QUALIFY sq_rank <= ${Similarity.SqL}),
         |ex AS (SELECT probe_id, vec_id, sq_rank,
         |    ${cosU("pvec", "embedding")} AS cos_u FROM short)
         |SELECT probe_id,
         |  CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_u DESC, vec_id) AS BIGINT) AS rank,
         |  vec_id, sq_rank, cos_u
         |FROM ex QUALIFY rank <= 5 ORDER BY probe_id, rank""".stripMargin,
    "sim_brute_topk" ->
      s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pvec
         |           FROM embeddings WHERE vec_id % 101 = 0),
         |s AS (SELECT p.probe_id, e.vec_id, ${cosU("p.pvec", "e.embedding")} AS cos_u
         |      FROM embeddings e, p WHERE e.vec_id != p.probe_id)
         |SELECT probe_id, vec_id, cos_u,
         |  CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos_u DESC, vec_id) AS BIGINT) AS rank
         |FROM s QUALIFY rank <= 5 ORDER BY probe_id, rank""".stripMargin,
    "sim_range_search" ->
      s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pvec
         |           FROM embeddings WHERE vec_id % 101 = 0),
         |s AS (SELECT p.probe_id, e.vec_id, ${cosU("p.pvec", "e.embedding")} AS cos_u
         |      FROM embeddings e, p WHERE e.vec_id != p.probe_id)
         |SELECT probe_id, vec_id, cos_u FROM s
         |WHERE cos_u >= ${Similarity.RangeTauU}
         |ORDER BY probe_id, vec_id""".stripMargin,
    // sf1.0-survivable restatement (the graph_scc lesson): the ONE
    // corpus-scale stage — the probes × n relevance scan — emits a
    // NARROW (probe_id, vec_id, rel_u) frame (the r11 form carried
    // the 64-float embedding array through it: ~13 GB at sf1.0, and
    // the unmaterialized cand/sel chain re-expanded it per round →
    // 80+GB DuckDB spill). Embeddings re-join only onto the bounded
    // shortlist (probes × MmrShortlist rows), and every per-round CTE
    // MATERIALIZEs so the greedy chain is computed once, linearly.
    "sim_mmr_topk" -> {
      val rounds = (2 to Similarity.MmrK).map { r =>
        s"""ms$r AS MATERIALIZED (
           |  SELECT c.probe_id, c.vec_id, MAX(${cosU("c.embedding", "s.embedding")}) AS maxsim_u
           |  FROM cand${r - 1} c JOIN sel${r - 1} s ON c.probe_id = s.probe_id
           |  GROUP BY 1, 2),
           |pick$r AS MATERIALIZED (
           |  SELECT c.probe_id, c.vec_id, c.embedding, c.rel_u,
           |    c.rel_u - m.maxsim_u AS mmr_u, CAST($r AS BIGINT) AS pick
           |  FROM cand${r - 1} c JOIN ms$r m ON c.probe_id = m.probe_id AND c.vec_id = m.vec_id
           |  QUALIFY row_number() OVER (PARTITION BY c.probe_id ORDER BY mmr_u DESC, c.vec_id) = 1),
           |sel$r AS MATERIALIZED (SELECT * FROM sel${r - 1} UNION ALL SELECT * FROM pick$r),
           |cand$r AS MATERIALIZED (
           |  SELECT c.* FROM cand${r - 1} c
           |  WHERE NOT EXISTS (SELECT 1 FROM pick$r p
           |                    WHERE p.probe_id = c.probe_id AND p.vec_id = c.vec_id))""".stripMargin
      }.mkString(",\n")
      s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pvec
         |           FROM embeddings WHERE vec_id % 101 = 0),
         |sn AS MATERIALIZED (
         |  SELECT probe_id, vec_id, rel_u FROM (
         |    SELECT p.probe_id, e.vec_id,
         |      ${cosU("p.pvec", "e.embedding")} AS rel_u
         |    FROM embeddings e, p WHERE e.vec_id != p.probe_id)
         |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY rel_u DESC, vec_id)
         |    <= ${Similarity.MmrShortlist}),
         |short AS MATERIALIZED (
         |  SELECT sn.probe_id, sn.vec_id, e.embedding, sn.rel_u
         |  FROM sn JOIN embeddings e USING (vec_id)),
         |sel1 AS MATERIALIZED (
         |  SELECT probe_id, vec_id, embedding, rel_u, rel_u AS mmr_u,
         |    CAST(1 AS BIGINT) AS pick
         |  FROM short
         |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY rel_u DESC, vec_id) = 1),
         |cand1 AS MATERIALIZED (SELECT s.* FROM short s
         |  WHERE NOT EXISTS (SELECT 1 FROM sel1 p
         |                    WHERE p.probe_id = s.probe_id AND p.vec_id = s.vec_id)),
         |$rounds
         |SELECT probe_id, pick, vec_id, rel_u, mmr_u
         |FROM sel${Similarity.MmrK} ORDER BY probe_id, pick""".stripMargin
    },
    "sim_lsh_topk" -> {
      // The ±1 sparse-plane coefficients are the SAME plan-time
      // constants Similarity.lshBuckets broadcasts (Similarity
      // .lshPlane); each bit is an exact-INTEGER sign test
      // Σ sign·⌊x·10⁶⌋ > 0, so the engines agree bit-for-bit with no
      // fold-order contract ([[lshPlaneSql]]/[[lshBucketSql]]).
      val tables = lshTablesSql
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM embeddings),
         |bmod AS (SELECT COALESCE(MIN(CAST(1 AS BIGINT) << g),
         |                CAST(1 AS BIGINT) << ${Similarity.LshMaxBits}) AS m
         |         FROM range(${Similarity.LshMinBits}, ${Similarity.LshMaxBits + 1}) r(g), nn
         |         WHERE (CAST(1 AS BIGINT) << g) * ${Similarity.LshPerBucket} >= nn.n),
         |pmod AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 57) r(g), nn
         |         WHERE (CAST(1 AS BIGINT) << g) * 64 >= nn.n),
         |btf AS (
         |  $tables),
         |bt AS (SELECT vec_id, embedding, t, fullb % bmod.m AS bucket FROM btf, bmod),
         |p AS (SELECT t, bucket, vec_id AS probe_id, embedding AS pvec
         |      FROM bt, pmod WHERE vec_id % pmod.m = 0),
         |cand AS (
         |  SELECT DISTINCT p.probe_id, p.pvec, e.vec_id, e.embedding
         |  FROM bt e JOIN p ON e.t = p.t AND e.bucket = p.bucket
         |  WHERE e.vec_id != p.probe_id),
         |s AS (SELECT probe_id, vec_id, ${cosU("pvec", "embedding")} AS cos_u FROM cand)
         |SELECT probe_id, vec_id, cos_u,
         |  CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos_u DESC, vec_id) AS BIGINT) AS rank
         |FROM s QUALIFY rank <= 5 ORDER BY probe_id, rank""".stripMargin
    },
    // Ground truth, both index chains, and the recall join in ONE
    // statement: gt = exact top-5 over the shared bounded probe set,
    // l* = the sim_lsh_topk chain, i* = the sim_ivf_topk chain (both
    // verbatim up to CTE prefixes), hits = membership joins.
    "sim_recall_eval" ->
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM embeddings),
         |pmod AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 57) r(g), nn
         |         WHERE (CAST(1 AS BIGINT) << g) * 64 >= nn.n),
         |xp AS (SELECT vec_id AS probe_id, embedding AS pvec
         |       FROM embeddings, pmod WHERE vec_id % pmod.m = 0),
         |xs AS (SELECT xp.probe_id, e.vec_id, ${cosU("xp.pvec", "e.embedding")} AS cos_u
         |       FROM embeddings e, xp WHERE e.vec_id != xp.probe_id),
         |gt AS (SELECT probe_id, vec_id FROM xs
         |       QUALIFY row_number() OVER (PARTITION BY probe_id
         |         ORDER BY cos_u DESC, vec_id) <= 5),
         |lbmod AS (SELECT COALESCE(MIN(CAST(1 AS BIGINT) << g),
         |                 CAST(1 AS BIGINT) << ${Similarity.LshMaxBits}) AS m
         |          FROM range(${Similarity.LshMinBits}, ${Similarity.LshMaxBits + 1}) r(g), nn
         |          WHERE (CAST(1 AS BIGINT) << g) * ${Similarity.LshPerBucket} >= nn.n),
         |lbtf AS (
         |  $lshTablesSql),
         |lbt AS (SELECT vec_id, embedding, t, fullb % lbmod.m AS bucket FROM lbtf, lbmod),
         |lp AS (SELECT t, bucket, vec_id AS probe_id, embedding AS pvec
         |       FROM lbt, pmod WHERE vec_id % pmod.m = 0),
         |lcand AS (
         |  SELECT DISTINCT lp.probe_id, lp.pvec, e.vec_id, e.embedding
         |  FROM lbt e JOIN lp ON e.t = lp.t AND e.bucket = lp.bucket
         |  WHERE e.vec_id != lp.probe_id),
         |ltop AS (SELECT probe_id, vec_id FROM (
         |    SELECT probe_id, vec_id, ${cosU("pvec", "embedding")} AS cos_u FROM lcand)
         |  QUALIFY row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_u DESC, vec_id) <= 5),
         |cmod AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 32) r(g), nn
         |         WHERE (CAST(1 AS BIGINT) << g) * (CAST(1 AS BIGINT) << g) >= nn.n),
         |ic AS (SELECT vec_id AS cent_id, embedding AS cvec
         |       FROM embeddings, cmod WHERE vec_id % cmod.m = 0),
         |iasg AS (SELECT e.vec_id, e.embedding, ic.cent_id,
         |           ${cosU("e.embedding", "ic.cvec")} AS ccos
         |         FROM embeddings e, ic),
         |icell AS (SELECT vec_id, embedding, cent_id AS cell FROM iasg
         |          QUALIFY row_number() OVER (PARTITION BY vec_id
         |            ORDER BY ccos DESC, cent_id) = 1),
         |ipcell AS (SELECT probe_id, pvec, cent_id AS cell FROM (
         |    SELECT xp.probe_id, xp.pvec, ic.cent_id,
         |      ${cosU("xp.pvec", "ic.cvec")} AS pcos FROM xp, ic)
         |  QUALIFY row_number() OVER (PARTITION BY probe_id
         |    ORDER BY pcos DESC, cent_id) <= 2),
         |itop AS (SELECT probe_id, vec_id FROM (
         |    SELECT pc.probe_id, a.vec_id, ${cosU("pc.pvec", "a.embedding")} AS cos_u
         |    FROM icell a JOIN ipcell pc ON a.cell = pc.cell
         |    WHERE a.vec_id != pc.probe_id)
         |  QUALIFY row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_u DESC, vec_id) <= 5)
         |SELECT gt.probe_id,
         |  CAST(COUNT(lt.vec_id) AS BIGINT) AS hits_lsh,
         |  CAST(COUNT(lt.vec_id) * 100 // 5 AS BIGINT) AS recall_lsh_pct,
         |  CAST(COUNT(it.vec_id) AS BIGINT) AS hits_ivf,
         |  CAST(COUNT(it.vec_id) * 100 // 5 AS BIGINT) AS recall_ivf_pct
         |FROM gt
         |LEFT JOIN ltop lt ON gt.probe_id = lt.probe_id AND gt.vec_id = lt.vec_id
         |LEFT JOIN itop it ON gt.probe_id = it.probe_id AND gt.vec_id = it.vec_id
         |GROUP BY gt.probe_id ORDER BY gt.probe_id""".stripMargin,
    // The oracle is the FULL REBUILD: every vector assigned from
    // scratch to the frozen base-derived centroids. The engine only
    // scores the new batch and unions the persisted base rows, so a
    // hash match certifies incremental merge == full rebuild.
    "sim_index_refresh" -> {
      val m = Similarity.RefreshNewMod
      s"""WITH nb AS (SELECT COUNT(*) AS n FROM embeddings WHERE vec_id % $m != 0),
         |cmod AS (SELECT MIN(CAST(1 AS BIGINT) << g) AS m FROM range(0, 32) r(g), nb
         |         WHERE (CAST(1 AS BIGINT) << g) * (CAST(1 AS BIGINT) << g) >= nb.n),
         |c AS (SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings, cmod
         |      WHERE vec_id % $m != 0 AND vec_id % cmod.m = 0),
         |asg AS (SELECT e.vec_id, c.cent_id, ${cosU("e.embedding", "c.cvec")} AS ccos
         |        FROM embeddings e, c)
         |SELECT vec_id, cent_id AS cell, CAST(vec_id % $m = 0 AS BIGINT) AS is_new
         |FROM asg
         |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) = 1
         |ORDER BY vec_id""".stripMargin
    },
    "sim_ivf_topk" ->
      s"""WITH $ivfModsCte,
         |asg AS (
         |  SELECT e.vec_id, e.embedding, c.cent_id,
         |         ${cosU("e.embedding", "c.cvec")} AS ccos
         |  FROM embeddings e, c),
         |cell AS (
         |  SELECT vec_id, embedding, cent_id AS cell FROM asg
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) = 1),
         |pcell AS (
         |  SELECT probe_id, pvec, cent_id AS cell FROM (
         |    SELECT p.probe_id, p.pvec, c.cent_id, ${cosU("p.pvec", "c.cvec")} AS pcos FROM p, c)
         |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY pcos DESC, cent_id) <= 2),
         |s AS (
         |  SELECT pc.probe_id, a.vec_id, a.cell, ${cosU("pc.pvec", "a.embedding")} AS cos_u
         |  FROM cell a JOIN pcell pc ON a.cell = pc.cell WHERE a.vec_id != pc.probe_id)
         |SELECT probe_id, vec_id, cell, cos_u,
         |  CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos_u DESC, vec_id) AS BIGINT) AS rank
         |FROM s QUALIFY rank <= 5 ORDER BY probe_id, rank""".stripMargin,
    "sim_filtered_topk" ->
      s"""WITH $ivfModsCte,
         |asg AS (
         |  SELECT e.vec_id, e.embedding, CAST(e.label AS BIGINT) AS label, c.cent_id,
         |         ${cosU("e.embedding", "c.cvec")} AS ccos
         |  FROM embeddings e, c),
         |cell AS (
         |  SELECT vec_id, embedding, label, cent_id AS cell FROM asg
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) = 1),
         |pl AS (SELECT vec_id AS probe_id, CAST(label AS BIGINT) AS plabel
         |       FROM embeddings, pmod WHERE vec_id % pmod.m = 0),
         |pcell AS (
         |  SELECT probe_id, pvec, cent_id AS cell FROM (
         |    SELECT p.probe_id, p.pvec, c.cent_id, ${cosU("p.pvec", "c.cvec")} AS pcos FROM p, c)
         |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY pcos DESC, cent_id) <= 2),
         |s AS (
         |  SELECT pc.probe_id, a.vec_id, a.cell, a.label,
         |         ${cosU("pc.pvec", "a.embedding")} AS cos_u
         |  FROM cell a JOIN pcell pc ON a.cell = pc.cell
         |  JOIN pl ON pc.probe_id = pl.probe_id
         |  WHERE a.vec_id != pc.probe_id AND a.label = pl.plabel)
         |SELECT probe_id, vec_id, cell, label, cos_u,
         |  CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos_u DESC, vec_id) AS BIGINT) AS rank
         |FROM s QUALIFY rank <= 5 ORDER BY probe_id, rank""".stripMargin,
    "sim_ivf_kmeans" -> {
      // One CTE triple per Lloyd round (the graph_pagerank unroll
      // pattern): integer per-cell means -> micro-int centroids ->
      // re-assignment. Round r reads cell{r-1}; probes score against
      // the FINAL round's centroids.
      val R = Similarity.LloydRounds
      val roundCtes = (1 to R).map { r =>
        val prev = s"cell${r - 1}"
        s"""dims$r AS (
           |  SELECT $prev.cell, x.pos, CAST(SUM(x.xq) // COUNT(*) AS BIGINT) AS dimq
           |  FROM x JOIN $prev USING (vec_id) GROUP BY $prev.cell, x.pos),
           |cq$r AS (SELECT cell AS cent_id, list(dimq ORDER BY pos) AS cvecq FROM dims$r GROUP BY cell),
           |asgq$r AS (
           |  SELECT e.vec_id, e.embedding, cq$r.cent_id, ${cosUQ("e.embedding", s"cq$r.cvecq")} AS ccos
           |  FROM embeddings e, cq$r),
           |cell$r AS (
           |  SELECT vec_id, embedding, cent_id AS cell FROM asgq$r
           |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) = 1)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH $ivfModsCte,
         |asg AS (
         |  SELECT e.vec_id, c.cent_id, ${cosU("e.embedding", "c.cvec")} AS ccos
         |  FROM embeddings e, c),
         |cell0 AS (
         |  SELECT vec_id, cent_id AS cell FROM asg
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) = 1),
         |x AS (
         |  SELECT vec_id, CAST(i AS BIGINT) AS pos,
         |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * CAST(1e6 AS DOUBLE)) AS BIGINT) AS xq
         |  FROM embeddings, range(1, 65) r(i)),
         |$roundCtes,
         |pcell AS (
         |  SELECT probe_id, pvec, cent_id AS cell FROM (
         |    SELECT p.probe_id, p.pvec, cq$R.cent_id, ${cosUQ("p.pvec", s"cq$R.cvecq")} AS pcos
         |    FROM p, cq$R)
         |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY pcos DESC, cent_id) <= 2),
         |s AS (
         |  SELECT pc.probe_id, a.vec_id, a.cell, ${cosU("pc.pvec", "a.embedding")} AS cos_u
         |  FROM cell$R a JOIN pcell pc ON a.cell = pc.cell WHERE a.vec_id != pc.probe_id)
         |SELECT probe_id, vec_id, cell, cos_u,
         |  CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos_u DESC, vec_id) AS BIGINT) AS rank
         |FROM s QUALIFY rank <= 5 ORDER BY probe_id, rank""".stripMargin
    },
    // PNG is lossless, so the features extracted from the DECODED
    // raster are predictable from the text alone: pixel i = code
    // point i mod 256 (0 past the end). A hash-green row therefore
    // certifies a real encode→bytes→decode identity through the JDK
    // codec. All-integer features — no float drift.
    "mm_decode_png" -> {
      val edge = Multimodal.PngEdge
      s"""WITH px AS (
         |  SELECT doc_id, r.i,
         |    CASE WHEN length(text) > r.i
         |         THEN ascii(substr(text, CAST(r.i + 1 AS INT), 1)) % 256
         |         ELSE 0 END AS p
         |  FROM documents, range(0, ${edge * edge}) r(i))
         |SELECT doc_id, CAST($edge AS BIGINT) AS width,
         |  CAST($edge AS BIGINT) AS height,
         |  CAST((1000000 * SUM(p)) // ${edge * edge} AS BIGINT) AS mean_u,
         |  CAST(SUM((r_i_plus_1) * p) AS BIGINT) AS px_checksum
         |FROM (SELECT doc_id, i + 1 AS r_i_plus_1, p FROM px)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "mm_phash" ->
      s"""WITH $phashPairCtes
         |SELECT doc_a, doc_b, hamming FROM
         |  (SELECT * FROM crossp UNION ALL SELECT * FROM intra)
         |ORDER BY doc_a, doc_b""".stripMargin,
    // the image-family canonicalization shares the phash pair chain;
    // the closure is the dedup_cluster recursive-CTE pattern
    "mm_phash_cluster" ->
      s"""WITH RECURSIVE $phashPairCtes,
         |pr AS (SELECT doc_a, doc_b FROM crossp
         |       UNION ALL SELECT doc_a, doc_b FROM intra),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM pr
         |      UNION ALL SELECT doc_b, doc_a FROM pr),
         |reach(doc, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.src, r.lbl FROM reach r JOIN e ON r.doc = e.dst),
         |mm AS (SELECT doc, CAST(MIN(lbl) AS BIGINT) AS cluster FROM reach GROUP BY doc),
         |cs AS (SELECT cluster, COUNT(*) AS cluster_size FROM mm GROUP BY cluster)
         |SELECT mm.doc AS doc_id, mm.cluster, cs.cluster_size
         |FROM mm JOIN cs USING (cluster) ORDER BY doc_id""".stripMargin,
    "mm_decode_wav" -> {
      val n = Multimodal.WavSamples
      s"""WITH smp AS (
         |  SELECT doc_id, r.i,
         |    CASE WHEN length(text) > r.i
         |         THEN (ascii(substr(text, CAST(r.i + 1 AS INT), 1)) % 256) * 257 - 32768
         |         ELSE 0 END AS s
         |  FROM documents, range(0, $n) r(i))
         |SELECT doc_id, CAST($n AS BIGINT) AS n_samples,
         |  CAST(${Multimodal.WavRate} AS BIGINT) AS sample_rate,
         |  CAST(SUM(s) AS BIGINT) AS sum_s,
         |  CAST(SUM((i + 1) * s) AS BIGINT) AS s_checksum,
         |  CAST(MAX(ABS(s)) AS BIGINT) AS peak
         |FROM smp GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "mm_audio_feats" -> {
      val n = Multimodal.WavSamples
      val fl = Multimodal.WavFrameLen
      s"""WITH smp AS (
         |  SELECT doc_id, r.i,
         |    CASE WHEN length(text) > r.i
         |         THEN (ascii(substr(text, CAST(r.i + 1 AS INT), 1)) % 256) * 257 - 32768
         |         ELSE 0 END AS s
         |  FROM documents, range(0, $n) r(i)),
         |f AS (
         |  SELECT doc_id, CAST(i // $fl AS BIGINT) AS frame_id, i, s,
         |    lag(s) OVER (PARTITION BY doc_id, i // $fl ORDER BY i) AS prev
         |  FROM smp)
         |SELECT doc_id, frame_id, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(s * s) AS BIGINT) AS energy,
         |  CAST(SUM(CASE WHEN prev IS NOT NULL AND prev * s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zcr,
         |  CAST(MAX(ABS(s)) AS BIGINT) AS peak,
         |  CAST(SUM(s) AS BIGINT) AS sum_s
         |FROM f GROUP BY doc_id, frame_id ORDER BY doc_id, frame_id""".stripMargin
    },
    // activity segmentation over the same frame chain: exact-integer
    // mean comparison (energy·n > Σ) + lag/island run collapse
    "mm_vad" -> {
      val n = Multimodal.WavSamples
      val fl = Multimodal.WavFrameLen
      s"""WITH smp AS (
         |  SELECT doc_id, r.i,
         |    CASE WHEN length(text) > r.i
         |         THEN (ascii(substr(text, CAST(r.i + 1 AS INT), 1)) % 256) * 257 - 32768
         |         ELSE 0 END AS s
         |  FROM documents, range(0, $n) r(i)),
         |f AS (
         |  SELECT doc_id, CAST(i // $fl AS BIGINT) AS frame_id,
         |    CAST(SUM(s * s) AS BIGINT) AS energy
         |  FROM smp GROUP BY 1, 2),
         |a AS (
         |  SELECT *, CAST(CASE WHEN energy * COUNT(*) OVER (PARTITION BY doc_id)
         |      > SUM(energy) OVER (PARTITION BY doc_id) THEN 1 ELSE 0 END AS BIGINT)
         |    AS active
         |  FROM f),
         |c AS (
         |  SELECT *, CASE WHEN lag(active) OVER w IS NULL
         |      OR lag(active) OVER w <> active THEN 1 ELSE 0 END AS changed
         |  FROM a WINDOW w AS (PARTITION BY doc_id ORDER BY frame_id)),
         |isl AS (
         |  SELECT *, CAST(SUM(changed) OVER (PARTITION BY doc_id ORDER BY frame_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
         |  FROM c),
         |seg AS (
         |  SELECT doc_id, island, MIN(frame_id) AS start_frame,
         |    CAST(COUNT(*) AS BIGINT) AS n_frames,
         |    CAST(SUM(energy) AS BIGINT) AS sum_energy
         |  FROM isl WHERE active = 1 GROUP BY 1, 2)
         |SELECT doc_id,
         |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_frame)
         |    AS BIGINT) AS seg_id,
         |  start_frame, n_frames, sum_energy
         |FROM seg ORDER BY doc_id, seg_id""".stripMargin
    },
    "mm_decode_jp2" -> {
      val n = Multimodal.Jp2Edge * Multimodal.Jp2Edge
      s"""WITH px AS (
         |  SELECT doc_id, r.i,
         |    CASE WHEN length(text) > r.i
         |         THEN (ascii(substr(text, CAST(r.i + 1 AS INT), 1)) % 256) * 257
         |         ELSE 0 END AS p
         |  FROM documents, range(0, $n) r(i))
         |SELECT doc_id, CAST(${Multimodal.Jp2Edge} AS BIGINT) AS width,
         |  CAST(${Multimodal.Jp2Edge} AS BIGINT) AS height,
         |  CAST(SUM(p) AS BIGINT) AS sum_p,
         |  CAST(SUM((i + 1) * p) AS BIGINT) AS p_checksum,
         |  CAST(MAX(p) AS BIGINT) AS peak
         |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "mm_pack" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |lower(hex(encode(substr(text, 1, 8)))) AS head_hex,
        |source AS kind, md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_meta_extract" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |lower(hex(encode(substr(text, 1, 4)))) AS magic_hex, md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      """WITH d AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
        |    GREATEST(1, CAST(length(text) AS BIGINT) // 32) AS stride
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n, stride,
        |    array_to_string([substr(text, CAST(i * stride + 1 AS INT), 1) for i in range(0, 32)], '') AS resized
        |  FROM d)
        |SELECT doc_id, n, stride, resized, md5(resized) AS resized_md5
        |FROM r ORDER BY doc_id""".stripMargin,
    "mm_patchify" ->
      """WITH g AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
        |            gg % 4 AS px, gg // 4 AS py
        |          FROM documents, range(0, 8) r(gg)),
        |f AS (SELECT doc_id, px, py, text FROM g
        |      WHERE n >= (py * 4 + 3) * 16 + px * 4 + 4),
        |p AS (SELECT doc_id, px, py,
        |        array_to_string([substr(text, CAST((py * 4 + r) * 16 + px * 4 + 1 AS INT), 4)
        |                         for r in range(0, 4)], '') AS patch
        |      FROM f)
        |SELECT doc_id, CAST(px AS BIGINT) AS px, CAST(py AS BIGINT) AS py, patch,
        |  CAST(list_reduce(list_prepend(0, [ascii(substr(patch, i, 1))
        |    for i in range(1, len(patch) + 1)]), (a, x) -> a + x) AS BIGINT) AS cp_sum
        |FROM p ORDER BY doc_id, py, px""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, CAST(f.frame_idx AS BIGINT) AS frame_idx,
        |lower(hex(encode(substr(text, CAST(f.frame_idx * 32 + 1 AS INT), 16)))) AS frame_hex
        |FROM documents, range(0, 4) f(frame_idx)
        |WHERE CAST(octet_length(encode(text)) AS BIGINT) >= f.frame_idx * 32 + 16
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_scene_detect" -> {
      val hv = (c: String) =>
        s"(strpos('0123456789abcdef', substr($c, CAST(p AS INT), 1)) - 1)"
      s"""WITH fr AS (
         |  SELECT doc_id, CAST(f.frame_idx AS BIGINT) AS frame_idx,
         |    lower(hex(encode(substr(text, CAST(f.frame_idx * 32 + 1 AS INT), 16)))) AS h
         |  FROM documents, range(0, ${Multimodal.SceneFrames}) f(frame_idx)
         |  WHERE CAST(octet_length(encode(text)) AS BIGINT) >= f.frame_idx * 32 + 16),
         |wp AS (SELECT doc_id, frame_idx, h,
         |        LAG(h) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS hp FROM fr),
         |df AS (
         |  SELECT doc_id, frame_idx, (hp IS NOT NULL) AS has_prev,
         |    COALESCE(SUM(ABS(${hv("h")} - ${hv("hp")})), 0) AS d
         |  FROM wp, range(1, 33) r(p)
         |  GROUP BY doc_id, frame_idx, hp IS NOT NULL),
         |ct AS (SELECT doc_id, frame_idx,
         |        CAST(has_prev AND d >= ${Multimodal.SceneTau} AS BIGINT) AS cut FROM df),
         |sc AS (SELECT doc_id, frame_idx, cut,
         |        SUM(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scene_id FROM ct),
         |sl AS (SELECT doc_id, scene_id, CAST(COUNT(*) AS BIGINT) AS scene_len,
         |        CAST(SUM(cut) AS BIGINT) AS sc_cuts FROM sc GROUP BY 1, 2),
         |ag AS (SELECT doc_id, SUM(scene_len) AS n_frames, SUM(sc_cuts) AS n_cuts,
         |        CAST(COUNT(*) AS BIGINT) AS n_scenes, MAX(scene_len) AS max_scene_len
         |       FROM sl GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(COALESCE(ag.n_frames, 0) AS BIGINT) AS n_frames,
         |  CAST(COALESCE(ag.n_cuts, 0) AS BIGINT) AS n_cuts,
         |  CAST(COALESCE(ag.n_scenes, 0) AS BIGINT) AS n_scenes,
         |  CAST(COALESCE(ag.max_scene_len, 0) AS BIGINT) AS max_scene_len
         |FROM documents d LEFT JOIN ag USING (doc_id) ORDER BY doc_id""".stripMargin
    }
  )
}
