package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import TextAnalysis.toksExpr

/** Deduplication operators for LLM training-data pipelines, over the
  * `documents` table.
  *
  * Scale design: nothing here is O(n²). Candidate generation always
  * goes through a blocking/banding key (exact hash, LSH band, length
  * bucket) and the exact similarity check runs only on candidate
  * pairs. At 100 TB: one scan to compute per-doc signatures (map-side,
  * codegen'd), one shuffle on the blocking key, pair checks inside
  * each bucket; skewed buckets are handled by AQE skew-join splitting.
  */
object Dedup {

  /** Word-3-gram shingle array over a materialized token column `t`
    * (empty when < 3 tokens). Indexing a column, not the tokenizer
    * expression, keeps the regex to one evaluation per document.
    */
  val shinglesExpr: String =
    """CASE WHEN size(t) >= 3 THEN
          array_distinct(transform(sequence(1, size(t) - 2),
            i -> concat_ws(' ', element_at(t, i),
                           element_at(t, i + 1),
                           element_at(t, i + 2))))
        ELSE array_remove(array(''), '') END"""

  /** First-8-hex-digits of md5 as a bigint in [0, 2^32) — the shared
    * string-to-int hash via the native thread-local-digest expression
    * (see [[graft.functions.Md5PrefixLong]]; the stock
    * md5+substr+conv chain hits the synchronized java.security
    * provider lookup per row). The oracle re-derives it with a strpos
    * polynomial; values are identical.
    */
  def md5Int(x: String): String = s"graft_md5_prefix($x)"

  /** MinHash permutation parameters: (a_j, b_j) affine maps mod p. */
  val MinhashK = 8
  val MinhashP = 2147483647L
  def perm(j: Int): (Long, Long) = (2L * j + 3, 5L * j + 7)

  /** dedup_exact — md5-keyed exact duplicate groups with canonical
    * (min) doc id. One shuffle on the 128-bit key.
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("key"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("canonical"))
      .orderBy("canonical")

  /** dedup_ngram_jaccard — token-set Jaccard pairs within
    * (lang, length-bucket) blocks; τ = 0.5 tested exactly as
    * `2*|∩| >= |∪|` (pure integer compare, no float threshold).
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // Decouple parallelism from file layout: a single-file table scans
    // as 1-2 partitions, and once AQE broadcasts the other side the
    // whole O(pairs) intersect explosion would run in one task.
    val docs = Tables(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), col("lang"),
        expr(s"array_distinct($toksExpr)").as("toks"),
        expr(s"cast(size(array_distinct($toksExpr)) as bigint)").as("nt"))
      .withColumn("bucket", expr("nt div 8"))
    val a = docs.select(col("lang"), col("bucket"), col("doc_id").as("doc_a"),
      col("toks").as("toks_a"), col("nt").as("nt_a"))
    val b = docs.select(col("lang"), col("bucket"), col("doc_id").as("doc_b"),
      col("toks").as("toks_b"), col("nt").as("nt_b"))
    a.join(b, Seq("lang", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("cast(size(array_intersect(toks_a, toks_b)) as bigint)").as("inter"),
        col("nt_a"), col("nt_b"))
      .withColumn("uni", col("nt_a") + col("nt_b") - col("inter"))
      .filter(col("inter") * 2 >= col("uni"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("nt_a"), col("nt_b"),
        col("uni"), (col("inter") / col("uni")).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** dedup_minhash — k=8 MinHash signature per document over word-3-gram
    * shingles (affine permutations of the shared md5-int hash). The
    * signature is the oracle-checked output; LSH banding over it feeds
    * the pair stage (see band columns b0/b1: 2-row bands).
    */
  def minhash(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // Explode shingles to rows and take the k permutation minima as
    // grouped aggregations: the md5 hash is evaluated exactly once per
    // shingle (an array-lambda formulation gets its alias inlined by
    // CollapseProject and recomputes the hash array k times), the
    // affine permutations are trivial per-row arithmetic, and the
    // shuffle carries only partial minima (map-side combine).
    val sigAggs = (0 until MinhashK).map { j =>
      val (aj, bj) = perm(j)
      min(expr(s"($aj * h + $bj) % $MinhashP")).as(s"mh$j")
    }
    Tables(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("t", expr(toksExpr))
      .select(col("doc_id"), explode(expr(shinglesExpr)).as("s"))
      .withColumn("h", expr(md5Int("s")))
      .groupBy("doc_id")
      .agg(sigAggs.head, sigAggs.tail: _*)
      .withColumn("band0", concat_ws(":", col("mh0"), col("mh1")))
      .withColumn("band1", concat_ws(":", col("mh2"), col("mh3")))
      .orderBy("doc_id")
  }

  /** dedup_minhash_pairs — LSH candidate pairs: documents colliding on
    * either 2-row band, with the signature-agreement estimate of their
    * Jaccard similarity. The join key is the band value — candidate
    * generation is a hash equi-join, never a cross product.
    */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sigs = minhash(spark, dir)
    val a = sigs.toDF(sigs.columns.map(_ + "_a"): _*)
    val b = sigs.toDF(sigs.columns.map(_ + "_b"): _*)
    def cand(band: String) =
      a.join(b, col(s"${band}_a") === col(s"${band}_b") &&
        col("doc_id_a") < col("doc_id_b"))
    val matches = (0 until MinhashK)
      .map(j => when(col(s"mh${j}_a") === col(s"mh${j}_b"), 1L).otherwise(0L))
      .reduce(_ + _)
    cand("band0").unionByName(cand("band1"))
      .select(col("doc_id_a").as("doc_a"), col("doc_id_b").as("doc_b"),
        matches.as("n_match"))
      .distinct()
      .withColumn("est_jaccard", col("n_match") / lit(8.0))
      .orderBy("doc_a", "doc_b")
  }

  /** dedup_simhash — 32-bit SimHash over the distinct token set:
    * per-bit majority vote of per-token md5-int hashes.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val fp = (0 until 32).map { i =>
      s"cast(sum(CASE WHEN (shiftright(h, $i) & 1) = 1 THEN 1 ELSE -1 END) > 0 as bigint) * ${1L << i}"
    }.mkString(" + ")
    Tables(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), explode(expr(s"array_distinct($toksExpr)")).as("tok"))
      .withColumn("h", expr(md5Int("tok")))
      .groupBy("doc_id")
      .agg(expr(s"$fp").as("simhash"), count(lit(1)).as("n_tokens"))
      .orderBy("doc_id")
  }

  /** dedup_embed — embedding near-duplicate assignment: sign-LSH
    * bucketed candidate pairs with exact cosine ≥ τ (integer-compared
    * on floor(cos·10⁶)), then per-doc canonical = min partner id.
    */
  def embed(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Similarity.bucketedPairs(spark, dir, minCosU = 300000L)
    val partners = pairs.select(col("id_a").as("doc"), col("id_b").as("partner"))
      .union(pairs.select(col("id_b").as("doc"), col("id_a").as("partner")))
    partners.groupBy("doc")
      .agg(min(col("partner")).as("min_partner"), count(lit(1)).as("n_partners"))
      .select(col("doc"),
        least(col("min_partner"), col("doc")).as("canonical"),
        col("n_partners"))
      .orderBy("doc")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (exact _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_minhash" -> (minhash _),
    "dedup_minhash_pairs" -> (minhashPairs _),
    "dedup_simhash" -> (simhash _),
    "dedup_embed" -> (embed _)
  )
}
