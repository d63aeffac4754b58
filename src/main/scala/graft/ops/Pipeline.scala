package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end corpus-cleaning pipeline — the composed flow a
  * training-data user actually runs, as ONE declarative DAG:
  *
  *   quality filter → PII mask → exact dedup on the MASKED text →
  *   keep canonical per duplicate group → stratified hash-rank sample.
  *
  * Shape at 100 TB: the filter rules and the mask chain fuse into a
  * single parquet scan (both are scan-side projections — see
  * [[TextAnalysis.withRuleFlags]]/[[TextAnalysis.withMasked]]); the
  * failing docs never reach the regex-heavy mask work (filter first);
  * then one shuffle on the content key (dedup) and one on the stratum
  * key (sample rank, map-side pruned by WindowGroupLimit).
  */
object Pipeline {

  def clean(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val cleaned = TextAnalysis.withMasked(
      TextAnalysis.withRuleFlags(Tables(spark, dir, "documents"))
        .filter(col("keep") === 1))
      .select(col("doc_id"), col("source"), md5(col("masked")).as("masked_md5"))
    // canonical = min doc_id; its source rides along via min_by (no
    // rescan of documents; a duplicate group may span sources)
    val canon = cleaned.groupBy("masked_md5")
      .agg(min("doc_id").as("doc_id"),
        min_by(col("source"), col("doc_id")).as("source"),
        count(lit(1)).as("n_dups"))
    val w = Window.partitionBy("source").orderBy(col("samp_hash"), col("doc_id"))
    canon
      .withColumn("samp_hash",
        expr("graft_md5_prefix(concat(source, ':', cast(doc_id as string)))"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= Sampling.StratumK)
      .select("source", "doc_id", "masked_md5", "n_dups", "samp_hash", "rk")
      .orderBy("source", "rk")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_clean" -> (clean _)
  )
}
