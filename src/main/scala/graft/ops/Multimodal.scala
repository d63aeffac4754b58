package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media payloads ride through the engine
  * as opaque `BINARY` columns with typed metadata alongside — the
  * pattern for image/audio/video at 100 TB (payload bytes never leave
  * the executor; metadata is columnar and prunable).
  *
  * The payloads here are utf-8 text bytes (this container deliberately
  * has no image/audio codecs); the decode stage is a clearly-marked
  * deterministic STUB behind the same batch-processing seam a real
  * decoder (pillow/ffmpeg via mapInPandas in PySpark, JNI here) would
  * plug into.
  */
object Multimodal {

  /** mm_pack — attach payload bytes + flat metadata. The oracle-facing
    * projection identifies the payload by checksum + head bytes (raw
    * binary columns don't round-trip the comparator); the binary
    * column itself feeds [[decodeStub]].
    */
  def packed(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  def pack(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
        lower(hex(substring(col("text"), 1, 8).cast("binary"))).as("head_hex"),
        col("source").as("kind"),
        md5(col("text")).as("checksum"))
      .orderBy("doc_id")

  /** mm_meta_extract — header-style metadata from the payload without
    * decoding it (magic bytes, length, checksum).
    */
  def metaExtract(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
        lower(hex(substring(col("text"), 1, 4).cast("binary"))).as("magic_hex"),
        md5(col("text")).as("checksum"))
      .orderBy("doc_id")

  /** mm_frame_sample — deterministic strided sampling of fixed-size
    * payload windows (the frame-extraction access pattern: k frames at
    * stride positions, each a bounded slice — no full-payload decode).
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .select(col("doc_id"), col("text"), col("n_bytes"),
        explode(sequence(lit(0L), lit(3L))).as("frame_idx"))
      .filter(col("n_bytes") >= col("frame_idx") * 32 + 16)
      .select(col("doc_id"), col("frame_idx"),
        lower(hex(expr("cast(substr(text, cast(frame_idx * 32 + 1 as int), 16) as binary)")))
          .as("frame_hex"))
      .orderBy("doc_id", "frame_idx")

  /** mm_resize — the resize/resample access pattern over an opaque
    * payload: strided sampling down to a fixed-size representation
    * (for real media this is the thumbnail/spectrogram pass; the
    * Spark-side shape — per-row bounded recompute, no shuffle — is
    * identical). Output carries the resampled payload's checksum.
    */
  def resize(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("n"))
      .withColumn("stride", greatest(lit(1L), expr("n div 32")))
      .withColumn("resized",
        expr("array_join(transform(sequence(0L, 31L), i -> substr(text, cast(i * stride + 1 as int), 1)), '')"))
      .select(col("doc_id"), col("n"), col("stride"),
        col("resized"), md5(col("resized")).as("resized_md5"))
      .orderBy("doc_id")

  /** Decoded features produced by the (stubbed) media decoder. */
  case class Decoded(doc_id: Long, width: Int, height: Int, mean_intensity: Double)

  /** mm_decode_stub — the batch-decode seam: partitions stream through
    * a typed `mapPartitions` (Arrow-batched `mapInPandas` in the
    * Python binding) where a real codec would decode payload bytes.
    * The stub derives deterministic fake dimensions/intensity from the
    * bytes; the Spark-side plumbing (schema, batching, partition
    * isolation) is the real thing. The decode CALL is the stubbed
    * seam; the fake's byte arithmetic is itself oracle-checked (a
    * DuckDB hex-parse re-derivation hash-matches this output — see
    * OpsOracles "mm_decode_stub"), so changing the fake (e.g. signed
    * bytes, fold order) breaks the correctness gate by design.
    */
  def decodeStub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    packed(spark, dir).as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        // STUB decoder: a real implementation calls the codec here.
        val w = 8 + (if (bytes.nonEmpty) (bytes(0) & 0x3f) else 0)
        val h = 8 + (if (bytes.length > 1) (bytes(1) & 0x3f) else 0)
        val mean = if (bytes.isEmpty) 0.0
          else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
        Decoded(id, w, h, mean)
      }
    }.toDF().orderBy("doc_id")
  }

  /** mm_patchify — ViT-style patch extraction over an opaque payload
    * viewed as a character grid: the first 8 rows of width 16 split
    * into a 4×2 grid of 4×4 patches (px ∈ 0..3, py ∈ 0..1); each
    * patch concatenates its 4 row-slices and carries the exact
    * integer code-point sum (the pixel-intensity stand-in — ascii()
    * of each cell, identical in both engines). Only fully-covered
    * patches emit (payload must reach the patch's last row). The
    * Spark shape is the real one for image patching at 100 TB: a
    * per-row bounded generator (explode of a static 8-cell grid),
    * zero shuffles, all scan-side codegen.
    */
  def patchify(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("n"))
      .select(col("doc_id"), col("text"), col("n"),
        explode(expr(
          "transform(sequence(0L, 7L), g -> struct(g % 4 AS px, g div 4 AS py))")).as("g"))
      .select(col("doc_id"), col("g.px").as("px"), col("g.py").as("py"),
        col("text"), col("n"))
      // last needed char: row (py*4+3), cols (px*4+1 .. px*4+4)
      .filter(col("n") >= (col("py") * 4 + 3) * 16 + col("px") * 4 + 4)
      .withColumn("patch", expr(
        "array_join(transform(sequence(0L, 3L), " +
          "r -> substr(text, cast((py * 4 + r) * 16 + px * 4 + 1 as int), 4)), '')"))
      .select(col("doc_id"), col("px"), col("py"), col("patch"),
        expr("aggregate(transform(sequence(1, length(patch)), " +
          "i -> cast(ascii(substr(patch, i, 1)) as bigint)), 0L, (a, x) -> a + x)")
          .as("cp_sum"))
      .orderBy("doc_id", "py", "px")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_patchify" -> (patchify _),
    "mm_pack" -> (pack _),
    "mm_meta_extract" -> (metaExtract _),
    "mm_frame_sample" -> (frameSample _),
    "mm_resize" -> (resize _),
    "mm_decode_stub" -> (decodeStub _)
  )
}
