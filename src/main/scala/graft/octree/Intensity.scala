package graft.octree

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's intensity-statistics chain: histogram → exact
  * percentiles → black/white/gamma estimation → 16→8-bit rescale.
  *
  * Distribution notes: the histogram shuffles at most one row per
  * distinct intensity per channel (≤ 65536), never per-voxel; the
  * percentile window then runs over that tiny frame, so the whole
  * chain is one map-side-combined aggregation over the volume plus
  * driver-free small-frame math. The rescale joins the (broadcast)
  * per-channel params back onto the voxel stream — fully codegen'd
  * arithmetic, no UDFs.
  *
  * Numeric determinism (shared with the DuckDB oracles): every
  * statistic is exact-integer until a final closed-form float step
  * whose operations (multiply, divide, sqrt, floor/ceil) are
  * IEEE-correctly-rounded and written identically on both sides.
  */
object Intensity {

  /** ktx/octree/small_memory_histogram.py:17 `histogram_tiff_file`:
    * per-channel intensity histogram (sparse bins).
    */
  def histogram(voxels: DataFrame): DataFrame =
    voxels.groupBy("c", "v").agg(count(lit(1)).as("cnt")).orderBy("c", "v")

  /** ktx_from_rendered_tiff.py:440 `_populate_size_and_histogram`'s
    * percentile table: for each intensity (ascending, non-zero by
    * construction) with cumulative count `acc` out of `total`, assign
    * percentile slots (floor(100*prev/total), floor(100*acc/total)]
    * — plus slot 0 = min. Slot 100 lands on the max via the loop's
    * last crossing, matching the reference's explicit overwrite.
    */
  def percentiles(voxels: DataFrame): DataFrame = {
    val hist = voxels.groupBy("c", "v").agg(count(lit(1)).as("cnt"))
    val ordered = Window.partitionBy("c").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy("c")
    val cum = hist
      .withColumn("acc", sum("cnt").over(ordered))
      .withColumn("total", sum("cnt").over(whole))
      .withColumn("lo", expr("(100 * (acc - cnt)) div total + 1"))
      .withColumn("hi", expr("(100 * acc) div total"))
    val slots = cum.filter(col("hi") >= col("lo"))
      .select(col("c"), explode(sequence(col("lo"), col("hi"))).as("p"), col("v").as("pv"))
    val slot0 = voxels.groupBy("c").agg(min("v").as("pv"))
      .select(col("c"), lit(0L).as("p"), col("pv"))
    slot0.union(slots).orderBy("c", "p")
  }

  /** ktx_from_rendered_tiff.py:481 `_compute_intensity_downsample_params`:
    * black/white/gamma from the percentile table. Variance uses the
    * exact-integer closed form (s2*n - s1²)/n² so both engines do the
    * identical single float division; the reference's sequential
    * accumulation differs only in final-ulp noise, which the clip
    * chain then floors away identically here and in the oracle.
    */
  def downsampleParams(voxels: DataFrame): DataFrame = {
    val n = lit(76L) // slots 20..95 inclusive
    percentiles(voxels)
      .groupBy("c")
      .agg(
        sum(when(col("p").between(20, 95), col("pv"))).as("s1"),
        sum(when(col("p").between(20, 95), col("pv") * col("pv"))).as("s2"),
        max(when(col("p") === 20, col("pv"))).as("p20"),
        max(when(col("p") === 95, col("pv"))).as("p95"),
        max(when(col("p") === 100, col("pv"))).as("p100"))
      .withColumn("stddev", sqrt((col("s2") * n - col("s1") * col("s1")) / (n * n).cast("double")))
      // clip chain of :512-:527, all floors of deterministic doubles
      .withColumn("w0", floor(col("p95") + lit(6.0) * col("stddev")))
      .withColumn("w1", floor(greatest(col("w0").cast("double"), lit(0.75) * col("p100"))))
      .withColumn("white_level", greatest(least(col("w1"), col("p100")), lit(254L)))
      .withColumn("black_level", greatest(least(col("p20"), col("white_level") - 253), lit(1L)))
      .select(col("c"), col("black_level"), col("white_level"), lit(0.5).as("gamma"))
      .orderBy("c")
  }

  /** ktx_from_rendered_tiff.py:351-365 intensity downsampling:
    * u8 = ceil(sqrt(clamp((v - black, min 1) * (1/range), ≤1)) * 254).
    * Gamma is always 0.5 (":527 Always use square root") so the gamma
    * power is written as sqrt — correctly rounded IEEE in both
    * engines, unlike pow. Note the reference multiplies by the
    * reciprocal (`zslice1 *= 1.0/range_`), which we replicate exactly.
    */
  def rescaleU8(voxels: DataFrame): DataFrame = {
    val params = downsampleParams(voxels).select("c", "black_level", "white_level")
    val t0 = (col("v") - col("black_level")).cast("double")
    val t1 = when(t0 <= 1.0, lit(1.0)).otherwise(t0)
    val range = greatest(lit(1.0), (col("white_level") - col("black_level")).cast("double"))
    val t2 = t1 * (lit(1.0) / range)
    val t3 = when(t2 >= 1.0, lit(1.0)).otherwise(t2)
    voxels.join(broadcast(params), Seq("c"))
      .select(col("c"), col("z"), col("y"), col("x"),
        ceil(sqrt(t3) * 254.0).cast("long").as("v8"))
      .orderBy("c", "z", "y", "x")
  }
}
