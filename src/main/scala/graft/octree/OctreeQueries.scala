package graft.octree

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables, VoxelGrid}

/** Driver-contract entry points for every octree operator in
  * SURVEY.md §2.1: each takes (spark, sfDir) and produces the
  * deterministic, oracle-comparable result frame.
  */
object OctreeQueries {

  private def vox(spark: SparkSession, dir: String) = VoxelGrid(spark, dir)

  def blockify(spark: SparkSession, dir: String): DataFrame =
    Addressing.blockify(vox(spark, dir)).orderBy("c", "z", "y", "x")

  def path(spark: SparkSession, dir: String): DataFrame =
    Addressing.blockPaths(vox(spark, dir))

  def optimalLevels(spark: SparkSession, dir: String): DataFrame = {
    val dims = Tables(spark, dir, "orders")
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").cast("long").as("id"),
        (col("o_orderkey") % 4000 + 600).cast("long").as("dz"),
        (col("o_custkey") % 3000 + 500).cast("long").as("dy"),
        (col("o_orderkey") % 2500 + 400).cast("long").as("dx"))
    Addressing.optimalLevels(dims)
  }

  def mipmapDims(spark: SparkSession, dir: String): DataFrame =
    Addressing.mipmapDims(VoxelGrid.Grid, VoxelGrid.Grid, VoxelGrid.Grid)(spark)

  def down(kernel: String)(spark: SparkSession, dir: String): DataFrame =
    Downsample(vox(spark, dir), kernel).orderBy("c", "z", "y", "x")

  def downLinear(spark: SparkSession, dir: String): DataFrame =
    Downsample.linear(vox(spark, dir), VoxelGrid.Grid).orderBy("c", "z", "y", "x")

  def downXY(spark: SparkSession, dir: String): DataFrame =
    Downsample(vox(spark, dir), "arthur", xyOnly = true).orderBy("c", "z", "y", "x")

  def pyramid(spark: SparkSession, dir: String): DataFrame =
    Pyramid(vox(spark, dir))

  def emptyPrune(spark: SparkSession, dir: String): DataFrame =
    Pyramid.emptyPrune(spark, vox(spark, dir))

  def resume(spark: SparkSession, dir: String): DataFrame =
    Pyramid.resumeRemaining(vox(spark, dir))

  def interleave(spark: SparkSession, dir: String): DataFrame =
    Pyramid.interleave(vox(spark, dir))

  def blockStats(spark: SparkSession, dir: String): DataFrame =
    Pyramid.blockStats(vox(spark, dir))

  def histogram(spark: SparkSession, dir: String): DataFrame =
    Intensity.histogram(vox(spark, dir))

  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Intensity.percentiles(vox(spark, dir))

  def intensityParams(spark: SparkSession, dir: String): DataFrame =
    Intensity.downsampleParams(vox(spark, dir))

  def rescaleU8(spark: SparkSession, dir: String): DataFrame =
    Intensity.rescaleU8(vox(spark, dir))

  /** KTX artifact naming of ktx_from_rendered_tiff / tiff2octree.py:477
    * (`'block' + '_8' + '_xy' + '_' + path + '.ktx'`, octant dirs
    * joined by '/'): the sink-layout op for the KTX export path.
    */
  def ktxName(spark: SparkSession, dir: String): DataFrame =
    Addressing.blockPaths(vox(spark, dir))
      .select(col("c"), col("bz"), col("by"), col("bx"),
        concat(substring(col("path"), 1, 1), lit("/"), substring(col("path"), 2, 1)).as("relpath"),
        concat(lit("block_8_xy_"), col("path"), lit(".ktx")).as("ktx_name"))
      .orderBy("c", "bz", "by", "bx")

  /** Re-tiling (tiff2octree.py:516 `conv_tiled_tiff`, which rewrites
    * strip TIFFs as 256² tiles so window reads stop scanning whole
    * rows): the columnar analog re-blocks the voxel store under a
    * coarser tile edge so window/block readers hit one tile instead
    * of many — at scale this is a `repartitionByRange` + partitioned
    * write; the operator computes the new assignment + per-tile stats.
    */
  def retile(spark: SparkSession, dir: String): DataFrame = {
    val newLeaf = VoxelGrid.Leaf * 2 // 4 -> 8: 8x fewer, 8x larger tiles
    Addressing.blockify(vox(spark, dir), newLeaf)
      .groupBy("c", "bz", "by", "bx")
      .agg(count(lit(1)).as("n_voxels"), max("v").as("max_v"),
        min("lz").as("min_lz"), max("lx").as("max_lx"))
      .orderBy("c", "bz", "by", "bx")
  }

  def transform(spark: SparkSession, dir: String): DataFrame =
    Geometry.transform(spark)

  def blockGeom(spark: SparkSession, dir: String): DataFrame =
    Geometry.blockGeometry(vox(spark, dir))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "oct_blockify" -> (blockify _),
    "oct_path" -> (path _),
    "oct_levels" -> (optimalLevels _),
    "oct_mipmap_dims" -> (mipmapDims _),
    "oct_down_2ndmax" -> down("second_max") _,
    "oct_down_area" -> down("area") _,
    "oct_down_mean_nz" -> down("mean_nz") _,
    "oct_down_max" -> down("max") _,
    "oct_down_arthur" -> down("arthur") _,
    "oct_down_linear" -> (downLinear _),
    "oct_downsample_xy" -> (downXY _),
    "oct_pyramid" -> (pyramid _),
    "oct_empty_prune" -> (emptyPrune _),
    "oct_resume" -> (resume _),
    "oct_interleave" -> (interleave _),
    "oct_stats" -> (blockStats _),
    "oct_histogram" -> (histogram _),
    "oct_percentiles" -> (percentiles _),
    "oct_intensity_params" -> (intensityParams _),
    "oct_rescale_u8" -> (rescaleU8 _),
    "oct_transform" -> (transform _),
    "oct_ktx_name" -> (ktxName _),
    "oct_retile" -> (retile _),
    "oct_block_geom" -> (blockGeom _)
  )
}
