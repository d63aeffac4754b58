package graft.octree

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.VoxelGrid

/** Per-block geometric metadata and the dataset-level transform —
  * ktx_from_rendered_tiff.py:181 `_populate_octree_metadata` and
  * tiff2octree.py:842 `save_transform_txt`, re-expressed as closed-form
  * column arithmetic: the reference's per-digit origin-shift walk is
  * equivalent to `origin + pos0 * (root_extent / 2^(level-1))`.
  *
  * All extents are dyadic rationals (root extent × powers of two), so
  * the double math is exact on both engines; only the bounding-sphere
  * radius involves a sqrt (correctly rounded, deterministic).
  */
object Geometry {

  /** transform.txt of tiff2octree.py:842 for origin (0,0,0), voxel
    * size (1,1,1) and the test grid: s_axis = vox * 1000 * 2^(L-1)
    * nm per root-level voxel, plus derived µm volume extents.
    */
  def transform(spark: SparkSession,
                levels: Int = VoxelGrid.Levels, grid: Int = VoxelGrid.Grid): DataFrame = {
    import spark.implicits._
    val scaleNm = 1000.0 * (1L << (levels - 1)) // 1.0 vox size * 1000 * 2^(L-1)
    val volumeUm = grid.toDouble // grid * 1.0 µm voxels
    Seq((0.0, 0.0, 0.0, scaleNm, scaleNm, scaleNm, levels.toLong, volumeUm))
      .toDF("ox", "oy", "oz", "sx", "sy", "sz", "nl", "volume_um")
  }

  /** Per occupied full-res block: octant path, origin/extent (µm),
    * bounding-sphere center/radius — `_populate_octree_metadata`'s
    * corner math with root origin (0,0,0) and grid volume 16 µm.
    */
  def blockGeometry(voxels: DataFrame,
                    levels: Int = VoxelGrid.Levels, grid: Int = VoxelGrid.Grid): DataFrame = {
    val span = grid.toDouble / (1L << (levels - 1)) // leaf extent µm (dyadic)
    val origin = (b: String) => ((col(b) - 1).cast("double") * span).as("o" + b.last)
    Addressing.blockPaths(voxels, levels)
      .select(col("c"), col("bz"), col("by"), col("bx"), col("path"),
        origin("bx"), origin("by"), origin("bz"))
      .withColumn("sx", lit(span)).withColumn("sy", lit(span)).withColumn("sz", lit(span))
      // center and radius of ktx_from_rendered_tiff.py:205-210
      .withColumn("cx", col("ox") + lit(0.5) * col("sx"))
      .withColumn("cy", col("oy") + lit(0.5) * col("sy"))
      .withColumn("cz", col("oz") + lit(0.5) * col("sz"))
      .withColumn("radius",
        sqrt(col("sx") * col("sx") + col("sy") * col("sy") + col("sz") * col("sz")) / 16.0)
      .orderBy("c", "bz", "by", "bx")
  }
}
