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
  * Fully parameterized like the reference CLI (`parse_voxel_size`
  * tiff2octree.py:825 takes a per-axis voxel size, origins are passed
  * through verbatim): arbitrary origins and anisotropic voxel sizes.
  * With dyadic-rational parameters every extent/origin sum is exact in
  * doubles on both engines; only the bounding-sphere radius involves a
  * sqrt (correctly rounded, deterministic).
  */
object Geometry {

  /** transform.txt of tiff2octree.py:842 `save_transform_txt`: origins
    * pass through; per-axis scale is nm per root-level voxel,
    * `vox_um * 1000 * 2^(L-1)`; plus the derived per-axis volume
    * extents in µm (`grid * vox_um`).
    */
  def transform(spark: SparkSession,
                levels: Int = VoxelGrid.Levels, grid: Int = VoxelGrid.Grid,
                origin: (Double, Double, Double) = (0.0, 0.0, 0.0),
                voxUm: (Double, Double, Double) = (1.0, 1.0, 1.0)): DataFrame = {
    import spark.implicits._
    val f = (1L << (levels - 1)).toDouble
    Seq((origin._1, origin._2, origin._3,
      voxUm._1 * 1000.0 * f, voxUm._2 * 1000.0 * f, voxUm._3 * 1000.0 * f,
      levels.toLong, grid * voxUm._1, grid * voxUm._2, grid * voxUm._3))
      .toDF("ox", "oy", "oz", "sx", "sy", "sz", "nl", "vx_um", "vy_um", "vz_um")
  }

  /** Per occupied full-res block: octant path, origin/extent (µm),
    * bounding-sphere center/radius — `_populate_octree_metadata`'s
    * corner math (ktx_from_rendered_tiff.py:161-210) for an arbitrary
    * root origin and anisotropic per-axis voxel size. The leaf extent
    * per axis is `grid * vox_um / 2^(L-1)`.
    */
  def blockGeometry(voxels: DataFrame,
                    levels: Int = VoxelGrid.Levels, grid: Int = VoxelGrid.Grid,
                    origin: (Double, Double, Double) = (0.0, 0.0, 0.0),
                    voxUm: (Double, Double, Double) = (1.0, 1.0, 1.0)): DataFrame = {
    val nb = (1L << (levels - 1)).toDouble // blocks per axis
    val (spanX, spanY, spanZ) =
      (grid * voxUm._1 / nb, grid * voxUm._2 / nb, grid * voxUm._3 / nb)
    def o(b: String, o0: Double, span: Double) =
      (lit(o0) + (col(b) - 1).cast("double") * span).as("o" + b.last)
    Addressing.blockPaths(voxels, levels)
      .select(col("c"), col("bz"), col("by"), col("bx"), col("path"),
        o("bx", origin._1, spanX), o("by", origin._2, spanY), o("bz", origin._3, spanZ))
      .withColumn("sx", lit(spanX)).withColumn("sy", lit(spanY)).withColumn("sz", lit(spanZ))
      // center and radius of ktx_from_rendered_tiff.py:205-210
      .withColumn("cx", col("ox") + lit(0.5) * col("sx"))
      .withColumn("cy", col("oy") + lit(0.5) * col("sy"))
      .withColumn("cz", col("oz") + lit(0.5) * col("sz"))
      .withColumn("radius",
        sqrt(col("sx") * col("sx") + col("sy") * col("sy") + col("sz") * col("sz")) / 16.0)
      .orderBy("c", "bz", "by", "bx")
  }
}
