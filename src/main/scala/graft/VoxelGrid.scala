package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic voxel volume derived from `lineitem`, used to
  * oracle-check every octree operator on the driver's test tables.
  *
  * The volume is a sparse intensity grid in the reference's convention
  * (zero = no-data is never stored; see tiff2octree.py:312's
  * `img_data.max() > 0` empty-block test): channel c in {0,1}, a
  * GRID³ = 16³ lattice, v in [1, 65535] like a uint16 microscopy
  * volume. Collisions resolve by MAX so the derivation is
  * order-independent. The identical derivation is emitted as a DuckDB
  * CTE by [[graft.octree.OctreeOracles.voxelCte]].
  */
object VoxelGrid {
  /** Grid edge (voxels per axis). */
  val Grid = 16
  /** Octree levels: leaf blocks are (Grid >> (Levels-1))³ = 4³. */
  val Levels = 3
  /** Leaf block edge. */
  val Leaf: Int = Grid >> (Levels - 1)

  def apply(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(
        (col("l_linenumber") % 2).cast("long").as("c"),
        (col("l_orderkey") % Grid).cast("long").as("z"),
        (col("l_partkey") % Grid).cast("long").as("y"),
        (col("l_suppkey") % Grid).cast("long").as("x"),
        ((floor(col("l_quantity")) * 1000 + floor(col("l_extendedprice"))) % 65535 + 1).cast("long").as("v"))
      .groupBy("c", "z", "y", "x")
      .agg(max("v").as("v"))

  /** Single-channel variant (channel 0) for intensity-statistics ops. */
  def channel0(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir).filter(col("c") === 0)
}
