package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.sources.{VolumeQueries, VolumeSource}

class VolumeSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "false") // keep scan partition counts observable
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def scan = spark.read.format("graft.sources.VolumeSource").load()

  test("full scan matches the Scala-side fill enumeration") {
    val expected = (for {
      c <- 0L until 2L; z <- 0L until 16L; y <- 0L until 16L; x <- 0L until 16L
      h = VolumeSource.hash(c, z, y, x) if VolumeSource.present(h)
    } yield VolumeSource.value(h)).toSeq
    assert(scan.count() === expected.size)
    val sumV = scan.agg(sum("v")).collect()(0).getLong(0)
    assert(sumV === expected.sum)
  }

  test("coordinate predicates prune block partitions in the scan") {
    val full = scan.rdd.getNumPartitions
    assert(full === 2 * 4 * 4 * 4) // one partition per (c, bz, by, bx)
    val slab = scan.filter(col("c") === 0 && col("z") < 4).rdd.getNumPartitions
    assert(slab === 1 * 1 * 4 * 4) // one channel, one z-slab of blocks
  }

  test("pruned scan returns exactly the filtered rows") {
    val a = scan.filter(col("z") >= 4 && col("z") < 12 && col("c") === 0)
      .agg(count(lit(1)), sum("v")).collect()(0)
    val expected = (for {
      z <- 4L until 12L; y <- 0L until 16L; x <- 0L until 16L
      h = VolumeSource.hash(0, z, y, x) if VolumeSource.present(h)
    } yield VolumeSource.value(h)).toSeq
    assert(a.getLong(0) === expected.size)
    assert(a.getLong(1) === expected.sum)
  }

  test("pyramid sink round-trips partitioned by (level, c)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pyr").toString
    val pyr = graft.octree.Pyramid(VolumeGridFixture(spark))
    VolumeQueries.writePyramid(pyr, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === pyr.count())
    val lvl1 = VolumeQueries.readLevel(spark, dir, 1)
    // partition-column type is inferred on read; compare as strings
    assert(lvl1.select("level").distinct().collect().map(_.get(0).toString).toSeq === Seq("1"))
  }

  private object VolumeGridFixture {
    def apply(spark: SparkSession) = {
      import spark.implicits._
      (for (z <- 0L until 4L; y <- 0L until 4L; x <- 0L until 4L)
        yield (0L, z, y, x, z * 16 + y * 4 + x + 1)).toDF("c", "z", "y", "x", "v")
    }
  }
}
