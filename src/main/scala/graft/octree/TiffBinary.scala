package graft.octree

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.VoxelGrid

/** Physical `.tif` byte streams for the leaf blocks — the reference's
  * actual storage format, written and re-parsed at the byte level
  * (reference: tiff2octree.py:303 writes each octant's channel as
  * `default.{ch}.tif`, :315 `skimage.io.imsave(..., compression=
  * ("ZLIB", 6))` — a deflate-compressed multi-page z-stack; :281
  * `get_cropped_image_rasterio` is the read direction).
  *
  * [[writeBlocks]] serializes every occupied spatial block to one real
  * classic-TIFF file per channel (little-endian `II*\0` header, one
  * IFD per z-slice page with ascending-sorted tags, 16-bit grayscale,
  * Compression=8 Adobe-Deflate strips via `java.util.zip.Deflater` —
  * the JDK's public zlib, the same codec family the reference's ZLIB
  * option selects) under the octant directory layout. [[parseVoxels]]
  * re-derives the absolute voxel frame from nothing but read-back
  * bytes: walk the IFD chain, read the strip tags, `Inflater` the
  * payloads — so the oracle cross-checks bytes-on-disk against the
  * independent DuckDB derivation of the volume model.
  *
  * Serialization is per-(block,channel) `mapGroups` work on executors
  * and the read-back is a distributed `binaryFile` scan + per-file
  * decode — at cluster scale both sides stream through executors; the
  * local directory is the test harness for the byte layout, exactly
  * as in [[KtxBinary]].
  */
object TiffBinary {

  private val Leaf = VoxelGrid.Leaf
  private val Levels = VoxelGrid.Levels
  private val Channels = 2

  private def pathOf(bz: Long, by: Long, bx: Long): String =
    ((Levels - 2) to 0 by -1).map { lv =>
      def bit(b: Long) = ((b - 1) >> lv) & 1L
      (1L + bit(bx) + 2L * bit(by) + 4L * bit(bz)).toString
    }.mkString

  private def putU16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  private def putU32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }

  private def getU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def getU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6) // the reference's ZLIB level
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(comp: Array[Byte], rawLen: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(comp)
    val raw = new Array[Byte](rawLen)
    var off = 0
    while (off < rawLen && !inf.finished())
      off += inf.inflate(raw, off, rawLen - off)
    inf.end()
    require(off == rawLen, s"short inflate: $off of $rawLen")
    raw
  }

  // TIFF field types
  private val TShort = 3
  private val TLong = 4

  /** Serialize one (block, channel): a classic multi-page TIFF, one
    * Leaf×Leaf 16-bit page per z-slice, one deflate strip per page.
    * Layout: 8-byte header, all compressed strips, then the IFD chain
    * (strip offsets known by then).
    */
  private def serialize(vox: Seq[(Long, Long, Long, Long)]): Array[Byte] = {
    val grid = Array.ofDim[Long](Leaf, Leaf, Leaf)
    vox.foreach { case (lz, ly, lx, v) => grid(lz.toInt)(ly.toInt)(lx.toInt) = v }
    val strips: IndexedSeq[Array[Byte]] = (0 until Leaf).map { z =>
      val raw = new java.io.ByteArrayOutputStream()
      for (y <- 0 until Leaf; x <- 0 until Leaf) putU16(raw, grid(z)(y)(x).toInt)
      deflate(raw.toByteArray)
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('I'); putU16(out, 42)
    val stripOffs = strips.scanLeft(8L)(_ + _.length)
    putU32(out, stripOffs.last) // first IFD sits after all strip data
    strips.foreach(out.write)
    // one IFD per page: 10 ascending-sorted tags, 12 bytes each
    val ifdSize = 2 + 10 * 12 + 4
    def entry(tag: Int, typ: Int, value: Long): Unit = {
      putU16(out, tag); putU16(out, typ); putU32(out, 1L); putU32(out, value)
    }
    for (z <- 0 until Leaf) {
      putU16(out, 10)
      entry(256, TLong, Leaf.toLong)             // ImageWidth
      entry(257, TLong, Leaf.toLong)             // ImageLength
      entry(258, TShort, 16L)                    // BitsPerSample
      entry(259, TShort, 8L)                     // Compression: Adobe Deflate
      entry(262, TShort, 1L)                     // Photometric: BlackIsZero
      entry(273, TLong, stripOffs(z))            // StripOffsets
      entry(277, TShort, 1L)                     // SamplesPerPixel
      entry(278, TLong, Leaf.toLong)             // RowsPerStrip
      entry(279, TLong, strips(z).length.toLong) // StripByteCounts
      entry(339, TShort, 1L)                     // SampleFormat: unsigned
      val next = if (z == Leaf - 1) 0L else stripOffs.last + (z + 1).toLong * ifdSize
      putU32(out, next)
    }
    out.toByteArray
  }

  /** Write every occupied spatial block as real `.tif` files —
    * `outRoot/<octant>/<octant>/default.<c>.tif`, both channels per
    * block (a channel with no voxels is an all-zero stack, as the
    * reference writes) — executor-side per-block serialization.
    */
  def writeBlocks(spark: SparkSession, dir: String, outRoot: String): Unit = {
    import spark.implicits._
    Addressing.blockify(VoxelGrid(spark, dir))
      .select(col("bz"), col("by"), col("bx"), col("c"),
        col("lz"), col("ly"), col("lx"), col("v"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .groupByKey(t => (t._1, t._2, t._3))
      .flatMapGroups { (key: (Long, Long, Long), it: Iterator[(Long, Long, Long, Long, Long, Long, Long, Long)]) =>
        val byChannel = it.toSeq.groupBy(_._4)
        val rel = pathOf(key._1, key._2, key._3).map(_.toString).mkString("/")
        (0 until Channels).map { c =>
          val vox = byChannel.getOrElse(c.toLong, Seq.empty)
            .map(t => (t._5, t._6, t._7, t._8))
          (rel, s"default.$c.tif", serialize(vox))
        }
      }
      .foreach { t =>
        val (rel, name, bytes) = t
        val d = new java.io.File(s"$outRoot/$rel")
        d.mkdirs()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outRoot/$rel/$name"), bytes): Unit
      }
  }

  /** Per-page metadata of one file's bytes, by walking the real IFD
    * chain: (page, width, length, bits, compression, stripOff, stripBytes).
    */
  private[graft] def decodePages(bytes: Array[Byte]): Seq[(Int, Long, Long, Long, Long, Long, Long)] = {
    require(bytes(0) == 'I' && bytes(1) == 'I' && getU16(bytes, 2) == 42, "bad TIFF header")
    var ifd = getU32(bytes, 4)
    val pages = Seq.newBuilder[(Int, Long, Long, Long, Long, Long, Long)]
    var page = 0
    while (ifd != 0L) {
      val n = getU16(bytes, ifd.toInt)
      val tags = (0 until n).map { i =>
        val e = ifd.toInt + 2 + i * 12
        getU16(bytes, e) -> getU32(bytes, e + 8)
      }.toMap
      pages += ((page, tags(256), tags(257), tags(258), tags(259), tags(273), tags(279)))
      page += 1
      ifd = getU32(bytes, ifd.toInt + 2 + n * 12)
    }
    pages.result()
  }

  private def files(spark: SparkSession, outRoot: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tif")
      .option("recursiveFileLookup", "true")
      .load(outRoot)

  /** Absolute voxels (c, z, y, x, v) decoded purely from read-back
    * file bytes (IFD walk + strip inflate), zeros dropped — must equal
    * the source [[VoxelGrid]] exactly. Block coords come from the
    * octant directory names, the channel from the reference's
    * `default.<c>.tif` naming.
    */
  def parseVoxels(spark: SparkSession, outRoot: String): DataFrame = {
    import spark.implicits._
    files(spark, outRoot).select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val parts = path.split('/')
        val c = parts.last.stripPrefix("default.").stripSuffix(".tif").toLong
        val digits = parts.slice(parts.length - 1 - (Levels - 1), parts.length - 1)
        var (bz, by, bx) = (0L, 0L, 0L)
        digits.zipWithIndex.foreach { case (ds, i) =>
          val lv = Levels - 2 - i
          val d = ds.head - '1'
          bx |= (d & 1L) << lv; by |= ((d >> 1) & 1L) << lv; bz |= ((d >> 2) & 1L) << lv
        }
        decodePages(bytes).flatMap { case (z, w, h, bits, comp, off, nb) =>
          require(bits == 16 && comp == 8, s"unexpected page encoding ($bits, $comp)")
          val raw = inflate(bytes.slice(off.toInt, (off + nb).toInt), (w * h * 2).toInt)
          for {
            y <- 0 until h.toInt; x <- 0 until w.toInt
            v = getU16(raw, (y * w.toInt + x) * 2)
            if v > 0
          } yield (c, bz * Leaf + z, by * Leaf + y, bx * Leaf + x, v.toLong)
        }
      }
      .toDF("c", "z", "y", "x", "v")
      .orderBy("c", "z", "y", "x")
  }
}
