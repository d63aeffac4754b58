package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.octree.TiffBinary

/** Property pins for the TIFF writer/parser pair on ARBITRARY page
  * stacks — beyond the structured voxel-model round trips: odd
  * widths (even-padding + word-aligned IFD chains), 1-pixel pages,
  * multi-page files, all-zero strips (deflate's most compressible
  * input), full-range 16-bit values, and tile sizes at and above the 16-multiple floor. The strip bytes go through convTiled (the real
  * strip→tile rewriter) and back out of decodeTiledPages, so one
  * property exercises serialize + IFD walk + inflate + tile
  * re-chunking + tile-pad trimming together.
  */
class TiffPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val genPages = for {
    nPages <- Gen.choose(1, 4)
    h <- Gen.choose(1, 9)
    w <- Gen.choose(1, 9) // odd widths force strip even-padding
    pages <- Gen.listOfN(nPages,
      Gen.listOfN(h, Gen.listOfN(w,
        Gen.frequency(3 -> Gen.const(0L), 1 -> Gen.choose(0L, 65535L))))
        .map(_.map(_.toArray).toArray))
    t <- Gen.oneOf(16, 32, 48)
  } yield (pages, t)

  test("strip serialize -> tiled rewrite -> pixel decode inverts on arbitrary pages") {
    check(Prop.forAllNoShrink(genPages) { case (pages, t) =>
      val strip = TiffBinary.serializePages(pages)
      // word alignment must hold for ANY page shape
      def u16(b: Array[Byte], o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      def u32(b: Array[Byte], o: Int): Long =
        (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
          ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      var ifd = u32(strip, 4)
      var aligned = true
      while (ifd != 0L) {
        aligned &&= ifd % 2 == 0
        val n = u16(strip, ifd.toInt)
        ifd = u32(strip, ifd.toInt + 2 + n * 12)
      }
      val decoded = TiffBinary.decodeTiledPages(TiffBinary.convTiled(strip, t))
      aligned &&
        decoded.length == pages.length &&
        decoded.zip(pages).forall { case (d, p) =>
          d.length == p.length && d.zip(p).forall { case (dr, pr) =>
            dr.toSeq == pr.toSeq
          }
        }
    }, 30)
  }
}
