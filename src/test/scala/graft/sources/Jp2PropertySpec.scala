package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based pins for the JPEG2000 primitives, independent of
  * image-shaped inputs: the MQ coder pair must invert on ARBITRARY
  * (context, bit) decision streams, and the tag-tree pair on
  * arbitrary value grids under the packet header's query pattern —
  * the two places where a subtle register- or bound-propagation slip
  * could hide behind the structured statistics of real pages.
  */
class Jp2PropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val decisionStreams: Gen[List[(Int, Int)]] = for {
    n <- Gen.choose(0, 3000)
    s <- Gen.listOfN(n, for {
      ctx <- Gen.choose(0, 18)
      bit <- Gen.choose(0, 1)
    } yield (ctx, bit))
  } yield s

  test("MQ encode→decode inverts arbitrary decision streams") {
    check(Prop.forAll(decisionStreams) { stream =>
      val enc = new Jp2Codec.MqEncoder
      stream.foreach { case (ctx, bit) => enc.encode(ctx, bit) }
      val bytes = enc.flush()
      val dec = new Jp2Codec.MqDecoder(bytes)
      // the SAME context sequence must yield the same bits (contexts
      // are part of the shared model, not the coded payload)
      stream.forall { case (ctx, bit) => dec.decode(ctx) == bit }
    }, 200)
  }

  test("MQ codewords never contain a marker-like FF pair and never end in FF") {
    check(Prop.forAll(decisionStreams) { stream =>
      val enc = new Jp2Codec.MqEncoder
      stream.foreach { case (ctx, bit) => enc.encode(ctx, bit) }
      val bytes = enc.flush()
      val noMarker = (0 until bytes.length - 1).forall { i =>
        (bytes(i) & 0xFF) != 0xFF || (bytes(i + 1) & 0xFF) <= 0x8F
      }
      noMarker && (bytes.isEmpty || (bytes.last & 0xFF) != 0xFF)
    }, 100)
  }

  private val grids: Gen[(Int, Int, Vector[Int])] = for {
    w <- Gen.choose(1, 9)
    h <- Gen.choose(1, 9)
    vs <- Gen.listOfN(w * h, Gen.choose(0, 6))
  } yield (w, h, vs.toVector)

  test("tag trees invert arbitrary value grids under the packet query pattern") {
    check(Prop.forAll(grids) { case (w, h, vs) =>
      val hw = new Jp2Codec.HeaderWriter
      val encTree = new Jp2Codec.TagTree(w, h)
      for (y <- 0 until h; x <- 0 until w) encTree.setValue(x, y, vs(y * w + x))
      // packet usage: raster order; resolve each leaf with rising
      // thresholds exactly like the zero-bitplane loop
      for (y <- 0 until h; x <- 0 until w) {
        val v = vs(y * w + x)
        var t = 1
        while (t <= v) { encTree.encode(hw, x, y, t); t += 1 }
        encTree.encode(hw, x, y, v + 1)
      }
      val bytes = hw.finish()
      val hr = new Jp2Codec.HeaderReader(bytes, 0)
      val decTree = new Jp2Codec.TagTree(w, h)
      (for (y <- 0 until h; x <- 0 until w) yield {
        var t = 1
        var got = decTree.decode(hr, x, y, t)
        while (got >= t) { t += 1; got = decTree.decode(hr, x, y, t) }
        got == vs(y * w + x)
      }).forall(identity)
    }, 200)
  }
}
