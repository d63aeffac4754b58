package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Jp2Binary, Jp2Codec}

/** Pins the real JPEG2000 codec: encoder and decoder are independent
  * implementations of the published MQ + EBCOT flowcharts, so
  * exhaustive round trips over adversarial pages are the correctness
  * bar (there is no external JPEG2000 decoder in this container to
  * cross-check against — same situation as the TIFF/KTX/N5 codecs).
  */
class Jp2CodecSpec extends AnyFunSuite {

  private def roundTrip(page: Array[Array[Long]]): Unit = {
    val bytes = Jp2Binary.serialize(page)
    val back = Jp2Binary.decode(bytes)
    assert(back.length === page.length)
    for (y <- page.indices)
      assert(back(y).toSeq === page(y).toSeq, s"row $y differs")
  }

  private def fill(h: Int, w: Int)(f: (Int, Int) => Long): Array[Array[Long]] =
    Array.tabulate(h, w)((y, x) => f(y, x))

  test("deterministic pseudorandom pages round-trip at many shapes") {
    for ((h, w) <- Seq((16, 16), (64, 64), (1, 1), (5, 7), (64, 1), (1, 64), (13, 64))) {
      var seed = h * 131L + w * 17L + 7L
      def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
      roundTrip(fill(h, w)((_, _) => math.floorMod(next(), 65536L)))
    }
  }

  test("extreme and structured pages round-trip") {
    roundTrip(fill(16, 16)((_, _) => 0L))       // all zero: coeff -2^15
    roundTrip(fill(16, 16)((_, _) => 65535L))   // all max: coeff 2^15-1
    roundTrip(fill(16, 16)((_, _) => 32768L))   // all-zero coefficients: empty packet
    roundTrip(fill(16, 16)((y, x) => if (y == 7 && x == 3) 60000L else 0L)) // lone spike
    roundTrip(fill(16, 16)((y, x) => (y * 16 + x).toLong))               // gradient
    roundTrip(fill(16, 16)((y, x) => if ((x + y) % 2 == 0) 0L else 65535L)) // checkerboard
    roundTrip(fill(16, 16)((y, x) => if (x < 8) 32767L else 32769L))     // ±1 coeffs
    roundTrip(fill(12, 16)((y, _) => if (y % 4 == 0) 40000L else 32768L)) // stripe-edge runs
  }

  test("sparse pages exercise the run-length mode heavily") {
    for (density <- Seq(1, 5, 40)) {
      var seed = density * 977L
      def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
      roundTrip(fill(32, 32) { (_, _) =>
        // mostly 32768 (zero coefficient) with occasional spikes
        if (math.floorMod(next(), 100L) < density) math.floorMod(next(), 65536L) else 32768L
      })
    }
  }

  test("large pages round-trip through the multi-level wavelet path") {
    // > 64 px forces NL=2; odd dims exercise the ceil/floor split;
    // > 128 px forces MULTIPLE code blocks per subband (real 2D tag
    // trees in the packet headers)
    for ((h, w) <- Seq((128, 128), (100, 77), (65, 128), (127, 1),
                       (256, 200), (300, 131), (512, 512))) {
      var seed = h * 31L + w
      def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
      roundTrip(fill(h, w)((_, _) => math.floorMod(next(), 65536L)))
    }
  }

  test("the reversible 5/3 DWT is exactly invertible at adversarial shapes") {
    for ((h, w, nl) <- Seq((16, 16, 1), (16, 16, 2), (7, 5, 2), (1, 9, 1), (64, 3, 3))) {
      var seed = h * 7L + w * 3L + nl
      def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
      val a = Array.tabulate(h, w)((_, _) => (math.floorMod(next(), 65536L) - 32768L).toInt)
      val subbands = Jp2Codec.dwtForward(a, nl)
      assert(subbands.length === 3 * nl + 1)
      val back = Jp2Codec.dwtInverse(subbands, w, h, nl)
      for (y <- 0 until h) assert(back(y).toSeq === a(y).toSeq, s"row $y at ${w}x$h nl=$nl")
    }
  }

  test("resolution-truncated decode yields the exact low-pass preview from a packet prefix") {
    // the viewer behavior the multi-resolution packets exist for:
    // reading only resolutions 0..r reconstructs the depth-(NL-r) LL
    // approximation without touching later packets
    def codestream(bytes: Array[Byte]): Array[Byte] = {
      var off = 12
      var cs: Array[Byte] = null
      while (cs == null) {
        val len = (((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
          ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)).toInt
        if (new String(bytes.slice(off + 4, off + 8), "US-ASCII") == "jp2c")
          cs = bytes.slice(off + 8, off + len)
        off += len
      }
      cs
    }
    for ((h, w) <- Seq((64, 64), (100, 77))) {
      var seed = h * 311L + w
      def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
      val page = fill(h, w)((_, _) => math.floorMod(next(), 65536L))
      val cs = codestream(Jp2Binary.serialize(page))
      val nl = Jp2Codec.levelsFor(w, h)
      // full resolution == the plain decode, exactly
      val full = Jp2Codec.decodeCodestreamAtResolution(cs, nl)
      assert(full.map(_.toSeq).toSeq === page.map(_.toSeq).toSeq)
      // r=0: the deepest LL + DC shift, clamped — compare against the
      // forward DWT of the same page
      val shifted = Array.tabulate(h, w)((y, x) => page(y)(x).toInt - 32768)
      val ll = Jp2Codec.dwtForward(shifted, nl).head
      val preview = Jp2Codec.decodeCodestreamAtResolution(cs, 0)
      assert(preview.length === ll.h && preview.head.length === ll.w)
      for (y <- 0 until ll.h; x <- 0 until ll.w) {
        val want = math.max(0L, math.min(65535L, ll.coef(y * ll.w + x).toLong + 32768L))
        assert(preview(y)(x) === want, s"($y,$x) at ${w}x$h")
      }
    }
  }

  test("the codestream is structurally sound and the header chain still sniffs") {
    val page = fill(16, 16)((y, x) => (x * 4096 + y * 13).toLong)
    val bytes = Jp2Binary.serialize(page)
    // the dispatch sniff path is unchanged by the real codec
    val hd = Jp2Binary.parseHeader(bytes)
    assert((hd.width, hd.height, hd.nc, hd.bits) === ((16L, 16L, 1, 16)))
    // EOC closes the codestream
    assert((bytes(bytes.length - 2) & 0xFF) === 0xFF)
    assert((bytes(bytes.length - 1) & 0xFF) === 0xD9)
    // MQ byte-stuffing: inside the jp2c box no 0xFF is followed by a
    // byte over 0x8F except the marker segments we wrote ourselves
    val allowed = Set(0x4F, 0x51, 0x52, 0x5C, 0x90, 0x93, 0xD9)
    for (i <- 0 until bytes.length - 1) {
      val a = bytes(i) & 0xFF; val b = bytes(i + 1) & 0xFF
      if (a == 0xFF && b > 0x8F)
        assert(allowed.contains(b), f"stray marker-like pair FF $b%02x at $i")
    }
  }

  test("random byte corruption is always bounded: throws or returns, never hangs") {
    // the decoder's failure mode under corruption must be a loud
    // exception or a (wrong) bounded result — MQ BYTEIN feeds 1-bits
    // past the terminator, every header loop is length-bounded, and
    // signaled lengths are validated, so no input can loop forever
    val page = fill(32, 32)((y, x) => ((y * 32 + x) * 61 % 65536).toLong)
    val bytes = Jp2Binary.serialize(page)
    var seed = 12345L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    var threw = 0
    for (_ <- 0 until 200) {
      val mut = bytes.clone()
      // corrupt 1-4 bytes anywhere in the file
      for (_ <- 0 to math.floorMod(next(), 4L).toInt)
        mut(math.floorMod(next(), mut.length.toLong).toInt) = next().toByte
      val t0 = System.nanoTime()
      try { Jp2Binary.decode(mut); () }
      catch { case _: Throwable => threw += 1 }
      assert(System.nanoTime() - t0 < 5L * 1000 * 1000 * 1000, "decode took >5s on corrupt input")
    }
    assert(threw > 0) // sanity: corruption is actually being detected
  }

  test("a corrupted entropy payload fails loudly, not silently") {
    val page = fill(16, 16)((y, x) => (y * 16 + x).toLong)
    val bytes = Jp2Binary.serialize(page)
    // truncating the codeword must break the pass-count/length
    // invariants or the dimension cross-check — never return garbage
    val cut = bytes.take(bytes.length - 40)
    intercept[Throwable](Jp2Binary.decode(cut))
  }
}
