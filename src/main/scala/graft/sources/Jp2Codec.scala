package graft.sources

/** A real JPEG2000 Part-1 entropy codec (ISO/IEC 15444-1 / ITU-T
  * T.800), pure JDK, for the constrained profile [[Jp2Binary]] writes:
  * one tile, one unsigned grayscale component, one quality layer,
  * LRCP, reversible 5/3 wavelet at 0-2 decomposition levels, 64×64
  * code blocks over each subband's full grid (pages to 512×512).
  * Within that profile this is the full Tier-1/Tier-2 machinery the
  * reference leans on glymur/OpenJPEG for (`get_image`
  * tiff2octree.py:524-545 decodes `.jp2` slices at block-read time):
  *
  *  - the MQ arithmetic coder (Annex C): the 47-state Qe probability
  *    table, encoder with carry/0xFF byte-stuffing BYTEOUT and the
  *    spec FLUSH (trailing 0xFF discarded), decoder whose BYTEIN
  *    feeds 1-bits past the terminator;
  *  - the EBCOT bit-plane coder (Annex D): 19 contexts (9
  *    significance from the H/V/D neighborhood with per-band columns
  *    — LL/LH shared, HL role-swapped, HH diagonal-driven — 5 sign
  *    with the XOR convention, 3 magnitude refinement, run-length +
  *    UNIFORM), stripe-of-4 scan, and the three passes per plane —
  *    significance propagation, magnitude refinement, cleanup with
  *    run-length column mode — MSB plane cleanup-only;
  *  - the reversible 5/3 DWT (Annex F integer lifting with symmetric
  *    extension), exactly invertible at odd and degenerate shapes;
  *  - Tier-2: per-resolution packets whose headers carry true 2D
  *    inclusion and zero-bitplane TAG TREES over each subband's
  *    code-block grid (Annex B.10.2 — quad-tree minima shared across
  *    neighboring blocks), the variable-length pass-count code,
  *    Lblock length signaling, 0xFF bit-stuffing, COD/QCD/SOT/SOD
  *    marker segments, and the DC level shift (Annex G) for unsigned
  *    samples.
  *
  * Encoder and decoder are independent implementations of the same
  * published flowcharts; the spec pins them against each other with
  * exhaustive round trips (random pages, extreme values, non-square
  * shapes, multi-code-block sizes) plus structural checks (marker
  * layout, no 0xFF93+ byte pairs inside the MQ codeword).
  */
object Jp2Codec {

  // ------------------------------------------------------------ MQ tables
  // Annex C, Table C.2: (Qe, NMPS, NLPS, SWITCH) per state.
  private val Qe = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private val Nmps = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val Nlps = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val Switch = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  // Context indices (Annex D): 0-8 significance, 9-13 sign,
  // 14-16 magnitude refinement, 17 run-length, 18 uniform.
  private val CtxRun = 17
  private val CtxUni = 18
  private val NCtx = 19

  /** Initial (state, mps) per context — Table D.7: everything 0
    * except the all-zero significance context (state 4), run-length
    * (state 3) and uniform (state 46).
    */
  private def initStates(): (Array[Int], Array[Int]) = {
    val st = new Array[Int](NCtx)
    st(0) = 4; st(CtxRun) = 3; st(CtxUni) = 46
    (st, new Array[Int](NCtx))
  }

  // ------------------------------------------------------------ MQ encoder
  private[sources] final class MqEncoder {
    private val (st, mps) = initStates()
    private var a = 0x8000
    private var c = 0
    private var ct = 12
    // The spec's BP starts one position BEFORE the codestream (C.2.3):
    // a dummy byte absorbs a carry generated before the first real
    // BYTEOUT. It is dropped at flush when still zero (the normal
    // case); if a carry ever reached it, it is a real leading byte.
    // Raw growable byte buffer — this is the per-bit hot path.
    private var buf = new Array[Byte](64)
    private var n = 1 // buf(0) is the dummy
    private var b = 0

    private def byteOut(): Unit = {
      if (b == 0xFF) {
        push(c >>> 20); c &= 0xFFFFF; ct = 7
      } else if (c < 0x8000000) {
        push(c >>> 19); c &= 0x7FFFF; ct = 8
      } else {
        // carry into the previous byte, then emit per its new value
        b += 1
        buf(n - 1) = b.toByte
        if (b == 0xFF) {
          c &= 0x7FFFFFF
          push(c >>> 20); c &= 0xFFFFF; ct = 7
        } else {
          push(c >>> 19); c &= 0x7FFFF; ct = 8
        }
      }
    }

    private def push(v: Int): Unit = {
      b = v & 0xFF
      if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n * 2)
      buf(n) = b.toByte; n += 1
    }

    private def renorm(): Unit = {
      while ({
        a <<= 1; c <<= 1; ct -= 1
        if (ct == 0) byteOut()
        (a & 0x8000) == 0
      }) ()
    }

    def encode(ctx: Int, bit: Int): Unit = {
      val q = Qe(st(ctx))
      if (bit == mps(ctx)) {
        a -= q
        if ((a & 0x8000) == 0) {
          if (a < q) a = q else c += q
          st(ctx) = Nmps(st(ctx))
          renorm()
        } else c += q
      } else {
        a -= q
        if (a < q) c += q else a = q
        if (Switch(st(ctx)) == 1) mps(ctx) = 1 - mps(ctx)
        st(ctx) = Nlps(st(ctx))
        renorm()
      }
    }

    /** Annex C.2.9 FLUSH: set as many C bits as possible, push the
      * final bytes, discard a trailing 0xFF (the decoder's BYTEIN
      * synthesizes 1-bits past the end).
      */
    def flush(): Array[Byte] = {
      // SETBITS: fill the low-order bits of C with 1s while staying
      // inside [C, C+A) — the decoder synthesizes 1-bits past the
      // terminator, so the flushed prefix followed by 1s must still
      // land in the final interval
      val tempc = c + a
      c |= 0xFFFF
      if (c >= tempc) c -= 0x8000
      c <<= ct; byteOut()
      c <<= ct; byteOut()
      if (n > 0 && (buf(n - 1) & 0xFF) == 0xFF) n -= 1
      val start = if (n > 0 && buf(0) == 0) 1 else 0 // drop the dummy
      java.util.Arrays.copyOfRange(buf, start, n)
    }
  }

  // ------------------------------------------------------------ MQ decoder
  private[sources] final class MqDecoder(data: Array[Byte]) {
    private val (st, mps) = initStates()
    private var bp = 0
    private var a = 0
    private var c = 0
    private var ct = 0

    private def byteAt(i: Int): Int =
      if (i < data.length) data(i) & 0xFF else 0xFF

    // INITDEC
    c = byteAt(0) << 16
    byteIn()
    c <<= 7; ct -= 7; a = 0x8000

    private def byteIn(): Unit = {
      if (byteAt(bp) == 0xFF) {
        if (byteAt(bp + 1) > 0x8F) { c += 0xFF00; ct = 8 }
        else { bp += 1; c += byteAt(bp) << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp) << 8; ct = 8 }
    }

    private def renorm(): Unit = {
      while ({
        if (ct == 0) byteIn()
        a <<= 1; c <<= 1; ct -= 1
        (a & 0x8000) == 0
      }) ()
    }

    def decode(ctx: Int): Int = {
      val q = Qe(st(ctx))
      var d = 0
      a -= q
      if (((c >>> 16) & 0xFFFF) < q) {
        // LPS interval selected: conditional exchange
        if (a < q) { d = mps(ctx); st(ctx) = Nmps(st(ctx)) }
        else {
          d = 1 - mps(ctx)
          if (Switch(st(ctx)) == 1) mps(ctx) = 1 - mps(ctx)
          st(ctx) = Nlps(st(ctx))
        }
        a = q
        renorm()
      } else {
        c -= q << 16
        if ((a & 0x8000) == 0) {
          if (a < q) {
            d = 1 - mps(ctx)
            if (Switch(st(ctx)) == 1) mps(ctx) = 1 - mps(ctx)
            st(ctx) = Nlps(st(ctx))
          } else { d = mps(ctx); st(ctx) = Nmps(st(ctx)) }
          renorm()
        } else d = mps(ctx)
      }
      d
    }
  }

  // ------------------------------------------------------ bit-plane coder

  /** Subband orientations. LL and LH share a context column; HL is
    * that column with the H and V roles swapped; HH has its own
    * diagonal-driven column (Table D.1).
    */
  final val BandLL = 0
  final val BandHL = 1
  final val BandLH = 2
  final val BandHH = 3

  private def sigCtxLLLH(h: Int, v: Int, d: Int): Int =
    if (h == 2) 8
    else if (h == 1) { if (v >= 1) 7 else if (d >= 1) 6 else 5 }
    else { // h == 0
      if (v == 2) 4 else if (v == 1) 3
      else if (d >= 2) 2 else if (d == 1) 1 else 0
    }

  private def sigCtxHH(h: Int, v: Int, d: Int): Int = {
    val hv = h + v
    if (d >= 3) 8
    else if (d == 2) { if (hv >= 1) 7 else 6 }
    else if (d == 1) { if (hv >= 2) 5 else if (hv == 1) 4 else 3 }
    else { if (hv >= 2) 2 else if (hv == 1) 1 else 0 }
  }

  /** Significance context from the neighborhood counts — Table D.1,
    * per band orientation.
    */
  private def sigCtx(band: Int, h: Int, v: Int, d: Int): Int = band match {
    case BandHL => sigCtxLLLH(v, h, d) // H/V roles swapped
    case BandHH => sigCtxHH(h, v, d)
    case _      => sigCtxLLLH(h, v, d)
  }

  /** Sign context + XOR bit from the clamped H/V sign contributions —
    * Tables D.3/D.4.
    */
  private def signCtx(hc: Int, vc: Int): (Int, Int) = (hc, vc) match {
    case (1, 1)   => (13, 0)
    case (1, 0)   => (12, 0)
    case (1, -1)  => (11, 0)
    case (0, 1)   => (10, 0)
    case (0, 0)   => (9, 0)
    case (0, -1)  => (10, 1)
    case (-1, 1)  => (11, 1)
    case (-1, 0)  => (12, 1)
    case (-1, -1) => (13, 1)
    case other    => throw new IllegalStateException(s"sign ctx $other")
  }

  /** Shared per-block coding state driven identically by encoder and
    * decoder — the pass structure, scan order and context formation
    * live HERE once, with tiny closures doing the actual bit IO, so
    * the two directions cannot drift apart.
    */
  private final class BlockState(val w: Int, val h: Int, val band: Int) {
    val sigma = new Array[Boolean](w * h)
    val sign = new Array[Int](w * h) // 0 positive, 1 negative
    val mag = new Array[Int](w * h)
    val visited = new Array[Boolean](w * h)
    val refined = new Array[Boolean](w * h)

    private def sig(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= w || y >= h) 0
      else if (sigma(y * w + x)) 1 else 0

    // hot path: separate accessors, no tuple allocation per coded bit
    def nH(x: Int, y: Int): Int = sig(x - 1, y) + sig(x + 1, y)
    def nV(x: Int, y: Int): Int = sig(x, y - 1) + sig(x, y + 1)
    def nD(x: Int, y: Int): Int =
      sig(x - 1, y - 1) + sig(x + 1, y - 1) + sig(x - 1, y + 1) + sig(x + 1, y + 1)
    def anyNeighbor(x: Int, y: Int): Boolean =
      nH(x, y) + nV(x, y) + nD(x, y) > 0

    private def signContrib(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= w || y >= h) 0
      else if (!sigma(y * w + x)) 0
      else if (sign(y * w + x) == 0) 1 else -1

    def signContext(x: Int, y: Int): (Int, Int) = {
      val hc = math.max(-1, math.min(1, signContrib(x - 1, y) + signContrib(x + 1, y)))
      val vc = math.max(-1, math.min(1, signContrib(x, y - 1) + signContrib(x, y + 1)))
      signCtx(hc, vc)
    }

    def magContext(x: Int, y: Int): Int = {
      if (refined(y * w + x)) 16
      else if (anyNeighbor(x, y)) 15 else 14
    }

    /** One full coding schedule over `numPlanes` magnitude planes.
      * `sigBit(ctx)`, `rawBit(ctx)` encode-or-decode one decision;
      * `planeBit(idx)` is the encoder's source of magnitude bits (the
      * decoder ORs decoded bits into `mag` itself, so it passes a
      * reader of the evolving state). `onSig(idx, plane)` runs when a
      * coefficient becomes significant (decoder sets the plane bit).
      */
    def run(numPlanes: Int,
            bitIO: (Int, Int) => Int, // (ctx, encBit) => bit
            planeBit: (Int, Int) => Int, // (idx, plane) => 0/1 for enc; dec ignores
            onNewSig: (Int, Int) => Unit): Unit = {
      for (p <- (numPlanes - 1) to 0 by -1) {
        if (p < numPlanes - 1) {
          sigPropPass(p, bitIO, planeBit, onNewSig)
          magRefPass(p, bitIO, planeBit)
        }
        cleanupPass(p, bitIO, planeBit, onNewSig)
        java.util.Arrays.fill(visited, false)
      }
    }

    private def codeSignificance(x: Int, y: Int, p: Int,
        bitIO: (Int, Int) => Int, planeBit: (Int, Int) => Int,
        onNewSig: (Int, Int) => Unit): Unit = {
      val idx = y * w + x
      val bit = bitIO(sigCtx(band, nH(x, y), nV(x, y), nD(x, y)), planeBit(idx, p))
      if (bit == 1) {
        sigma(idx) = true
        onNewSig(idx, p)
        val (sctx, xor) = signContext(x, y)
        val coded = bitIO(sctx, sign(idx) ^ xor)
        sign(idx) = coded ^ xor
      }
    }

    private def sigPropPass(p: Int, bitIO: (Int, Int) => Int,
        planeBit: (Int, Int) => Int, onNewSig: (Int, Int) => Unit): Unit = {
      var y0 = 0
      while (y0 < h) {
        val yEnd = math.min(y0 + 4, h)
        var x = 0
        while (x < w) {
          var y = y0
          while (y < yEnd) {
            val idx = y * w + x
            if (!sigma(idx) && anyNeighbor(x, y)) {
              codeSignificance(x, y, p, bitIO, planeBit, onNewSig)
              visited(idx) = true
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    private def magRefPass(p: Int, bitIO: (Int, Int) => Int,
        planeBit: (Int, Int) => Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        val yEnd = math.min(y0 + 4, h)
        var x = 0
        while (x < w) {
          var y = y0
          while (y < yEnd) {
            val idx = y * w + x
            if (sigma(idx) && !visited(idx)) {
              val bit = bitIO(magContext(x, y), planeBit(idx, p))
              if (bit == 1) mag(idx) |= 1 << p
              refined(idx) = true
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    private def cleanupPass(p: Int, bitIO: (Int, Int) => Int,
        planeBit: (Int, Int) => Int, onNewSig: (Int, Int) => Unit): Unit = {
      var y0 = 0
      while (y0 < h) {
        val rows = math.min(4, h - y0)
        for (x <- 0 until w) {
          var start = 0
          var eligible = rows == 4
          var i = 0
          while (eligible && i < 4) {
            val y = y0 + i
            val idx = y * w + x
            eligible = !sigma(idx) && !visited(idx) && !anyNeighbor(x, y)
            i += 1
          }
          if (eligible) {
            val some = (0 until 4).exists(i => planeBit((y0 + i) * w + x, p) == 1)
            val runBit = bitIO(CtxRun, if (some) 1 else 0)
            if (runBit == 0) start = 4
            else {
              // the interrupt position, two UNIFORM bits MSB-first.
              // Encoder side derives r from its own plane bits; the
              // decoder reconstructs it from the decoded bits.
              val encR = (0 until 4).indexWhere(i => planeBit((y0 + i) * w + x, p) == 1)
              val hiSrc = if (encR >= 0) (encR >> 1) & 1 else 0
              val loSrc = if (encR >= 0) encR & 1 else 0
              val hi = bitIO(CtxUni, hiSrc)
              val lo = bitIO(CtxUni, loSrc)
              val r = (hi << 1) | lo
              val y = y0 + r
              val idx = y * w + x
              sigma(idx) = true
              onNewSig(idx, p)
              val (sctx, xor) = signContext(x, y)
              val coded = bitIO(sctx, sign(idx) ^ xor)
              sign(idx) = coded ^ xor
              start = r + 1
            }
          }
          for (i <- start until rows) {
            val y = y0 + i
            val idx = y * w + x
            if (!sigma(idx) && !visited(idx))
              codeSignificance(x, y, p, bitIO, planeBit, onNewSig)
          }
        }
        y0 += 4
      }
    }
  }

  /** Tier-1 encode of one code block of signed coefficients (row
    * major). Returns (numPlanes, codeword bytes); numPlanes = 0 for an
    * all-zero block (no codeword — the packet signals non-inclusion).
    */
  def encodeBlock(coef: Array[Int], w: Int, h: Int, band: Int = BandLL): (Int, Array[Byte]) = {
    require(coef.length == w * h, "coef length mismatch")
    val maxMag = coef.foldLeft(0)((m, v) => math.max(m, math.abs(v)))
    if (maxMag == 0) return (0, Array.emptyByteArray)
    val numPlanes = 32 - Integer.numberOfLeadingZeros(maxMag)
    val st = new BlockState(w, h, band)
    for (i <- coef.indices) {
      st.mag(i) = math.abs(coef(i))
      st.sign(i) = if (coef(i) < 0) 1 else 0
    }
    val enc = new MqEncoder
    st.run(numPlanes,
      bitIO = (ctx, bit) => { enc.encode(ctx, bit); bit },
      planeBit = (idx, p) => (st.mag(idx) >> p) & 1,
      onNewSig = (_, _) => ())
    (numPlanes, enc.flush())
  }

  /** Tier-1 decode: the inverse of [[encodeBlock]] given the plane
    * count from the packet header.
    */
  def decodeBlock(data: Array[Byte], w: Int, h: Int, numPlanes: Int,
      band: Int = BandLL): Array[Int] = {
    val st = new BlockState(w, h, band)
    if (numPlanes == 0) return new Array[Int](w * h)
    val dec = new MqDecoder(data)
    st.run(numPlanes,
      bitIO = (ctx, _) => dec.decode(ctx),
      planeBit = (idx, p) => (st.mag(idx) >> p) & 1,
      onNewSig = (idx, p) => st.mag(idx) |= 1 << p)
    // refinement/significance bits were ORed into mag as decoded
    Array.tabulate(w * h)(i =>
      if (!st.sigma(i)) 0
      else if (st.sign(i) == 1) -st.mag(i) else st.mag(i))
  }

  // ------------------------------------------------- reversible 5/3 DWT

  /** One subband: orientation, dimensions and row-major coefficients. */
  final case class Subband(band: Int, w: Int, h: Int, coef: Array[Int])

  /** Forward 1D reversible 5/3 lifting (Annex F.4.8.2) with symmetric
    * extension: returns (low = ceil(n/2) samples, high = floor(n/2)).
    */
  private def fwd53(x: Array[Int]): (Array[Int], Array[Int]) = {
    val n = x.length
    if (n == 1) return (Array(x(0)), Array.emptyIntArray)
    val nh = n / 2
    val nl = n - nh
    val d = new Array[Int](nh)
    val s = new Array[Int](nl)
    def xe(i: Int): Int = // symmetric extension of x
      if (i < 0) x(-i) else if (i >= n) x(2 * n - 2 - i) else x(i)
    for (k <- 0 until nh) d(k) = x(2 * k + 1) - ((xe(2 * k) + xe(2 * k + 2)) >> 1)
    def de(k: Int): Int = // symmetric extension of d
      if (nh == 0) 0 else if (k < 0) d(0) else if (k >= nh) d(nh - 1) else d(k)
    for (k <- 0 until nl) s(k) = x(2 * k) + ((de(k - 1) + de(k) + 2) >> 2)
    (s, d)
  }

  /** Inverse of [[fwd53]]. */
  private def inv53(s: Array[Int], d: Array[Int]): Array[Int] = {
    val nl = s.length
    val nh = d.length
    val n = nl + nh
    if (n == 1) return Array(s(0))
    val x = new Array[Int](n)
    def de(k: Int): Int =
      if (nh == 0) 0 else if (k < 0) d(0) else if (k >= nh) d(nh - 1) else d(k)
    for (k <- 0 until nl) x(2 * k) = s(k) - ((de(k - 1) + de(k) + 2) >> 2)
    def xe(i: Int): Int =
      if (i < 0) x(-i) else if (i >= n) x(2 * n - 2 - i) else x(i)
    for (k <- 0 until nh) x(2 * k + 1) = d(k) + ((xe(2 * k) + xe(2 * k + 2)) >> 1)
    x
  }

  /** One 2D decomposition level: vertical then horizontal lifting,
    * yielding (LL, HL, LH, HH). HL is horizontally high-pass.
    */
  private def dwt2d(a: Array[Array[Int]]): (Array[Array[Int]], Array[Array[Int]], Array[Array[Int]], Array[Array[Int]]) = {
    val h = a.length; val w = a(0).length
    // vertical on each column
    val lowH = h - h / 2
    val top = Array.ofDim[Int](lowH, w)    // vertically low
    val bot = Array.ofDim[Int](h / 2, w)   // vertically high
    for (x <- 0 until w) {
      val (s, d) = fwd53(Array.tabulate(h)(y => a(y)(x)))
      for (y <- s.indices) top(y)(x) = s(y)
      for (y <- d.indices) bot(y)(x) = d(y)
    }
    // horizontal on each row of both halves
    def split(rows: Array[Array[Int]]): (Array[Array[Int]], Array[Array[Int]]) = {
      if (rows.isEmpty) return (Array.empty, Array.empty)
      val lo = Array.ofDim[Int](rows.length, w - w / 2)
      val hi = Array.ofDim[Int](rows.length, w / 2)
      for (y <- rows.indices) {
        val (s, d) = fwd53(rows(y))
        Array.copy(s, 0, lo(y), 0, s.length)
        Array.copy(d, 0, hi(y), 0, d.length)
      }
      (lo, hi)
    }
    val (ll, hl) = split(top)
    val (lh, hh) = split(bot)
    (ll, hl, lh, hh)
  }

  private def idwt2d(ll: Array[Array[Int]], hl: Array[Array[Int]],
      lh: Array[Array[Int]], hh: Array[Array[Int]]): Array[Array[Int]] = {
    val lowH = ll.length; val highH = lh.length
    val lowW = if (lowH > 0) ll(0).length else if (highH > 0) lh(0).length else 0
    val highW = if (lowH > 0) hl(0).length else if (highH > 0) hh(0).length else 0
    val h = lowH + highH; val w = lowW + highW
    // horizontal inverse per row of each half
    val top = Array.tabulate(lowH)(y => inv53(ll(y), hl(y)))
    val bot = Array.tabulate(highH)(y => inv53(lh(y), hh(y)))
    // vertical inverse per column
    val out = Array.ofDim[Int](h, w)
    for (x <- 0 until w) {
      val col = inv53(Array.tabulate(lowH)(y => top(y)(x)),
        Array.tabulate(highH)(y => bot(y)(x)))
      for (y <- 0 until h) out(y)(x) = col(y)
    }
    out
  }

  /** NL-level forward DWT. Returns subbands in PACKET order: the
    * deepest LL first, then each level's (HL, LH, HH) from deepest
    * (lowest resolution) to shallowest.
    */
  def dwtForward(a0: Array[Array[Int]], levels: Int): Seq[Subband] = {
    var a = a0
    val perLevel = scala.collection.mutable.ArrayBuffer.empty[(Subband, Subband, Subband)]
    for (_ <- 0 until levels) {
      val (ll, hl, lh, hh) = dwt2d(a)
      def sb(band: Int, g: Array[Array[Int]]): Subband = {
        val gh = g.length; val gw = if (gh > 0) g(0).length else 0
        Subband(band, gw, gh, Array.tabulate(gw * gh)(i => g(i / gw)(i % gw)))
      }
      perLevel += ((sb(BandHL, hl), sb(BandLH, lh), sb(BandHH, hh)))
      a = ll
    }
    val gh = a.length; val gw = if (gh > 0) a(0).length else 0
    val llSb = Subband(BandLL, gw, gh, Array.tabulate(gw * gh)(i => a(i / gw)(i % gw)))
    llSb +: perLevel.reverse.flatMap(t => Seq(t._1, t._2, t._3)).toSeq
  }

  /** Inverse of [[dwtForward]] given the full-image dimensions. */
  def dwtInverse(subbands: Seq[Subband], w: Int, h: Int, levels: Int): Array[Array[Int]] = {
    def grid(sb: Subband): Array[Array[Int]] =
      Array.tabulate(sb.h, sb.w)((y, x) => sb.coef(y * sb.w + x))
    var a = grid(subbands.head)
    // level dims from the shallowest down: recompute the (w, h) at
    // each depth so odd sizes reassemble exactly
    val dims = Iterator.iterate((w, h)) { case (dw, dh) => (dw - dw / 2, dh - dh / 2) }
      .take(levels + 1).toSeq // dims(k) = size at depth k
    for (depth <- levels to 1 by -1) {
      val idx = 1 + (levels - depth) * 3
      val (hl, lh, hh) = (subbands(idx), subbands(idx + 1), subbands(idx + 2))
      a = idwt2d(a, grid(hl), grid(lh), grid(hh))
      val (ew, eh) = dims(depth - 1)
      require(a.length == eh && a(0).length == ew,
        s"inverse DWT produced ${a(0).length}x${a.length}, expected ${ew}x$eh")
    }
    a
  }

  // ------------------------------------------------------------ Tier-2

  /** Packet-header bit writer with the 0xFF stuffing rule: a byte of
    * 0xFF is followed by a 7-bit byte (MSB forced 0).
    */
  private[sources] final class HeaderWriter {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    private var cur = 0
    private var nBits = 0
    private def limit: Int = if (out.nonEmpty && out.last == 0xFF) 7 else 8
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nBits += 1
      if (nBits == limit) { out += cur; cur = 0; nBits = 0 }
    }
    def bits(v: Int, n: Int): Unit = for (i <- (n - 1) to 0 by -1) bit((v >> i) & 1)
    def finish(): Array[Byte] = {
      if (nBits > 0) { while (nBits != 0 && nBits < limit) { cur <<= 1; nBits += 1 }; out += cur }
      if (out.nonEmpty && out.last == 0xFF) out += 0 // header may not end in 0xFF
      out.map(_.toByte).toArray
    }
  }

  private[sources] final class HeaderReader(data: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nBits = 0
    private var prevFF = false
    def bit(): Int = {
      if (nBits == 0) {
        cur = data(pos) & 0xFF; pos += 1
        nBits = if (prevFF) 7 else 8
        prevFF = cur == 0xFF
        if (nBits == 7) cur &= 0x7F
      }
      nBits -= 1
      (cur >> nBits) & 1
    }
    def bits(n: Int): Int = (0 until n).foldLeft(0)((acc, _) => (acc << 1) | bit())
    /** Byte-aligns and returns the next byte offset. */
    def align(): Int = { nBits = 0; if (prevFF) { prevFF = false; pos += 1 }; pos }
  }

  // ------------------------------------------------------------ tag trees

  /** A 2D tag tree (Annex B.10.2): a quad-tree over the code-block
    * grid whose internal node values are the minima of their children,
    * letting the packet header share "value ≥ t" information across
    * neighboring code blocks. One structure serves both directions:
    * the encoder seeds leaf values with [[setValue]]; the decoder
    * leaves values unknown and discovers them bit by bit. A 1×1 tree
    * degenerates to the single-node unary code.
    */
  private[sources] final class TagTree(lw: Int, lh: Int) {
    // level 0 = leaves; each level halves (ceil) until 1×1; nodes
    // stored per level in raster order, root last
    private val dims = Iterator.iterate((lw, lh)) { case (a, b) =>
      ((a + 1) / 2, (b + 1) / 2)
    }.takeWhile(_ => true).take(
      1 + math.max(ceilLog2(math.max(lw, 1)), ceilLog2(math.max(lh, 1)))).toIndexedSeq
    private def ceilLog2(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.max(1, v) - 1)
    private val value = dims.map { case (a, b) => Array.fill(a * b)(Int.MaxValue) }
    private val low = dims.map { case (a, b) => new Array[Int](a * b) }
    private val known = dims.map { case (a, b) => new Array[Boolean](a * b) }

    def setValue(x: Int, y: Int, v: Int): Unit = {
      value(0)(y * lw + x) = v
      // push minima up
      var lvl = 0
      var (cx, cy) = (x, y)
      while (lvl + 1 < dims.length) {
        cx /= 2; cy /= 2; lvl += 1
        val i = cy * dims(lvl)._1 + cx
        if (v < value(lvl)(i)) value(lvl)(i) = v
      }
    }

    /** Path of (level, index) from root down to leaf (x, y). */
    private def path(x: Int, y: Int): Seq[(Int, Int)] =
      (dims.length - 1 to 0 by -1).map { lvl =>
        val (cx, cy) = (x >> lvl, y >> lvl)
        (lvl, cy * dims(lvl)._1 + cx)
      }

    /** Emit bits so a decoder running [[decode]] with the same
      * threshold resolves whether this leaf's value is < t (and if so,
      * exactly what it is).
      */
    def encode(hw: HeaderWriter, x: Int, y: Int, threshold: Int): Unit = {
      var bound = 0
      for ((lvl, i) <- path(x, y)) {
        if (low(lvl)(i) < bound) low(lvl)(i) = bound else bound = low(lvl)(i)
        var done = false
        while (!done && bound < threshold) {
          if (bound < value(lvl)(i)) { hw.bit(0); bound += 1; low(lvl)(i) = bound }
          else {
            if (!known(lvl)(i)) { hw.bit(1); known(lvl)(i) = true }
            done = true
          }
        }
        low(lvl)(i) = bound
        if (!done) return // bound reached threshold: leaf stays unresolved
        bound = value(lvl)(i)
      }
    }

    /** Returns the leaf's value if it resolves below `threshold`,
      * otherwise `threshold` (meaning "at least threshold").
      */
    def decode(hr: HeaderReader, x: Int, y: Int, threshold: Int): Int = {
      var bound = 0
      var leafValue = threshold
      val p = path(x, y)
      var pi = 0
      var stop = false
      while (pi < p.length && !stop) {
        val (lvl, i) = p(pi)
        if (low(lvl)(i) < bound) low(lvl)(i) = bound else bound = low(lvl)(i)
        if (!known(lvl)(i)) {
          var done = false
          while (!done && bound < threshold) {
            if (hr.bit() == 1) { known(lvl)(i) = true; value(lvl)(i) = bound; done = true }
            else { bound += 1; low(lvl)(i) = bound }
          }
          low(lvl)(i) = bound
          if (!done) stop = true // "≥ threshold"
        }
        if (!stop) {
          bound = value(lvl)(i)
          if (pi == p.length - 1) leafValue = value(lvl)(i)
        }
        pi += 1
      }
      leafValue
    }
  }

  /** Code-block grid for a subband: 64×64 blocks in raster order. */
  private val CbSize = 64
  private def cbGrid(sw: Int, sh: Int): (Int, Int) =
    (math.max(1, (sw + CbSize - 1) / CbSize), math.max(1, (sh + CbSize - 1) / CbSize))

  /** One packet holding the full code-block grid of every subband of
    * its resolution: non-empty bit, then per subband, per code block
    * in raster order — inclusion tag tree, zero-bitplane tag tree,
    * pass count, Lblock + length — then the concatenated MQ
    * codewords. `mbs` is each subband's plane budget from QCD
    * (Mb = exponent + guards − 1).
    */
  /** One subband's contribution to a packet: grid dims plus each code
    * block's (numPlanes, codeword) in raster order.
    */
  private final case class SubbandPacketPart(gw: Int, gh: Int, mb: Int,
      cbs: IndexedSeq[(Int, Array[Byte])])

  private def writePassCount(hw: HeaderWriter, passes: Int): Unit = {
    if (passes == 1) hw.bit(0)
    else if (passes == 2) hw.bits(2, 2) // "10"
    else if (passes <= 5) { hw.bits(3, 2); hw.bits(passes - 3, 2) }
    else if (passes <= 36) { hw.bits(0xF, 4); hw.bits(passes - 6, 5) }
    else { hw.bits(0x1FF, 9); hw.bits(passes - 37, 7) }
  }

  private def readPassCount(hr: HeaderReader): Int = {
    if (hr.bit() == 0) 1
    else if (hr.bit() == 0) 2
    else {
      val two = hr.bits(2)
      if (two != 3) 3 + two
      else {
        val five = hr.bits(5)
        if (five != 31) 6 + five
        else 37 + hr.bits(7) // nine leading 1s consumed above
      }
    }
  }

  private def writePacket(parts: Seq[SubbandPacketPart]): Array[Byte] = {
    val hw = new HeaderWriter
    if (parts.forall(_.cbs.forall(_._1 == 0))) {
      hw.bit(0) // empty packet: nothing included
      return hw.finish()
    }
    hw.bit(1) // packet non-empty
    for (part <- parts) {
      val incl = new TagTree(part.gw, part.gh)
      val zbp = new TagTree(part.gw, part.gh)
      for (gy <- 0 until part.gh; gx <- 0 until part.gw) {
        val (numPlanes, _) = part.cbs(gy * part.gw + gx)
        // inclusion value: first layer the cb appears in (0), or 1 =
        // beyond the only layer; zero-bitplanes only matter when
        // included, but the tag tree needs a consistent value
        incl.setValue(gx, gy, if (numPlanes == 0) 1 else 0)
        zbp.setValue(gx, gy, if (numPlanes == 0) 0 else part.mb - numPlanes)
      }
      for (gy <- 0 until part.gh; gx <- 0 until part.gw) {
        val (numPlanes, body) = part.cbs(gy * part.gw + gx)
        incl.encode(hw, gx, gy, 1)
        if (numPlanes > 0) {
          require(numPlanes <= part.mb, s"numPlanes $numPlanes exceeds Mb ${part.mb}")
          val missing = part.mb - numPlanes
          var t = 1
          while (t <= missing) { zbp.encode(hw, gx, gy, t); t += 1 }
          zbp.encode(hw, gx, gy, missing + 1) // resolves: value == missing
          writePassCount(hw, 3 * numPlanes - 2)
          // Lblock: starts at 3; k "1" bits raise it, then "0", then
          // the length on (3 + k + floor(log2(passes))) bits
          val passes = 3 * numPlanes - 2
          val lenBitsBase = 3 + (31 - Integer.numberOfLeadingZeros(passes))
          var k = 0
          while ((1 << (lenBitsBase + k)) <= body.length) k += 1
          for (_ <- 0 until k) hw.bit(1)
          hw.bit(0)
          hw.bits(body.length, lenBitsBase + k)
        }
      }
    }
    hw.finish() ++ parts.flatMap(_.cbs.map(_._2)).flatten
  }

  private def readPacket(data: Array[Byte], off: Int,
      grids: Seq[(Int, Int, Int)]): (Seq[IndexedSeq[(Int, Array[Byte])]], Int) = {
    val hr = new HeaderReader(data, off)
    if (hr.bit() == 0)
      return (grids.map { case (gw, gh, _) =>
        IndexedSeq.fill(gw * gh)((0, Array.emptyByteArray))
      }, hr.align())
    val metas = grids.map { case (gw, gh, mb) =>
      val incl = new TagTree(gw, gh)
      val zbp = new TagTree(gw, gh)
      (for (gy <- 0 until gh; gx <- 0 until gw) yield {
        if (incl.decode(hr, gx, gy, 1) >= 1) (0, 0) // not included
        else {
          var t = 1
          var missing = zbp.decode(hr, gx, gy, t)
          while (missing >= t) { t += 1; missing = zbp.decode(hr, gx, gy, t) }
          val numPlanes = mb - missing
          require(numPlanes > 0, s"no magnitude planes (missing=$missing, mb=$mb)")
          val passes = readPassCount(hr)
          require(passes == 3 * numPlanes - 2,
            s"pass count $passes does not match $numPlanes planes")
          var k = 0
          while (hr.bit() == 1) k += 1
          val lenBits = 3 + k + (31 - Integer.numberOfLeadingZeros(passes))
          (numPlanes, hr.bits(lenBits))
        }
      }).toIndexedSeq
    }
    var pos = hr.align()
    val out = metas.map(_.map { case (numPlanes, len) =>
      require(pos + len <= data.length,
        s"codeword truncated: $len bytes signaled, ${data.length - pos} present")
      val body = data.slice(pos, pos + len)
      pos += len
      (numPlanes, body)
    })
    (out, pos)
  }

  // -------------------------------------------------- codestream assembly

  private val GuardBits = 2

  private def putU16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }
  private def putU32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }
  private def getU16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def getU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Subband energy gain for the reversible 5/3 (LL 0, HL/LH 1,
    * HH 2); the QCD exponent is bits + gain + 1, giving a plane
    * budget comfortably above the lifting's worst-case coefficient
    * growth at every depth.
    */
  private def bandGain(band: Int): Int = band match {
    case BandLL => 0
    case BandHH => 2
    case _      => 1
  }

  /** Decomposition levels for a page: none for tiny pages, otherwise
    * enough that every subband fits one 64×64 code block — a page up
    * to 128×128 works at NL ≥ 1 because the shallowest (largest)
    * subbands are ⌈dim/2⌉.
    */
  def levelsFor(w: Int, h: Int): Int = {
    val m = math.max(w, h)
    if (m <= 4) 0 else if (m <= 64) 1 else 2
  }

  /** Everything between SIZ and EOC: COD, QCD, SOT, SOD, one packet
    * per resolution level (LRCP, one layer). `bits` is the unsigned
    * sample depth; the DC level shift (Annex G.1.2) recenters to
    * signed, then the reversible 5/3 DWT decomposes NL levels and
    * each subband is Tier-1 coded as one code block.
    */
  /** Tier-1 code every 64×64 code block of one subband, raster order. */
  private def codeSubband(sb: Subband, mb: Int): SubbandPacketPart = {
    val (gw, gh) = cbGrid(sb.w, sb.h)
    val cbs = (for (gy <- 0 until gh; gx <- 0 until gw) yield {
      val x0 = gx * CbSize; val y0 = gy * CbSize
      val cw = math.min(CbSize, sb.w - x0)
      val ch = math.min(CbSize, sb.h - y0)
      if (cw <= 0 || ch <= 0) (0, Array.emptyByteArray)
      else {
        val rect = new Array[Int](cw * ch)
        for (y <- 0 until ch; x <- 0 until cw)
          rect(y * cw + x) = sb.coef((y0 + y) * sb.w + (x0 + x))
        encodeBlock(rect, cw, ch, sb.band)
      }
    }).toIndexedSeq
    SubbandPacketPart(gw, gh, mb, cbs)
  }

  def encodeTail(page: Array[Array[Long]], bits: Int): Array[Byte] = {
    val (h, w) = (page.length, page.head.length)
    require(w <= 512 && h <= 512,
      s"profile codes a single tile; got ${w}x$h (max 512)")
    val nl = levelsFor(w, h)
    val shift = 1 << (bits - 1)
    val coef = Array.tabulate(h, w) { (y, x) =>
      val s = page(y)(x)
      require(s >= 0 && s < (1L << bits), s"sample $s out of $bits-bit range")
      s.toInt - shift
    }
    val subbands = dwtForward(coef, nl)
    val coded = subbands.map(sb =>
      codeSubband(sb, bits + bandGain(sb.band) + 1 + GuardBits - 1))
    // resolution r=0 is the deepest LL; r>=1 groups (HL, LH, HH)
    val packets = (0 to nl).map { r =>
      writePacket(if (r == 0) Seq(coded.head) else coded.slice(1 + (r - 1) * 3, 1 + r * 3))
    }
    val body = packets.flatten.toArray
    val out = new java.io.ByteArrayOutputStream()
    // COD: default precincts, LRCP, 1 layer, no MCT, NL levels,
    // 64x64 code blocks, no style flags, 5/3 reversible
    putU16(out, 0xFF52); putU16(out, 12)
    out.write(0)                 // Scod
    out.write(0); putU16(out, 1) // SGcod: LRCP, 1 layer
    out.write(0)                 // MCT none
    out.write(nl)                // SPcod: NL
    out.write(4); out.write(4)   // xcb-2, ycb-2 → 64×64
    out.write(0)                 // code-block style
    out.write(1)                 // transform: 5/3 reversible
    // QCD: no quantization (style 0), guard bits, one exponent per
    // subband in packet order (deepest LL, then HL/LH/HH per level)
    putU16(out, 0xFF5C); putU16(out, 3 + subbands.length)
    out.write(GuardBits << 5)    // Sqcd
    subbands.foreach(sb => out.write((bits + bandGain(sb.band) + 1) << 3))
    // SOT: one tile-part covering the tile
    val psot = 12 + 2 + body.length // SOT segment + SOD + packets
    putU16(out, 0xFF90); putU16(out, 10)
    putU16(out, 0)               // Isot
    putU32(out, psot.toLong)
    out.write(0); out.write(1)   // TPsot, TNsot
    putU16(out, 0xFF93)          // SOD
    out.write(body)
    out.toByteArray
  }

  /** Decode the full codestream (SOC..EOC) back to unsigned samples.
    * Walks the marker segments, parses one packet per resolution,
    * runs Tier-1 per subband, inverts the DWT and undoes the DC
    * level shift.
    */
  def decodeCodestream(cs: Array[Byte]): Array[Array[Long]] =
    decodeCodestreamAtResolution(cs, Int.MaxValue)

  /** Decode only resolutions 0..`maxRes` — the reason the codestream
    * is packetized by resolution at all: a viewer zoomed out reads the
    * LRCP prefix and reconstructs the depth-(NL−maxRes) LL
    * approximation at 1/2^(NL−maxRes) scale per axis WITHOUT touching
    * the higher-resolution packets (the reference's Horta viewer
    * behavior — "at low zoom, lower resolution images are
    * displayed"). `maxRes ≥ NL` decodes everything exactly; lower
    * values return the reversible low-pass preview with the DC level
    * shift re-applied (clamped to the sample range — the 5/3 low-pass
    * can overshoot by a few codes at sharp edges).
    */
  def decodeCodestreamAtResolution(cs: Array[Byte], maxRes: Int): Array[Array[Long]] = {
    require(getU16(cs, 0) == 0xFF4F && getU16(cs, 2) == 0xFF51,
      "codestream must start SOC, SIZ")
    val lsiz = getU16(cs, 4)
    val w = (getU32(cs, 8) - getU32(cs, 16)).toInt  // Xsiz - XOsiz
    val h = (getU32(cs, 12) - getU32(cs, 20)).toInt // Ysiz - YOsiz
    val bits = (cs(42) & 0x7f) + 1 // Ssiz, after the 2-byte Csiz at 40
    var off = 4 + lsiz
    var nl = -1
    var exps: Seq[Int] = Nil
    var guards = 0
    var sodAt = -1
    while (sodAt < 0) {
      val marker = getU16(cs, off)
      marker match {
        case 0xFF52 =>
          nl = cs(off + 9) & 0xff
          require((cs(off + 13) & 0xff) == 1, "profile requires 5/3 reversible")
          off += 2 + getU16(cs, off + 2)
        case 0xFF5C =>
          val lqcd = getU16(cs, off + 2)
          val sqcd = cs(off + 4) & 0xff
          require((sqcd & 0x1f) == 0, "profile requires no quantization")
          guards = sqcd >>> 5
          exps = (0 until lqcd - 3).map(i => (cs(off + 5 + i) & 0xff) >>> 3)
          off += 2 + lqcd
        case 0xFF90 => off += 2 + getU16(cs, off + 2)
        case 0xFF93 => sodAt = off + 2
        case other =>
          throw new IllegalArgumentException(f"unexpected marker $other%04x")
      }
    }
    require(nl >= 0 && exps.length == 3 * nl + 1, "COD/QCD must precede SOD")
    // subband geometry in packet order, mirroring dwtForward
    val dims = Iterator.iterate((w, h)) { case (dw, dh) => (dw - dw / 2, dh - dh / 2) }
      .take(nl + 1).toSeq
    val bandsPerPacket: Seq[Seq[(Int, Int, Int)]] = (0 to nl).map { r =>
      if (r == 0) { val (dw, dh) = dims(nl); Seq((BandLL, dw, dh)) }
      else {
        val (dw, dh) = dims(nl - r) // the level being reassembled
        val (lw, lh) = (dw - dw / 2, dh - dh / 2)
        Seq((BandHL, dw / 2, lh), (BandLH, lw, dh / 2), (BandHH, dw / 2, dh / 2))
      }
    }
    val lastRes = math.min(maxRes, nl)
    var pos = sodAt
    var expIdx = 0
    val subbands = bandsPerPacket.take(lastRes + 1).flatMap { bands =>
      val grids = bands.map { case (_, bw, bh) =>
        val e = exps(expIdx); expIdx += 1
        val (gw, gh) = cbGrid(bw, bh)
        (gw, gh, e + guards - 1)
      }
      val (cbGrids, end) = readPacket(cs, pos, grids)
      pos = end
      bands.zip(cbGrids).map { case ((band, bw, bh), cbs) =>
        // stitch the decoded code blocks back into the subband
        val coef = new Array[Int](bw * bh)
        val (gw, gh) = cbGrid(bw, bh)
        for (gy <- 0 until gh; gx <- 0 until gw) {
          val x0 = gx * CbSize; val y0 = gy * CbSize
          val cw = math.min(CbSize, bw - x0)
          val ch = math.min(CbSize, bh - y0)
          if (cw > 0 && ch > 0) {
            val (numPlanes, body) = cbs(gy * gw + gx)
            val rect = decodeBlock(body, cw, ch, numPlanes, band)
            for (y <- 0 until ch; x <- 0 until cw)
              coef((y0 + y) * bw + (x0 + x)) = rect(y * cw + x)
          }
        }
        Subband(band, bw, bh, coef)
      }
    }
    if (lastRes == nl)
      // full decode: every packet consumed, EOC must follow
      require(pos + 2 <= cs.length && getU16(cs, pos) == 0xFFD9,
        "EOC must close the codestream immediately after the packets")
    val keptLevels = lastRes
    val depth = nl - lastRes // remaining decomposition depth of the output
    val (ow, oh) = dims(depth)
    val coef = dwtInverse(subbands, ow, oh, keptLevels)
    val shift = 1L << (bits - 1)
    val maxS = (1L << bits) - 1
    Array.tabulate(oh, ow)((y, x) =>
      math.max(0L, math.min(maxS, coef(y)(x).toLong + shift)))
  }
}
