package graft.sources

/** Physical `.jp2` slice files — the reference's third slice-ingest
  * format (`slice_to_dask_array` lists `.jp2` beside `.tif`
  * tiff2octree.py:663, reads width/height/samples/dtype from the
  * header via rasterio :673-677, and `get_image` :532 decodes pixels
  * with glymur at block-read time).
  *
  * The full JP2 box container (ISO/IEC 15444-1 Annex I) — signature
  * box, ftyp, jp2h(ihdr + colr) — and the codestream's SOC + SIZ
  * marker segment (Annex A.5.1) are written and re-parsed
  * byte-for-byte with nothing but the JDK. That covers everything the
  * reference's DISPATCH path reads: rasterio's src.width / src.height
  * / src.count / src.dtypes all come from these headers without
  * decoding a single pixel.
  *
  * The tile-part after SIZ — formerly the one documented codec seam —
  * is since r8 a REAL JPEG2000 codestream: [[Jp2Codec]] implements
  * the MQ arithmetic coder and the EBCOT bit-plane passes from the
  * published spec for the constrained profile written here (one tile,
  * one component, zero decomposition levels, one code block), so
  * `.jp2` slices round-trip pixels through genuine entropy coding —
  * the role `get_image`/glymur plays in the reference.
  */
object Jp2Binary {

  /** Header metadata of one slice: everything the dispatch arm needs
    * (ihdr and SIZ are cross-checked against each other on parse).
    */
  final case class Jp2Header(width: Long, height: Long, nc: Int, bits: Int)

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

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    putU32(out, 8L + payload.length)
    out.write(typ.getBytes("US-ASCII"))
    out.write(payload)
    out.toByteArray
  }

  /** Serialize one w×h 16-bit grayscale page as a `.jp2` file. */
  private[graft] def serialize(page: Array[Array[Long]]): Array[Byte] = {
    val (h, w) = (page.length, page.head.length)
    val bits = 16
    val out = new java.io.ByteArrayOutputStream()
    // JP2 signature box: fixed 12 bytes, payload <CR><LF>0x87<LF>
    out.write(box("jP  ", Array(0x0d, 0x0a, 0x87, 0x0a).map(_.toByte)))
    // ftyp: brand 'jp2 ', minor 0, one compatibility entry
    val ftyp = new java.io.ByteArrayOutputStream()
    ftyp.write("jp2 ".getBytes("US-ASCII")); putU32(ftyp, 0L)
    ftyp.write("jp2 ".getBytes("US-ASCII"))
    out.write(box("ftyp", ftyp.toByteArray))
    // jp2h superbox: ihdr (HEIGHT before WIDTH, per spec) + colr
    val ihdr = new java.io.ByteArrayOutputStream()
    putU32(ihdr, h.toLong); putU32(ihdr, w.toLong)
    putU16(ihdr, 1)            // NC: one component (grayscale)
    ihdr.write(bits - 1)       // BPC: depth-1, sign bit clear (unsigned)
    ihdr.write(7)              // C: compression type 7 (the only value)
    ihdr.write(0)              // UnkC
    ihdr.write(0)              // IPR
    val colr = new java.io.ByteArrayOutputStream()
    colr.write(1); colr.write(0); colr.write(0) // METH=1 enumerated, PREC, APPROX
    putU32(colr, 17L)          // EnumCS 17: greyscale
    val jp2h = new java.io.ByteArrayOutputStream()
    jp2h.write(box("ihdr", ihdr.toByteArray))
    jp2h.write(box("colr", colr.toByteArray))
    out.write(box("jp2h", jp2h.toByteArray))
    // jp2c: SOC, SIZ (one tile covering the image, one component),
    // then the REAL entropy-coded tile-part (COD/QCD/SOT/SOD + the
    // MQ-coded packet, [[Jp2Codec.encodeTail]]), then EOC
    val cs = new java.io.ByteArrayOutputStream()
    putU16(cs, 0xff4f)                    // SOC
    putU16(cs, 0xff51)                    // SIZ
    putU16(cs, 38 + 3)                    // Lsiz: 38 + 3 per component
    putU16(cs, 0)                         // Rsiz: no profile restrictions
    putU32(cs, w.toLong); putU32(cs, h.toLong)  // Xsiz, Ysiz
    putU32(cs, 0L); putU32(cs, 0L)        // XOsiz, YOsiz
    putU32(cs, w.toLong); putU32(cs, h.toLong)  // XTsiz, YTsiz (one tile)
    putU32(cs, 0L); putU32(cs, 0L)        // XTOsiz, YTOsiz
    putU16(cs, 1)                         // Csiz: one component
    cs.write(bits - 1)                    // Ssiz: depth-1, unsigned
    cs.write(1); cs.write(1)              // XRsiz, YRsiz
    cs.write(Jp2Codec.encodeTail(page, bits))
    cs.write(0xff); cs.write(0xd9)        // EOC
    out.write(box("jp2c", cs.toByteArray))
    out.toByteArray
  }

  /** Decode the pixel payload of a `.jp2` file written by
    * [[serialize]]: walk the boxes to jp2c, then run the real
    * [[Jp2Codec]] Tier-2 + Tier-1 decode — the `get_image`
    * (tiff2octree.py:532) role. The header chain is re-validated via
    * [[parseHeader]] first, so corrupt containers fail loudly before
    * entropy decoding.
    */
  private[graft] def decode(bytes: Array[Byte]): Array[Array[Long]] = {
    val hd = parseHeader(bytes)
    var off = 12
    var cs: Option[Array[Byte]] = None
    while (off + 8 <= bytes.length && cs.isEmpty) {
      val len = getU32(bytes, off)
      if (new String(bytes.slice(off + 4, off + 8), "US-ASCII") == "jp2c")
        cs = Some(bytes.slice(off + 8, off + len.toInt))
      off += len.toInt
    }
    val page = Jp2Codec.decodeCodestream(
      cs.getOrElse(throw new IllegalArgumentException("no jp2c box")))
    require(page.length == hd.height.toInt && page.head.length == hd.width.toInt,
      "decoded dimensions disagree with the header chain")
    page
  }

  /** Parse the header chain from read-back bytes: signature + ftyp
    * verified, ihdr read from the jp2h superbox, SIZ read from the
    * codestream, the two CROSS-CHECKED (rasterio surfaces exactly
    * these fields at dispatch time). Only header bytes are touched —
    * never the entropy payload.
    */
  private[graft] def parseHeader(bytes: Array[Byte]): Jp2Header = {
    require(getU32(bytes, 0) == 12L &&
      new String(bytes.slice(4, 8), "US-ASCII") == "jP  " &&
      getU32(bytes, 8) == 0x0d0a870aL, "bad JP2 signature box")
    var off = 12
    var ih: Option[Jp2Header] = None
    var siz: Option[Jp2Header] = None
    while (off + 8 <= bytes.length && (ih.isEmpty || siz.isEmpty)) {
      val len = getU32(bytes, off)
      val typ = new String(bytes.slice(off + 4, off + 8), "US-ASCII")
      typ match {
        case "ftyp" =>
          require(new String(bytes.slice(off + 8, off + 12), "US-ASCII") == "jp2 ",
            "bad ftyp brand")
        case "jp2h" =>
          // superbox: first child must be ihdr
          val c = off + 8
          require(new String(bytes.slice(c + 4, c + 8), "US-ASCII") == "ihdr",
            "jp2h must lead with ihdr")
          val h = getU32(bytes, c + 8); val w = getU32(bytes, c + 12)
          val nc = getU16(bytes, c + 16); val bpc = bytes(c + 18) & 0xff
          require((bytes(c + 19) & 0xff) == 7, "ihdr C must be 7")
          ih = Some(Jp2Header(w, h, nc, (bpc & 0x7f) + 1))
        case "jp2c" =>
          // layout: SOC(2) SIZ(2) Lsiz(2) Rsiz(2) Xsiz(4) Ysiz(4)
          // XOsiz(4) YOsiz(4) XTsiz(4) YTsiz(4) XTOsiz(4) YTOsiz(4)
          // Csiz(2) then per-component Ssiz(1) XRsiz(1) YRsiz(1)
          val c = off + 8
          require(getU16(bytes, c) == 0xff4f, "codestream must start with SOC")
          require(getU16(bytes, c + 2) == 0xff51, "SIZ must follow SOC")
          val w = getU32(bytes, c + 8) - getU32(bytes, c + 16)  // Xsiz - XOsiz
          val h = getU32(bytes, c + 12) - getU32(bytes, c + 20) // Ysiz - YOsiz
          val csiz = getU16(bytes, c + 40)
          val ssiz = bytes(c + 42) & 0xff
          siz = Some(Jp2Header(w, h, csiz, (ssiz & 0x7f) + 1))
        case _ => ()
      }
      off += len.toInt
    }
    (ih, siz) match {
      case (Some(a), Some(b)) =>
        require(a == b, s"ihdr/SIZ disagree: $a vs $b")
        a
      case _ => throw new IllegalArgumentException("missing ihdr or codestream")
    }
  }
}
