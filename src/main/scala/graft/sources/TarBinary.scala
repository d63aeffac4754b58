package graft.sources

/** Hand-rolled POSIX ustar writer/reader for WebDataset-style shards —
  * the other de-facto training shard container (a WebDataset shard IS
  * a plain tar whose member names share a basename key per sample,
  * e.g. `00000042.txt` + `00000042.cls`). Written from the published
  * ustar layout: 512-byte headers (name, octal size/mode/mtime,
  * checksum over the header with the checksum field blanked to
  * spaces, `ustar` magic), data padded to 512, two zero blocks as the
  * archive trailer. Pure JDK; runs on executors per shard.
  */
object TarBinary {

  val Block = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, NUL terminated (the classic GNU/POSIX form)
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes("US-ASCII")
  }

  /** One member's full bytes: header block + zero-padded data. */
  def entry(name: String, data: Array[Byte]): Array[Byte] = {
    val h = new Array[Byte](Block)
    val nameB = name.getBytes("US-ASCII")
    require(nameB.length < 100, s"name too long: $name")
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    System.arraycopy(octal(0x1a4L, 8), 0, h, 100, 8)   // mode 0644
    System.arraycopy(octal(0L, 8), 0, h, 108, 8)       // uid
    System.arraycopy(octal(0L, 8), 0, h, 116, 8)       // gid
    System.arraycopy(octal(data.length.toLong, 12), 0, h, 124, 12)
    System.arraycopy(octal(0L, 12), 0, h, 136, 12)     // mtime 0: deterministic bytes
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)     // chksum blanked for the sum
    h(156) = '0'                                       // typeflag: regular file
    System.arraycopy(("ustar" + "\u0000" + "00").getBytes("US-ASCII"), 0, h, 257, 8)
    val sum = h.map(_ & 0xff).sum.toLong
    val ck = java.lang.Long.toOctalString(sum)
    val ckPad = "0" * (6 - ck.length) + ck
    System.arraycopy((ckPad + "\u0000 ").getBytes("US-ASCII"), 0, h, 148, 8)
    val padded = (data.length + Block - 1) / Block * Block
    h ++ data ++ new Array[Byte](padded - data.length)
  }

  /** Archive trailer: two zero blocks. */
  def trailer: Array[Byte] = new Array[Byte](2 * Block)

  case class TarMember(name: String, size: Long, data: Array[Byte], entryBytes: Long)

  /** Parse a whole archive, verifying every header checksum. */
  def parse(buf: Array[Byte]): Seq[TarMember] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[TarMember]
    var pos = 0
    var done = false
    while (!done && pos + Block <= buf.length) {
      val h = java.util.Arrays.copyOfRange(buf, pos, pos + Block)
      if (h.forall(_ == 0)) done = true
      else {
        val stored = new String(h, 148, 8, "US-ASCII").takeWhile(c => c >= '0' && c <= '7')
        val blanked = h.clone()
        java.util.Arrays.fill(blanked, 148, 156, ' '.toByte)
        val sum = blanked.map(_ & 0xff).sum.toLong
        require(java.lang.Long.parseLong(stored, 8) == sum,
          s"tar header checksum mismatch at offset $pos")
        require(new String(h, 257, 5, "US-ASCII") == "ustar", "missing ustar magic")
        val name = new String(h, 0, 100, "US-ASCII").takeWhile(_ != '\u0000')
        val size = java.lang.Long.parseLong(
          new String(h, 124, 12, "US-ASCII").takeWhile(c => c >= '0' && c <= '7'), 8)
        val data = java.util.Arrays.copyOfRange(
          buf, pos + Block, pos + Block + size.toInt)
        val padded = (size + Block - 1) / Block * Block
        out += TarMember(name, size, data, Block + padded)
        pos += Block + padded.toInt
      }
    }
    out.toSeq
  }
}
