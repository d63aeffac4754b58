package graft.sources

import java.util.zip.CRC32C

/** Hand-rolled TFRecord shard writer/reader — the de-facto training
  * shard container (TensorFlow's `tf.data.TFRecordDataset` format,
  * published in the TensorFlow source: length-prefixed records with
  * masked-CRC32C framing, payload = a `tf.train.Example` protobuf).
  * Pure JDK, written from the published wire formats:
  *
  * Record framing:
  * {{{
  *   uint64 length (LE) | uint32 masked_crc32c(length bytes) (LE)
  *   | data[length] | uint32 masked_crc32c(data) (LE)
  * }}}
  * with masked = ((crc >> 15) | (crc << 17)) + 0xa282ead8 (the
  * snappy/TF masking constant).
  *
  * Example payload (protobuf wire format, hand-encoded): Example.1 =
  * Features, Features.1 = repeated map entries (key string, value
  * Feature), Feature.1 = BytesList / Feature.3 = Int64List, each a
  * repeated field of its element type. Map entries are emitted in
  * fixed key order (doc_id, n_chars, text) so shard bytes are
  * deterministic.
  *
  * Everything here runs on EXECUTORS over one shard's rows — the
  * engine stages shards in parallel and re-parses them from bytes
  * alone, CRCs verified per record.
  */
object TfRecordBinary {

  val MaskDelta = 0xa282ead8L

  def maskedCrc(bytes: Array[Byte]): Long = {
    val c = new CRC32C()
    c.update(bytes)
    val crc = c.getValue
    (((crc >>> 15) | (crc << 17)) + MaskDelta) & 0xffffffffL
  }

  /** Protobuf base-128 varint. */
  def varint(v: Long): Array[Byte] = {
    var x = v
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    do {
      val b = (x & 0x7f).toInt
      x >>>= 7
      out += (if (x != 0) (b | 0x80).toByte else b.toByte)
    } while (x != 0)
    out.toArray
  }

  def varintSize(v: Long): Int = varint(v).length

  private def lenDelim(tag: Int, body: Array[Byte]): Array[Byte] =
    Array(((tag << 3) | 2).toByte) ++ varint(body.length.toLong) ++ body

  private def int64Feature(v: Long): Array[Byte] = {
    // Int64List.value (field 1, packed varints) wrapped in Feature.int64_list (field 3)
    val list = Array((1 << 3 | 2).toByte) ++ varint(varintSize(v).toLong) ++ varint(v)
    lenDelim(3, list)
  }

  private def bytesFeature(v: Array[Byte]): Array[Byte] = {
    // BytesList.value (field 1, length-delimited) wrapped in Feature.bytes_list (field 1)
    lenDelim(1, lenDelim(1, v))
  }

  private def mapEntry(key: String, feature: Array[Byte]): Array[Byte] =
    lenDelim(1, lenDelim(1, key.getBytes("UTF-8")) ++ lenDelim(2, feature))

  /** One Example's serialized bytes for a (doc_id, <midKey>, text)
    * row — fixed key order keeps shard bytes deterministic. The
    * middle int64 feature's key is caller-chosen (`n_chars` for the
    * raw-table sink, `n_tokens` for the pipeline export).
    */
  def exampleBytes(docId: Long, midVal: Long, text: String,
      midKey: String = "n_chars"): Array[Byte] = {
    val features =
      mapEntry("doc_id", int64Feature(docId)) ++
      mapEntry(midKey, int64Feature(midVal)) ++
      mapEntry("text", bytesFeature(text.getBytes("UTF-8")))
    lenDelim(1, features)
  }

  /** One framed record: length + masked length-CRC + data + data-CRC. */
  def record(data: Array[Byte]): Array[Byte] = {
    val len = new Array[Byte](8)
    var l = data.length.toLong
    for (i <- 0 until 8) { len(i) = (l & 0xff).toByte; l >>>= 8 }
    def le32(v: Long): Array[Byte] =
      Array.tabulate(4)(i => ((v >>> (8 * i)) & 0xff).toByte)
    len ++ le32(maskedCrc(len)) ++ data ++ le32(maskedCrc(data))
  }

  /** A whole shard file's bytes from its rows (already in shard order). */
  def shardBytes(rows: Seq[(Long, Long, String)], midKey: String = "n_chars"): Array[Byte] =
    rows.iterator.map { case (id, n, t) => record(exampleBytes(id, n, t, midKey)) }
      .foldLeft(Array.empty[Byte])(_ ++ _)

  // ---------------------------------------------------------------- read

  case class ParsedRecord(docId: Long, nChars: Long, text: String, recBytes: Long)

  private class Reader(buf: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val b = buf(pos) & 0xff; pos += 1; b }
    def varint(): Long = {
      var shift = 0; var v = 0L; var b = 0
      do { b = u8(); v |= (b & 0x7fL) << shift; shift += 7 } while ((b & 0x80) != 0)
      v
    }
    def bytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
    def le64(): Long = {
      var v = 0L
      for (i <- 0 until 8) v |= (u8().toLong << (8 * i))
      v
    }
    def le32(): Long = {
      var v = 0L
      for (i <- 0 until 4) v |= (u8().toLong << (8 * i))
      v
    }
  }

  /** Generic protobuf walk of one Example, extracting the three
    * features by key — an independent decoder, not a byte-mirror of
    * the encoder (it follows tags/wire types, skipping unknowns).
    */
  def parseExample(data: Array[Byte], midKey: String = "n_chars"): (Long, Long, String) = {
    var docId = -1L; var nChars = -1L; var text = ""
    val r = new Reader(data)
    def parseFeature(buf: Array[Byte]): Either[Long, String] = {
      val fr = new Reader(buf)
      var out: Either[Long, String] = Left(-1L)
      while (fr.pos < buf.length) {
        val tag = fr.varint()
        val field = (tag >>> 3).toInt
        val body = fr.bytes(fr.varint().toInt)
        field match {
          case 3 => // Int64List: packed varints (field 1)
            val lr = new Reader(body)
            val t2 = lr.varint(); require((t2 >>> 3) == 1, "Int64List field")
            val packed = lr.bytes(lr.varint().toInt)
            out = Left(new Reader(packed).varint())
          case 1 => // BytesList: length-delimited values (field 1)
            val lr = new Reader(body)
            val t2 = lr.varint(); require((t2 >>> 3) == 1, "BytesList field")
            out = Right(new String(lr.bytes(lr.varint().toInt), "UTF-8"))
          case _ => ()
        }
      }
      out
    }
    while (r.pos < data.length) {
      val tag = r.varint()
      require((tag & 7) == 2, s"unexpected wire type in Example: $tag")
      val body = r.bytes(r.varint().toInt)
      if ((tag >>> 3) == 1) {
        // Features: walk its map entries
        val er = new Reader(body)
        while (er.pos < body.length) {
          val et = er.varint()
          val entry = er.bytes(er.varint().toInt)
          if ((et >>> 3) == 1) {
            val mr = new Reader(entry)
            var key = ""; var fv: Either[Long, String] = Left(-1L)
            while (mr.pos < entry.length) {
              val mt = mr.varint()
              val mbody = mr.bytes(mr.varint().toInt)
              (mt >>> 3) match {
                case 1 => key = new String(mbody, "UTF-8")
                case 2 => fv = parseFeature(mbody)
                case _ => ()
              }
            }
            (key, fv) match {
              case ("doc_id", Left(v)) => docId = v
              case (k, Left(v)) if k == midKey => nChars = v
              case ("text", Right(s)) => text = s
              case _ => ()
            }
          }
        }
      }
    }
    (docId, nChars, text)
  }

  /** Parse a whole shard file, verifying BOTH masked CRCs per record. */
  def parseShard(buf: Array[Byte], midKey: String = "n_chars"): Seq[ParsedRecord] = {
    val r = new Reader(buf)
    val out = scala.collection.mutable.ArrayBuffer.empty[ParsedRecord]
    while (r.pos < buf.length) {
      val start = r.pos
      val lenBytes = r.bytes(8)
      val len = { var v = 0L; for (i <- 0 until 8) v |= ((lenBytes(i) & 0xffL) << (8 * i)); v }
      val lenCrc = r.le32()
      require(lenCrc == maskedCrc(lenBytes), "length CRC mismatch")
      val data = r.bytes(len.toInt)
      val dataCrc = r.le32()
      require(dataCrc == maskedCrc(data), "data CRC mismatch")
      val (id, n, t) = parseExample(data, midKey)
      out += ParsedRecord(id, n, t, (r.pos - start).toLong)
    }
    out.toSeq
  }
}
