package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based pins for the training-shard containers: the
  * TFRecord writer/reader pair must invert on ARBITRARY rows (any
  * doc_id/n_chars magnitude exercises every varint width; any
  * unicode text exercises UTF-8 length vs char length), and the
  * ustar pair on arbitrary member names/sizes (all padding classes,
  * incl. exact block multiples and zero-size members).
  */
class ShardPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val rows: Gen[List[(Long, Long, String)]] = for {
    n <- Gen.choose(0, 20)
    s <- Gen.listOfN(n, for {
      id <- Gen.oneOf(Gen.choose(0L, 127L), Gen.choose(128L, Long.MaxValue / 2))
      nc <- Gen.choose(0L, 1L << 40)
      t <- Gen.oneOf(Gen.asciiPrintableStr, Gen.listOf(Gen.choose(32, 0x2fff))
        .map(_.map(_.toChar).mkString))
    } yield (id, nc, t))
  } yield s

  test("tfrecord shards invert arbitrary rows (every varint width, unicode text)") {
    check(Prop.forAll(rows) { rs =>
      val parsed = TfRecordBinary.parseShard(TfRecordBinary.shardBytes(rs))
      parsed.map(r => (r.docId, r.nChars, r.text)) == rs &&
        parsed.map(_.recBytes).sum == TfRecordBinary.shardBytes(rs).length.toLong
    }, 200)
  }

  test("varintSize agrees with the emitted varint for arbitrary values") {
    check(Prop.forAll(Gen.choose(0L, Long.MaxValue)) { v =>
      TfRecordBinary.varint(v).length == TfRecordBinary.varintSize(v)
    }, 200)
  }

  private val members: Gen[List[(String, Array[Byte])]] = for {
    n <- Gen.choose(0, 12)
    s <- Gen.listOfN(n, for {
      name <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(40).mkString)
      size <- Gen.oneOf(Gen.choose(0, 40), Gen.oneOf(511, 512, 513, 1024))
      data <- Gen.listOfN(size, Gen.choose(-128, 127).map(_.toByte))
    } yield (name, data.toArray))
  } yield s

  test("ustar archives invert arbitrary member lists (all padding classes)") {
    check(Prop.forAll(members) { ms =>
      val bytes = ms.map { case (n, d) => TarBinary.entry(n, d) }
        .foldLeft(Array.empty[Byte])(_ ++ _) ++ TarBinary.trailer
      val parsed = TarBinary.parse(bytes)
      parsed.map(m => (m.name, m.data.toSeq)) == ms.map { case (n, d) => (n, d.toSeq) } &&
        parsed.map(_.entryBytes).sum + 1024 == bytes.length.toLong
    }, 120)
  }
}
