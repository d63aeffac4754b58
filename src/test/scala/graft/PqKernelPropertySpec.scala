package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftPq, VecSumLong}

/** Property pins for the vector-quantization kernels, driven through
  * the SAME static entry points both interpreted eval and generated
  * code call — no Spark session, so hundreds of arbitrary cases run
  * in milliseconds. The references are formulated INDEPENDENTLY of
  * the kernels' packing trick: argmin by (du, idx) tuple ordering
  * rather than a packed-long min, and the aggregate checked for
  * merge-order independence over random partition splits plus a
  * serialize round-trip.
  */
class PqKernelPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // values spanning sign, magnitude, and inexact-fraction cases
  private val genVal: Gen[Double] =
    Gen.oneOf(Gen.choose(-5.0, 5.0), Gen.oneOf(0.0, -0.0, 0.1, -3.25, 1e-7, 4096.5))

  private case class Case(
      m: Int, d: Int, ks: Int,
      vec: Array[Double],
      entries: List[(Int, Long, Array[Double])]) // (m, idx, codeword)

  private val genCase: Gen[Case] = for {
    m <- Gen.choose(1, 4)
    d <- Gen.choose(1, 5)
    ks <- Gen.oneOf(8, 64)
    vec <- Gen.listOfN(m * d, genVal).map(_.toArray)
    nE <- Gen.choose(0, 10)
    raw <- Gen.listOfN(nE, for {
      em <- Gen.choose(0, m - 1)
      idx <- Gen.choose(0L, ks - 1L)
      cw <- Gen.listOfN(d, genVal).map(_.toArray)
    } yield (em, idx, cw))
  } yield Case(m, d, ks, vec, raw.distinctBy(e => (e._1, e._2)))

  private def dArr(a: Array[Double]): ArrayData = new GenericArrayData(a)

  /** du per mode, replicating the published left-fold contracts. */
  private def du(mode: Int, a: Array[Double], c: Array[Double]): Long = {
    var s = 0.0
    var j = 0
    while (j < a.length) {
      val diff = if (mode == 1) a(j) - c(j) * 1.0e-6 else a(j) - c(j)
      s += diff * diff
      j += 1
    }
    if (mode == 2) s.toLong else math.floor(s * 1000000.0).toLong
  }

  test("pq argmin equals a tuple-ordered reference for every mode") {
    check(Prop.forAll(genCase, Gen.oneOf(0, 1, 2)) { (c, mode) =>
      // mode-1 codebooks are integral micro-ints; mode-2 inputs are
      // exact-integer-valued doubles (the engine's contract domains)
      val entries =
        if (mode == 1) c.entries.map(e => (e._1, e._2, e._3.map(x => math.floor(x * 1e6))))
        else if (mode == 2) c.entries.map(e => (e._1, e._2, e._3.map(math.floor)))
        else c.entries
      val vec = if (mode == 2) c.vec.map(math.floor) else c.vec
      val sorted = entries.sortBy(e => (e._1, e._2))
      val keys = new GenericArrayData(
        sorted.map(e => e._1.toLong * c.ks + e._2).toArray)
      val flat = dArr(sorted.flatMap(_._3).toArray)
      val out = GraftPq.argmin(dArr(vec), keys, flat, c.ks, mode,
        vecKind = 1, flatKind = 1)
      // reference: per m, min by the (du, idx) TUPLE over that
      // subspace's entries — no packed longs anywhere
      val ref: Map[Int, Long] = entries.groupBy(_._1).map { case (m, es) =>
        val sub = vec.slice(m * c.d, (m + 1) * c.d)
        val (bd, bi) = es.map(e => (du(mode, sub, e._3), e._2))
          .minBy(identity)(Ordering.Tuple2[Long, Long])
        m -> (bd * c.ks + bi)
      }
      if (entries.isEmpty) out == null
      else (0 until c.m).forall { m =>
        ref.get(m) match {
          case Some(p) => !out.isNullAt(m) && out.getLong(m) == p
          case None    => out.isNullAt(m)
        }
      }
    })
  }

  test("argmin_l2 equals a first-minimum reference scan") {
    val gen = for {
      d <- Gen.choose(1, 6)
      e <- Gen.choose(0, 12)
      vec <- Gen.listOfN(d, genVal).map(_.map(math.floor).toArray)
      cents <- Gen.listOfN(e, Gen.listOfN(d, genVal).map(_.map(math.floor).toArray))
    } yield (vec, cents)
    check(Prop.forAll(gen) { case (vec, cents) =>
      val out = GraftPq.argminL2(dArr(vec), dArr(cents.flatten.toArray), 1, 1)
      if (cents.isEmpty) out == null
      else {
        val dus = cents.map(c => du(2, vec, c))
        val best = dus.zipWithIndex.minBy { case (duV, i) => (duV, i) }
        !out.isNullAt(0) && out.getLong(0) == best._2.toLong &&
          out.getLong(1) == best._1
      }
    })
  }

  test("vlsum is merge-order independent and round-trips serialization") {
    val agg = VecSumLong(org.apache.spark.sql.catalyst.expressions.Literal(1L))
    val gen = for {
      d <- Gen.choose(1, 6)
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, Gen.listOfN(d, Gen.choose(-1000000L, 1000000L)))
      cut1 <- Gen.choose(0, n)
      cut2 <- Gen.choose(0, n)
    } yield (d, rows.map(_.toArray), math.min(cut1, cut2), math.max(cut1, cut2))
    check(Prop.forAll(gen) { case (d, rows, c1, c2) =>
      // each row becomes a singleton buffer; every partial travels
      // through serialize/deserialize like a real shuffle exchange
      def sumInto(part: Seq[Array[Long]]): Array[Long] = {
        var buf = agg.createAggregationBuffer()
        part.foreach { r =>
          buf = agg.deserialize(agg.serialize(agg.merge(buf, r.clone())))
        }
        buf
      }
      val parts = Seq(rows.slice(0, c1), rows.slice(c1, c2), rows.slice(c2, rows.size))
      val shuffled = scala.util.Random.shuffle(parts.map(sumInto))
      val merged = shuffled.reduce(agg.merge)
      val expect = (0 until d).map(j => rows.map(_(j)).sum)
      merged.toSeq == expect
    }, n = 100)
  }
}
