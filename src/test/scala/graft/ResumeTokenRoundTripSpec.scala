package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ResumeToken

/** Generative round-trip coverage for the KeyString decoder — the
  * hand-encoded vectors in ResumeTokenSpec pin the layout; this spec
  * pins the VALUE space: a test-side encoder (independent inverse of
  * the format per `utils/ResumeTokenDecoder.java:275-480`) encodes
  * random values and the decoder must return them. Covers every
  * integer byte-width 1–8 with complement negatives, the fractional
  * marker bit, XOR dates across the epoch, embedded-nul strings,
  * short/long-form bindata, nested object/array trees, discriminator
  * bytes, and the v0/v1/v2 resume-token field layouts.
  */
class ResumeTokenRoundTripSpec extends AnyFunSuite {
  import org.scalacheck.{Gen, Prop, Test => SCTest}

  private def passes(p: Prop, min: Int = 200): Unit =
    assert(SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(min), p).passed)

  // ---- test-side encoder: the documented inverse of the decoder ----

  /** An encodable value paired with what the decoder must return. */
  private sealed trait KV { def decoded: Any }
  private case class KInt(n: Long) extends KV { def decoded: Any = n }
  private case class KFrac(m: Long, neg: Boolean) extends KV {
    def decoded: Any = Double.NaN // fraction path simplified to NaN
  }
  private case class KDate(ms: Long) extends KV { def decoded: Any = ms }
  private case class KTs(t: Long, i: Long) extends KV {
    def decoded: Any = (t, i)
  }
  private case class KStr(parts: Seq[String]) extends KV {
    def decoded: Any = parts.mkString("\u0000")
  }
  private case class KOid(bytes: Array[Byte]) extends KV {
    def decoded: Any = bytes.map(x => f"${x & 0xff}%02x").mkString
  }
  private case class KBin(subtype: Int, data: Array[Byte]) extends KV {
    def decoded: Any = (subtype, data)
  }
  private case class KBool(b: Boolean) extends KV { def decoded: Any = b }
  private case object KNull extends KV { def decoded: Any = null }
  private case object KNaN extends KV { def decoded: Any = Double.NaN }
  private case class KObj(entries: Seq[(String, KV)]) extends KV {
    def decoded: Any = entries.map { case (k, v) => k -> v.decoded }.toMap
  }
  private case class KArr(items: Seq[KV]) extends KV {
    def decoded: Any = items.map(_.decoded)
  }

  private def encode(v: KV): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    put(out, v)
    out.toArray
  }

  private def put(b: scala.collection.mutable.ArrayBuffer[Byte],
      v: KV): Unit = v match {
    case KNull => b += 0x14.toByte
    case KNaN => b += 0x1e.toByte
    case KBool(true) => b += 0x6f.toByte
    case KBool(false) => b += 0x6e.toByte
    case KInt(0L) => b += 0x29.toByte // kNumericZero
    case KInt(n) => putNumeric(b, BigInt(n).abs << 1, n < 0)
    case KFrac(m, neg) => putNumeric(b, (BigInt(m).abs << 1) | 1, neg)
    case KDate(ms) =>
      b += 0x78.toByte
      val u = ms ^ Long.MinValue // order-preserving sign-bit flip
      for (s <- 56 to 0 by -8) b += ((u >>> s) & 0xff).toByte
    case KTs(t, i) =>
      b += 0x82.toByte
      for (s <- 24 to 0 by -8) b += ((t >>> s) & 0xff).toByte
      for (s <- 24 to 0 by -8) b += ((i >>> s) & 0xff).toByte
    case KStr(parts) =>
      b += 0x3c.toByte
      b ++= parts.head.getBytes("UTF-8"); b += 0
      for (p <- parts.tail) { // embedded-nul continuation
        b += 0xff.toByte; b ++= p.getBytes("UTF-8"); b += 0
      }
    case KOid(bytes) => b += 0x64.toByte; b ++= bytes
    case KBin(subtype, data) =>
      b += 0x5a.toByte
      if (data.length < 255) b += data.length.toByte
      else {
        b += 0xff.toByte
        for (s <- 24 to 0 by -8) b += ((data.length >>> s) & 0xff).toByte
      }
      b += subtype.toByte; b ++= data
    case KObj(entries) =>
      b += 0x46.toByte
      for ((k, ev) <- entries) {
        b += 0x05.toByte // per-entry marker (any non-end, non-disc byte)
        b ++= k.getBytes("UTF-8"); b += 0
        put(b, ev)
      }
      b += 0x04.toByte // kEnd
    case KArr(items) =>
      b += 0x50.toByte
      items.foreach(put(b, _))
      b += 0x00.toByte
  }

  /** N-byte numeric: minimal big-endian width, byte-complement when
    * negative; ctype encodes sign + width (43+len-1 / 40-len).
    */
  private def putNumeric(b: scala.collection.mutable.ArrayBuffer[Byte],
      encoded: BigInt, neg: Boolean): Unit = {
    val len = (encoded.bitLength + 7) / 8
    require(len >= 1 && len <= 8, s"width $len out of the 1-8 range")
    b += (if (neg) 40 - len else 42 + len).toByte
    val raw = encoded.toByteArray.takeRight(len)
    val padded = Array.fill[Byte](len - raw.length)(0) ++ raw
    padded.foreach(x => b += (if (neg) (~x).toByte else x))
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map(x => f"${x & 0xff}%02x").mkString

  /** Deep equality tolerant of Array[Byte], NaN, and tuples. */
  private def same(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Array[Byte], y: Array[Byte]) => x.sameElements(y)
    case (x: Double, y: Double) => (x.isNaN && y.isNaN) || x == y
    case ((a1, a2), (b1, b2)) => same(a1, b1) && same(a2, b2)
    case (x: Map[_, _], y: Map[_, _]) =>
      x.size == y.size && x.asInstanceOf[Map[String, Any]].forall {
        case (k, v) =>
          y.asInstanceOf[Map[String, Any]].get(k).exists(same(v, _))
      }
    case (x: Seq[_], y: Seq[_]) =>
      x.size == y.size && x.lazyZip(y).forall(same)
    case _ => a == b
  }

  // ---- generators ----

  private val genSafeLong = Gen.choose(Long.MinValue + 1, Long.MaxValue)
  private val genChar = Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('é', '中', '∆', 'ß', ' ', '-', '.'))
  private val genPart = Gen.choose(0, 12)
    .flatMap(n => Gen.listOfN(n, genChar)).map(_.mkString)
  private val genStr = Gen.choose(1, 3)
    .flatMap(n => Gen.listOfN(n, genPart)).map(KStr(_))
  private val genBytes = Gen.choose(0, 40)
    .flatMap(n => Gen.listOfN(n, Gen.choose(0, 255).map(_.toByte)))
    .map(_.toArray)
  private val genScalar: Gen[KV] = Gen.oneOf(
    genSafeLong.map(KInt),
    Gen.const(KNull),
    Gen.oneOf(KBool(true), KBool(false)),
    genSafeLong.map(KDate),
    for {
      t <- Gen.choose(0L, 0xffffffffL); i <- Gen.choose(0L, 0xffffffffL)
    } yield KTs(t, i),
    genStr,
    Gen.listOfN(12, Gen.choose(0, 255).map(_.toByte))
      .map(l => KOid(l.toArray)),
    for { s <- Gen.choose(0, 255); d <- genBytes } yield KBin(s, d),
    Gen.const(KNaN),
    for {
      m <- Gen.choose(0L, Long.MaxValue / 2); n <- Gen.oneOf(true, false)
    } yield KFrac(m, n))

  private def genValue(depth: Int): Gen[KV] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      6 -> genScalar,
      1 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, genValue(depth - 1))).map(KArr(_)),
      1 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, Gen.zip(genPart, genValue(depth - 1)))).map { es =>
          // distinct non-empty keys so Map equality is exact
          KObj(es.zipWithIndex.map { case ((k, v), i) => (s"k${i}_$k", v) })
        })

  // ---- properties ----

  test("every integer byte-width 1-8 round-trips, both signs") {
    // boundary magnitudes around each width: (m << 1) crossing 8k bits
    val edges = (1 to 8).flatMap { w =>
      val hi = (BigInt(1) << (8 * w - 1)) - 1 // widest m that fits w bytes
      val lo = if (w == 1) BigInt(1) else (BigInt(1) << (8 * (w - 1) - 1))
      Seq(lo, hi).map(_.toLong)
    }
    for (m <- edges; n <- Seq(m, -m)) {
      val d = ResumeToken.decodeHex(hex(encode(KInt(n))))
      assert(d == Seq(n), s"width edge $n")
    }
    passes(Prop.forAll(genSafeLong) { n =>
      ResumeToken.decodeHex(hex(encode(KInt(n)))) == Seq(n)
    }, min = 500)
  }

  test("fraction marker bit decodes as the NaN sentinel") {
    passes(Prop.forAll(Gen.choose(0L, Long.MaxValue / 2),
        Gen.oneOf(true, false)) { (m, neg) =>
      val d = ResumeToken.decodeHex(hex(encode(KFrac(m, neg))))
      d.length == 1 && d.head.asInstanceOf[Double].isNaN
    })
  }

  test("XOR-encoded dates round-trip across the epoch") {
    for (ms <- Seq(0L, -1L, 1L, -62135596800000L, 253402300799999L,
        Long.MaxValue, Long.MinValue + 1))
      assert(ResumeToken.decodeHex(hex(encode(KDate(ms)))) == Seq(ms))
    passes(Prop.forAll(genSafeLong) { ms =>
      ResumeToken.decodeHex(hex(encode(KDate(ms)))) == Seq(ms)
    })
  }

  test("strings round-trip, including embedded-nul continuations") {
    passes(Prop.forAll(genStr) { s =>
      same(ResumeToken.decodeHex(hex(encode(s))).head, s.decoded)
    })
    // explicit: a 3-part nul-embedded string
    val s = KStr(Seq("ab", "", "c"))
    assert(ResumeToken.decodeHex(hex(encode(s))).head == "ab\u0000\u0000c")
  }

  test("bindata round-trips in short and long form") {
    val long = KBin(4, Array.tabulate(300)(i => (i % 251).toByte))
    val d = ResumeToken.decodeHex(hex(encode(long))).head
    assert(same(d, long.decoded), "long form (size >= 255)")
    passes(Prop.forAll(Gen.choose(0, 255), genBytes) { (s, data) =>
      same(ResumeToken.decodeHex(hex(encode(KBin(s, data)))).head,
        (s, data))
    })
  }

  test("nested object/array trees round-trip") {
    passes(Prop.forAll(genValue(3)) { v =>
      same(ResumeToken.decodeHex(hex(encode(v))).head, v.decoded)
    }, min = 300)
  }

  test("mixed top-level streams round-trip in order, with and without " +
      "discriminators and the kEnd terminator") {
    val genStream = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, genValue(2)))
    val genDisc = Gen.oneOf[Seq[Byte]](Seq.empty[Byte],
      Seq(0x01.toByte), Seq(0xfe.toByte))
    passes(Prop.forAll(genStream, genDisc, Gen.oneOf(true, false)) {
      (vs, disc, terminate) =>
        val body = vs.flatMap(v => disc ++ encode(v).toSeq) ++
          (if (terminate) Seq(0x04.toByte) else Nil)
        val d = ResumeToken.decodeHex(hex(body.toArray))
        d.length == vs.length &&
          d.lazyZip(vs.map(_.decoded)).forall(same)
    }, min = 300)
  }

  test("v0 and v1/v2 resume-token layouts round-trip through decode") {
    val genDocKey = Gen.oneOf(
      Gen.listOfN(12, Gen.choose(0, 255).map(_.toByte))
        .map(l => KOid(l.toArray)),
      Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, Gen.zip(genPart, genScalar))).map { es =>
          KObj(es.zipWithIndex.map { case ((k, v), i) => (s"k${i}_$k", v) })
        })
    val genTok = for {
      t <- Gen.choose(0L, 0xffffffffL)
      i <- Gen.choose(0L, 0xffffffffL)
      version <- Gen.oneOf(0L, 1L, 2L)
      tokenType <- Gen.choose(1L, 127L)
      txnOp <- Gen.choose(0L, 100000L)
      fromInval <- Gen.oneOf(true, false)
      uuid <- Gen.listOfN(16, Gen.choose(0, 255).map(_.toByte))
      dk <- genDocKey
    } yield (t, i, version, tokenType, txnOp, fromInval, uuid.toArray, dk)
    passes(Prop.forAll(genTok) {
      case (t, i, version, tokenType, txnOp, fromInval, uuid, dk) =>
        val fields: Seq[KV] =
          if (version == 0L)
            Seq(KTs(t, i), KInt(0L), KInt(txnOp), KBin(4, uuid), dk)
          else
            Seq(KTs(t, i), KInt(version), KInt(tokenType), KInt(txnOp),
              KBool(fromInval), KBin(4, uuid), dk)
        val d = ResumeToken.decode(
          hex(fields.flatMap(encode(_).toSeq).toArray))
        d.timestampSeconds == t && d.timestampIncrement == i &&
          d.version == version.toInt &&
          d.tokenType == (if (version == 0L) None else Some(tokenType.toInt)) &&
          d.txnOpIndex == txnOp.toInt &&
          d.fromInvalidate == (if (version == 0L) None else Some(fromInval)) &&
          d.uuidHex.contains(uuid.map(x => f"${x & 0xff}%02x").mkString) &&
          same(d.documentKey, dk.decoded)
    }, min = 300)
  }
}
