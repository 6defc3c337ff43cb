package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ResumeToken

/** KeyString decoder against hand-encoded tokens (format per
  * `utils/ResumeTokenDecoder.java`): ctype tags, shifted ints with
  * complement-negatives, XOR dates, OID/UUID/bindata, object keys.
  */
class ResumeTokenSpec extends AnyFunSuite {

  test("v1 resume token decodes all fields") {
    val hex = "82" + "65000000" + "00000002" + // ts (0x65000000, 2)
      "2b02" +                                 // version 1
      "2b04" +                                 // tokenType 2
      "2b0a" +                                 // txnOpIndex 5
      "6e" +                                   // fromInvalidate=false
      "5a1004" + "000102030405060708090a0b0c0d0e0f" + // uuid bindata
      "4604"                                   // empty documentKey object
    val d = ResumeToken.decode(hex)
    assert(d.timestampSeconds == 0x65000000L && d.timestampIncrement == 2L)
    assert(d.version == 1 && d.tokenType.contains(2))
    assert(d.txnOpIndex == 5)
    assert(d.fromInvalidate.contains(false))
    assert(d.uuidHex.contains("000102030405060708090a0b0c0d0e0f"))
    assert(d.documentKey == Map.empty)
    assert(ResumeToken.txnOpIndex(hex) == 5)
  }

  test("v0 resume token layout") {
    val hex = "82" + "63525400" + "00000001" + // ts
      "29" +                                   // version 0 (kNumericZero)
      "2b06" +                                 // txnOpIndex 3
      "5a1004" + "ffeeddccbbaa99887766554433221100" + // uuid
      "64" + "0102030405060708090a0b0c"        // documentKey: OID
    val d = ResumeToken.decode(hex)
    assert(d.version == 0 && d.tokenType.isEmpty)
    assert(d.txnOpIndex == 3)
    assert(d.uuidHex.contains("ffeeddccbbaa99887766554433221100"))
    assert(d.documentKey == "0102030405060708090a0b0c")
  }

  test("scalar ctypes: ints, negatives, strings, dates, bools") {
    assert(ResumeToken.decodeHex("2b02") == Seq(1L))
    assert(ResumeToken.decodeHex("2c0258") == Seq(300L)) // 2-byte int
    assert(ResumeToken.decodeHex("27f9") == Seq(-3L))    // complement
    assert(ResumeToken.decodeHex("29") == Seq(0L))
    assert(ResumeToken.decodeHex("3c61626300") == Seq("abc"))
    assert(ResumeToken.decodeHex("7880000000000003e8") == Seq(1000L)) // date
    assert(ResumeToken.decodeHex("6f") == Seq(true))
    assert(ResumeToken.decodeHex("14") == Seq(null))
  }

  test("discriminator bytes and unknown ctypes") {
    // kLess prefix is skipped before the real ctype
    assert(ResumeToken.decodeHex("012b02") == Seq(1L))
    intercept[IllegalArgumentException] {
      ResumeToken.decodeHex("c8") // 200: unknown
    }
  }
}
