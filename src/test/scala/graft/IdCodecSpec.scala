package graft

import graft.model.IdCodec
import org.scalatest.funsuite.AnyFunSuite

/** The external-ID text codec against an independent wide-integer
  * reference of the same spec (standard base32 bit order, custom
  * alphabet, no padding — encoding/base8.go + base32.go). */
class IdCodecSpec extends AnyFunSuite {

  private val Alphabet =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_"

  /** BigInt reference: left-align the id's bits into ceil(8n/5) 5-bit
    * groups — a different derivation of the same transform, so a bug in
    * the shift walk can't hide in both implementations. */
  private def refEncode(id: Array[Byte]): String = {
    val chars = (id.length * 8 + 4) / 5
    val shifted = BigInt(1, id) << (chars * 5 - id.length * 8)
    (0 until chars).map { i =>
      Alphabet.charAt(((shifted >> ((chars - 1 - i) * 5)) & 0x1f).toInt)
    }.mkString
  }

  test("golden vectors pin the wire text") {
    // all-zero bits → first table entry everywhere
    assert(IdCodec.encode8(new Array[Byte](8)) == "AAAAAAAAAAAAA")
    // all-one bits: 12 full groups of 31 ('f'), trailing 4 bits << 1 =
    // 30 ('e') — the stdlib's left-aligned final group, exactly the
    // reference's unrolled dst[12] = encoding[(id[7]<<1)&0x1F]
    assert(IdCodec.encode8(Array.fill[Byte](8)(-1)) == "ffffffffffffe")
    assert(IdCodec.encode32(new Array[Byte](32)) == "A" * 52)
    // a structured vector, stated against the BigInt reference
    val id = Array.tabulate[Byte](8)(i => ((i * 37 + 11) & 0xff).toByte)
    assert(IdCodec.encode8(id) == refEncode(id))
  }

  test("encode matches the independent reference on random ids, both widths") {
    val rnd = new scala.util.Random(0xB32)
    for (_ <- 1 to 200; n <- Seq(8, 32)) {
      val id = Array.fill[Byte](n)(rnd.nextInt().toByte)
      assert(IdCodec.encode(id) == refEncode(id), id.mkString(","))
    }
  }

  test("decode inverts encode on random ids, both widths") {
    val rnd = new scala.util.Random(0xDEC0)
    for (_ <- 1 to 200) {
      val k8 = Array.fill[Byte](8)(rnd.nextInt().toByte)
      assert(IdCodec.decode8(IdCodec.encode8(k8)).sameElements(k8))
      val k32 = Array.fill[Byte](32)(rnd.nextInt().toByte)
      assert(IdCodec.decode32(IdCodec.encode32(k32)).sameElements(k32))
    }
  }

  test("decode rejects wrong lengths and out-of-table characters") {
    intercept[IllegalArgumentException](IdCodec.decode8("AAAA"))
    intercept[IllegalArgumentException](IdCodec.decode8("AAAAAAAAAAAA!"))
    intercept[IllegalArgumentException](IdCodec.encode8(new Array[Byte](7)))
  }
}
