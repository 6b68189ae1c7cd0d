package graft.model

/** External-ID text codec — the reference's `encoding/` package
  * (`encoding/base8.go`, `encoding/base32.go`, alphabet
  * `encoding/encoding.go:5`): standard base32 bit-packing (RFC 4648 bit
  * order, no padding) over a custom URL-safe 64-character table of which
  * the first 32 entries are used. The names follow the reference's — by
  * INPUT size, not radix: "8" is the 8-byte form (13 chars, security-key
  * text, `server/internal/message/security/key.go:216`) and "32" the
  * 32-byte form (52 chars, client-id text,
  * `server/internal/pkg/uid/clientid.go:106`).
  *
  * The reference unrolls the stdlib encoder per index for speed; this is
  * the same transform written as the generic 5-bit big-endian group walk
  * (a trailing partial group is left-aligned, exactly the stdlib's
  * no-padding semantics), so the two produce identical text. */
object IdCodec {

  /** `encoding/encoding.go:5` — base32 uses only the first 32 entries. */
  private val Alphabet =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_"

  private val Dec: Array[Byte] = {
    val d = Array.fill[Byte](256)(-1)
    for (i <- 0 until Alphabet.length) d(Alphabet.charAt(i)) = i.toByte
    d
  }

  /** 5-bit groups, big-endian within and across bytes; the last group is
    * the remaining bits left-shifted into position. */
  def encode(id: Array[Byte]): String = {
    val out = new StringBuilder((id.length * 8 + 4) / 5)
    var acc = 0L
    var nbits = 0
    for (b <- id) {
      acc = (acc << 8) | (b & 0xffL)
      nbits += 8
      while (nbits >= 5) {
        nbits -= 5
        out.append(Alphabet.charAt(((acc >>> nbits) & 0x1f).toInt))
      }
      acc &= (1L << nbits) - 1
    }
    if (nbits > 0) out.append(Alphabet.charAt(((acc << (5 - nbits)) & 0x1f).toInt))
    out.toString
  }

  /** Inverse of [[encode]] for an `n`-byte id; throws on characters
    * outside the table or a text of the wrong length. */
  def decode(text: String, n: Int): Array[Byte] = {
    require(text.length == (n * 8 + 4) / 5,
      s"expected ${(n * 8 + 4) / 5} chars for $n bytes, got ${text.length}")
    val out = new Array[Byte](n)
    var acc = 0L
    var nbits = 0
    var oi = 0
    for (c <- text) {
      val v = if (c < 256) Dec(c) else -1
      require(v >= 0 && v < 32, s"character '$c' outside the base32 table")
      acc = (acc << 5) | v
      nbits += 5
      if (nbits >= 8) {
        nbits -= 8
        out(oi) = ((acc >>> nbits) & 0xff).toByte
        oi += 1
        acc &= (1L << nbits) - 1
      }
    }
    out
  }

  /** Security-key text form: 8 bytes ↔ 13 chars (key.go:216/227). */
  def encode8(id: Array[Byte]): String = {
    require(id.length == 8, s"encode8 takes 8 bytes, got ${id.length}")
    encode(id)
  }
  def decode8(text: String): Array[Byte] = decode(text, 8)

  /** Client-id text form: 32 bytes ↔ 52 chars (clientid.go:106/117). */
  def encode32(id: Array[Byte]): String = {
    require(id.length == 32, s"encode32 takes 32 bytes, got ${id.length}")
    encode(id)
  }
  def decode32(text: String): Array[Byte] = decode(text, 32)
}
