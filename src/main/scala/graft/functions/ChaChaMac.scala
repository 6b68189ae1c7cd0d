package graft.functions

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** ChaCha20-Poly1305 payload envelope, wire-compatible with the reference
  * MAC (crypto/mac.go:84-110) so payloads encrypted by the reference
  * engine decrypt here and vice versa — the documented AES-GCM deviation
  * gets a parity option.
  *
  * Wire format of an encrypted value (reference db_internal.go:292-296
  * snappy-encodes first, then MACs):
  *
  *   s   = snappy(payload)                      (block format)
  *   sig = bigEndian32(fnv32(s))                (hash/hash.go:34-55)
  *   out = s[0..3] || sig || AEAD_Seal(key, nonce = salt || s[0..3] || sig,
  *                                     plaintext = s[4..], aad = ∅)
  *
  * The first 4 compressed bytes ride in the clear ("epoch" in the
  * reference's terms — it MACs whatever the first 4 bytes of the snappy
  * stream are), the 4-byte signature binds the nonce to the full
  * compressed content, and the 12-byte AEAD nonce is salt ++ those 8
  * header bytes. `salt` reproduces the reference's key-schedule behavior
  * exactly: the Go expression `byte(k[4i])<<24 | ... | byte(k[4i+3])`
  * truncates every shifted term to zero in uint8 arithmetic, so the salt
  * is simply bytes 3, 7, 11, 15 of the key — we match the behavior, not
  * the intent, because the nonce (and thus the ciphertext) depends on it.
  *
  * Sealing is DETERMINISTIC given (key, payload) — the reference derives
  * the nonce from content, not randomness — which is what lets this be a
  * plain deterministic Catalyst expression. Snappy block encodings can
  * differ between encoders while decoding identically, so cross-engine
  * parity is round-trip parity (either side decrypts the other's
  * output), not bit-identical ciphertext.
  *
  * SECURITY BOUND (inherited from the reference's scheme): nonce
  * uniqueness rests on the 8 header bytes, of which the first 4 are the
  * snappy stream's leading bytes (mostly a length varint — equal-length
  * payloads share them) and the last 4 are fnv32, a non-cryptographic
  * 32-bit hash. By the birthday bound, ~2^16 distinct messages under one
  * key make a nonce collision likely, and ChaCha20-Poly1305 nonce reuse
  * leaks the keystream XOR and enables forgery. This mode exists for
  * reference-interop/migration stores; keep the default AES-GCM path
  * (random 96-bit nonces) for high-volume encryption under one key, or
  * rotate ChaCha keys well before ~10^4 messages each.
  *
  * Both expressions run as one static call inside whole-stage codegen
  * (the [[NfcNormalize]] ladder, rung (b)); JCE ChaCha20-Poly1305 is in
  * the JDK since 11. */
object ChaChaMacUtil {
  private val EpochSize = 4
  private val MessageOffset = 8 // EpochSize + 4-byte signature
  private val TagSize = 16

  /** The reference's 32-bit content hash (hash/hash.go:34-55): an
    * FNV-style fold with offset 0xcc9e2d51 and prime 0x1b873593. */
  def fnv32(b: Array[Byte]): Int = {
    var h = 0xcc9e2d51
    var i = 0
    while (i < b.length) {
      h = (h ^ (b(i) & 0xff)) * 0x1b873593
      i += 1
    }
    h
  }

  /** Nonce salt from the key — bytes 3/7/11/15 (see class doc for why). */
  def salt(key: Array[Byte]): Array[Byte] =
    Array(key(3), key(7), key(11), key(15))

  private def aead(mode: Int, key: Array[Byte], nonce: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("ChaCha20-Poly1305")
    c.init(mode, new SecretKeySpec(key, "ChaCha20"),
      new IvParameterSpec(nonce))
    c.doFinal(data)
  }

  /** Encrypt a raw payload to the reference's at-rest envelope.
    *
    * Sub-4-byte snappy streams (payloads of 0 or 1 byte — a 2-byte
    * payload already frames to exactly 4) are zero-padded to the 4-byte
    * header the envelope requires. The reference panics on that range
    * (`src[:4]` over a shorter slice), so no reference-written data can
    * be in it — the padding is a deterministic extension, not a parity
    * break, and [[open]] reverses it exactly by reading the stream's own
    * uncompressed-length varint. */
  def seal(key: Array[Byte], payload: Array[Byte]): Array[Byte] = {
    require(key.length == 32,
      s"ChaCha20-Poly1305 needs a 32-byte key, got ${key.length}")
    val s0 = org.xerial.snappy.Snappy.compress(
      if (payload == null) Array.emptyByteArray else payload)
    val s = if (s0.length >= EpochSize) s0
            else java.util.Arrays.copyOf(s0, EpochSize)
    val sig = fnv32(s)
    val header = new Array[Byte](MessageOffset)
    System.arraycopy(s, 0, header, 0, EpochSize)
    header(4) = (sig >>> 24).toByte
    header(5) = (sig >>> 16).toByte
    header(6) = (sig >>> 8).toByte
    header(7) = sig.toByte
    val nonce = salt(key) ++ header
    val ct = aead(Cipher.ENCRYPT_MODE, key, nonce,
      java.util.Arrays.copyOfRange(s, EpochSize, s.length))
    header ++ ct
  }

  /** Decrypt the reference's at-rest envelope back to the raw payload.
    * Throws on authentication failure (tampered bytes / wrong key). */
  def open(key: Array[Byte], blob: Array[Byte]): Array[Byte] = {
    require(key.length == 32,
      s"ChaCha20-Poly1305 needs a 32-byte key, got ${key.length}")
    require(blob != null && blob.length >= MessageOffset + TagSize,
      "ciphertext shorter than the envelope overhead: authentication failed")
    val nonce = salt(key) ++ java.util.Arrays.copyOfRange(blob, 0, MessageOffset)
    val tail = aead(Cipher.DECRYPT_MODE, key, nonce,
      java.util.Arrays.copyOfRange(blob, MessageOffset, blob.length))
    val s = new Array[Byte](EpochSize + tail.length)
    System.arraycopy(blob, 0, s, 0, EpochSize)
    System.arraycopy(tail, 0, s, EpochSize, tail.length)
    // undo seal's sub-4-byte zero padding: the stream's own leading
    // varint says how long the payload is, which pins the true stream
    // length for the only two padded cases (0 → 1-byte stream, 1 → 3)
    (s(0) & 0xff) match {
      case 0 => Array.emptyByteArray
      case 1 => org.xerial.snappy.Snappy.uncompress(
        java.util.Arrays.copyOf(s, 3))
      case _ => org.xerial.snappy.Snappy.uncompress(s)
    }
  }
}

sealed abstract class ChaChaMacExpr extends UnaryExpression {
  def key: Array[Byte]
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects BINARY, got $t")
  }
  /** Key bytes as a Java array-literal initializer inside generated code
    * (small: 32 bytes, referenced once per operator). */
  protected def keyRef(ctx: CodegenContext): String =
    ctx.addReferenceObj("chachaKey", key, "byte[]")
}

/** `chacha_seal(payload)` → reference-format ciphertext. */
case class ChaChaSeal(child: Expression, key: Array[Byte]) extends ChaChaMacExpr {
  override def prettyName: String = "chacha_seal"
  override protected def nullSafeEval(p: Any): Any =
    ChaChaMacUtil.seal(key, p.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = keyRef(ctx)
    defineCodeGen(ctx, ev, p => s"graft.functions.ChaChaMacUtil.seal($k, $p)")
  }
  override protected def withNewChildInternal(newChild: Expression): ChaChaSeal =
    copy(child = newChild)
}

/** `chacha_open(ciphertext)` → raw payload; throws on auth failure. */
case class ChaChaOpen(child: Expression, key: Array[Byte]) extends ChaChaMacExpr {
  override def prettyName: String = "chacha_open"
  override protected def nullSafeEval(p: Any): Any =
    ChaChaMacUtil.open(key, p.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = keyRef(ctx)
    defineCodeGen(ctx, ev, p => s"graft.functions.ChaChaMacUtil.open($k, $p)")
  }
  override protected def withNewChildInternal(newChild: Expression): ChaChaOpen =
    copy(child = newChild)
}

object ChaChaSeal {
  def apply(payload: Column, key: Array[Byte]): Column =
    GraftBridge.column(ChaChaSeal(GraftBridge.expression(payload), key))
}

object ChaChaOpen {
  def apply(payload: Column, key: Array[Byte]): Column =
    GraftBridge.column(ChaChaOpen(GraftBridge.expression(payload), key))
}
