package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Wire-level vectors for the gRPC transport's building blocks: the
  * Packet proto bytes and the HPACK decode path (Netty codec) against
  * RFC 7541's own published examples — real gRPC clients send exactly
  * these shapes (Huffman-coded values, incremental indexing, dynamic-
  * table references), so the integration must decode the RFC's blocks,
  * not just its own encoder's output. */
class H2FramingSpec extends AnyFunSuite {

  test("Packet proto: golden bytes and unknown-field tolerance") {
    // message Packet { bytes data = 1; } — field 1 wire type 2:
    // tag 0x0A, varint length, payload (proto3 wire format)
    assert(H2Framing.packetProto("abc".getBytes("US-ASCII")).toSeq ==
      Seq[Byte](0x0a, 3, 'a', 'b', 'c'))
    // round-trip at the varint length boundary (128 needs two bytes)
    val big = Array.tabulate[Byte](300)(i => (i * 7).toByte)
    val enc = H2Framing.packetProto(big)
    assert(enc(0) == 0x0a && (enc(1) & 0xff) == 0xac && enc(2) == 0x02)
    assert(H2Framing.packetData(enc).sameElements(big))
    // unknown fields (a proto3 peer may add them) are skipped, data kept:
    // field 2 varint 7, then field 1 bytes "xy", then field 3 fixed32
    val withUnknown = Array[Byte](0x10, 7, 0x0a, 2, 'x', 'y', 0x1d, 1, 2, 3, 4)
    assert(new String(H2Framing.packetData(withUnknown), "US-ASCII") == "xy")
    // empty message (zero fields) decodes to empty data
    assert(H2Framing.packetData(Array.emptyByteArray).isEmpty)
  }

  test("HPACK decode handles RFC 7541's Huffman request examples") {
    import io.netty.buffer.Unpooled
    import io.netty.handler.codec.http2.DefaultHttp2HeadersDecoder
    val dec = new DefaultHttp2HeadersDecoder(false)
    def block(hex: String) = Unpooled.wrappedBuffer(
      hex.replaceAll("\\s", "").sliding(2, 2)
        .map(Integer.parseInt(_, 16).toByte).toArray)
    // C.4.1 — first request, Huffman-coded authority, incremental indexing
    val h1 = dec.decodeHeaders(1, block("8286 8441 8cf1 e3c2 e5f2 3a6b a0ab 90f4 ff"))
    assert(h1.method.toString == "GET" && h1.scheme.toString == "http")
    assert(h1.path.toString == "/" && h1.authority.toString == "www.example.com")
    // C.4.2 — second request on the SAME connection: the authority now
    // rides the dynamic table entry the first block inserted, so this
    // only decodes if the decoder kept state across blocks
    val h2 = dec.decodeHeaders(3, block("8286 84be 5886 a8eb 1064 9cbf"))
    assert(h2.authority.toString == "www.example.com")
    assert(h2.get("cache-control").toString == "no-cache")
    // C.4.3 — third request: https scheme, custom Huffman-coded header
    val h3 = dec.decodeHeaders(5, block(
      "8287 85bf 4088 25a8 49e9 5ba9 7d7f 8925 a849 e95b b8e8 b4bf"))
    assert(h3.scheme.toString == "https" && h3.path.toString == "/index.html")
    assert(h3.get("custom-key").toString == "custom-value")
  }
}
