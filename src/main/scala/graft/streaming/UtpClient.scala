package graft.streaming

import java.net.Socket

import graft.streaming.{UtpCodec => C}

/** Minimal programmatic uTP client — the counterpart of [[UtpServer]]
  * for Scala callers (smoke-testing a deployment, bridging a legacy
  * producer, driving the endpoint from tests). Blocking, one socket,
  * request/response in caller order; not a connection pool. The wire
  * format is [[UtpCodec]]'s, so this client also talks to the reference
  * server for the verbs both sides share.
  *
  * `ws = true` tunnels the same packets through RFC 6455 WebSocket
  * frames ([[WsFraming]], client-side masking) — the transport the
  * reference server exposes for browser-adjacent clients. `grpc = true`
  * speaks the reference's gRPC transport instead: h2c + the
  * `Unitdb/Stream` bidi rpc, each uTP packet riding one `Packet` proto
  * ([[H2Framing]]). The two flags are mutually exclusive. */
final class UtpClient(host: String, port: Int, ws: Boolean = false,
    grpc: Boolean = false,
    tls: Option[javax.net.ssl.SSLContext] = None) extends AutoCloseable {
  require(!(ws && grpc), "pick one transport")
  // the server's gRPC face is h2c — cleartext by definition; a TLS h2
  // face would be a different transport (grpc-go swaps creds for it)
  require(!(grpc && tls.isDefined), "the grpc face is h2c (cleartext)")

  private val sock = tls match {
    case Some(ctx) =>
      val s = ctx.getSocketFactory.createSocket(host, port)
        .asInstanceOf[javax.net.ssl.SSLSocket]
      // endpoint identification: raw JSSE validates the CHAIN only by
      // default — without this, any certificate from a trusted CA (for
      // any name) would pass, and the TLS option's MITM protection is
      // hostname-blind. "HTTPS" = RFC 2818/6125 rules (SAN dNSName /
      // iPAddress match against `host`).
      val p = s.getSSLParameters
      p.setEndpointIdentificationAlgorithm("HTTPS")
      s.setSSLParameters(p)
      s
    case None => new Socket(host, port)
  }
  sock.setTcpNoDelay(true)
  private val (in, out) =
    if (grpc) {
      try H2Framing.clientStream(sock.getInputStream, sock.getOutputStream,
        s"$host:$port")
      catch {
        case e: Throwable =>
          try sock.close() catch { case _: Exception => () }
          throw e
      }
    } else if (ws) {
      // a refused/garbled upgrade throws out of the constructor — close
      // the connected socket on the way out or the fd leaks per retry
      try {
        WsFraming.clientHandshake(sock.getInputStream, sock.getOutputStream,
          s"$host:$port")
      } catch {
        case e: Throwable =>
          try sock.close() catch { case _: Exception => () }
          throw e
      }
      WsFraming.wrap(sock.getInputStream, sock.getOutputStream,
        maskFrames = true)
    } else
      (sock.getInputStream: java.io.InputStream,
        sock.getOutputStream: java.io.OutputStream)
  private val msgIds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** uint16 id space, never 0 — the reference server narrows
    * ControlMessage.MessageID to uint16 (utp/flow_control.go), so a
    * 31-bit id would stop matching acks on a long-lived connection once
    * past 65535. */
  private def nextId(): Int = {
    var id = msgIds.incrementAndGet() & 0xffff
    while (id == 0) id = msgIds.incrementAndGet() & 0xffff
    id
  }

  private def request(pkt: Array[Byte]): (C.FixedHeader, Array[Byte]) = {
    out.write(pkt); out.flush()
    C.readPacket(in).getOrElse(
      throw new java.io.EOFException("server closed the connection"))
  }

  /** Consume the publish ack that follows a special-request reply. On a
    * connection that also holds live subscriptions an interleaved
    * delivery could land here instead — asserting the frame type keeps
    * the request/response stream from silently desynchronizing (it
    * throws loudly rather than treating a delivery as the ack). */
  private def expectPublishAck(): Unit = {
    val (fh, _) = C.readPacket(in).getOrElse(
      throw new java.io.EOFException("server closed before publish ack"))
    require(fh.msgType == C.PUBLISH && fh.flowControl == C.ACKNOWLEDGE,
      s"expected publish ack, got $fh — special requests must not share a " +
        "connection with live subscriptions")
  }

  /** CONNECT handshake; returns the server-assigned connection id. The
    * batch thresholds configure delivery-mode-2 coalescing for this
    * connection's subscriptions (0 = server defaults). */
  def connect(clientId: String = "", insecure: Boolean = true,
      batchDurationMs: Int = 0, batchByteThreshold: Int = 0,
      batchCountThreshold: Int = 0): Int = {
    val (fh, body) = request(C.encodePacket(C.CONNECT, C.NONE,
      C.encodeConnect(C.Connect(1, insecure, clientId, 30,
        cleanSess = true, 0, "", Array.emptyByteArray,
        batchDurationMs, batchByteThreshold, batchCountThreshold))))
    require(fh.msgType == C.CONNECT && fh.flowControl == C.ACKNOWLEDGE,
      s"unexpected reply to CONNECT: $fh")
    val connack = C.decodeConnack(C.decodeControl(body).message)
    require(connack.returnCode == C.Accepted,
      s"connection refused: code ${connack.returnCode}")
    connack.connId
  }

  /** Publish one or more (topic, payload[, ttl]) messages; returns after
    * the server's acknowledge. */
  def publish(messages: (String, Array[Byte])*): Unit =
    publishWithTtl(messages.map { case (t, p) => (t, p, "") }: _*)

  def publishWithTtl(messages: (String, Array[Byte], String)*): Unit = {
    val id = nextId()
    val (fh, body) = request(C.encodePacket(C.PUBLISH, C.NONE,
      C.encodePublish(C.Publish(id, 0,
        messages.map { case (t, p, ttl) => C.PublishMessage(t, p, ttl) }))))
    require(fh.msgType == C.PUBLISH && fh.flowControl == C.ACKNOWLEDGE &&
      C.decodeControl(body).messageId == id, s"publish not acknowledged: $fh")
  }

  /** Relay a stored window back: returns the payloads for `topic` within
    * the `last` duration (e.g. "1h"), newest delivery order as served. */
  def relay(topic: String, last: String): Seq[Array[Byte]] = {
    val id = nextId()
    out.write(C.encodePacket(C.RELAY, C.NONE,
      C.encodeRelay(C.Relay(id, Seq(C.RelayRequest(topic, last))))))
    out.flush()
    val got = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var acked = false
    while (!acked) {
      val (fh, body) = C.readPacket(in).getOrElse(
        throw new java.io.EOFException("server closed during relay"))
      if (fh.msgType == C.PUBLISH && fh.flowControl == C.NONE)
        got ++= C.decodePublish(body).messages.map(_.payload)
      else if (fh.msgType == C.RELAY && fh.flowControl == C.ACKNOWLEDGE &&
          C.decodeControl(body).messageId == id)
        acked = true
      else throw new IllegalStateException(s"unexpected frame during relay: $fh")
    }
    got.toSeq
  }

  /** Register live subscriptions (deliveryMode 0 express / 1 reliable /
    * 2 batch). Delivered messages arrive interleaved on this socket —
    * consume them with [[nextDelivery]]. */
  def subscribe(patterns: (String, Int)*): Unit = {
    val id = nextId()
    val (fh, body) = request(C.encodePacket(C.SUBSCRIBE, C.NONE,
      C.encodeSubscribe(C.Subscribe(id,
        patterns.map { case (p, m) => C.Subscription(m, 0, p) }))))
    require(fh.msgType == C.SUBSCRIBE && fh.flowControl == C.ACKNOWLEDGE &&
      C.decodeControl(body).messageId == id, s"subscribe not acknowledged: $fh")
  }

  /** Block for the next fanned-out delivery, transparently walking the
    * reliable handshake (NOTIFY → RECEIVE → message → RECEIPT →
    * COMPLETE) when the subscription asked for delivery mode 1. */
  def nextDelivery(): Seq[(String, Array[Byte])] = {
    while (true) {
      val (fh, body) = C.readPacket(in).getOrElse(
        throw new java.io.EOFException("server closed"))
      (fh.msgType, fh.flowControl) match {
        case (C.PUBLISH, C.NONE) =>
          return C.decodePublish(body).messages.map(m => (m.topic, m.payload))
        case (C.PUBLISH, C.NOTIFY) =>
          // RECEIVE/RECEIPT ride MessageType=PUBLISH, as the reference
          // client encodes them (utp/flow_control.go:75-83) — the
          // receiver dispatches on FlowControl alone
          val id = C.decodeControl(body).messageId
          out.write(C.encodePacket(C.PUBLISH, C.RECEIVE,
            C.encodeControl(C.ControlMessage(id, Array.emptyByteArray))))
          out.flush()
          val (mfh, mbody) = C.readPacket(in).getOrElse(
            throw new java.io.EOFException("server closed mid-handshake"))
          require(mfh.msgType == C.PUBLISH && mfh.flowControl == C.NONE)
          val msg = C.decodePublish(mbody)
          out.write(C.encodePacket(C.PUBLISH, C.RECEIPT,
            C.encodeControl(C.ControlMessage(id, Array.emptyByteArray))))
          out.flush()
          val (cfh, _) = C.readPacket(in).getOrElse(
            throw new java.io.EOFException("server closed mid-handshake"))
          require(cfh.flowControl == C.COMPLETE)
          return msg.messages.map(m => (m.topic, m.payload))
        case other =>
          throw new IllegalStateException(s"unexpected frame: $other")
      }
    }
    Nil // unreachable
  }

  /** Keygen special request: mint a key for (topic, access) where access
    * is "r", "w" or "rw" — returns the key string. */
  def keyGen(topic: String, access: String): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val payload =
      s"""[{"topic":${om.writeValueAsString(topic)},"type":${om.writeValueAsString(access)}}]"""
    out.write(C.encodePacket(C.PUBLISH, C.NONE,
      C.encodePublish(C.Publish(nextId(), 0, Seq(C.PublishMessage(
        "unitdb/keygen", payload.getBytes("UTF-8"), ""))))))
    out.flush()
    val (rfh, rbody) = C.readPacket(in).getOrElse(
      throw new java.io.EOFException("server closed"))
    require(rfh.msgType == C.PUBLISH && rfh.flowControl == C.NONE)
    val resp = om.readTree(C.decodePublish(rbody).messages.head.payload)
    expectPublishAck()
    require(resp.get(0).get("status").asInt() == 200, resp.toString)
    resp.get(0).get("key").asText()
  }

  /** Clientid special request: mint a fresh opaque client id — the
    * reference text form, 52 chars of the custom base32 alphabet
    * ([[graft.model.IdCodec]]). */
  def clientId(): String = {
    out.write(C.encodePacket(C.PUBLISH, C.NONE,
      C.encodePublish(C.Publish(nextId(), 0, Seq(C.PublishMessage(
        "unitdb/clientid", Array.emptyByteArray, ""))))))
    out.flush()
    val (rfh, rbody) = C.readPacket(in).getOrElse(
      throw new java.io.EOFException("server closed"))
    require(rfh.msgType == C.PUBLISH && rfh.flowControl == C.NONE)
    val resp = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(C.decodePublish(rbody).messages.head.payload)
    expectPublishAck()
    require(resp.get("status").asInt() == 200, resp.toString)
    resp.get("clientId").asText()
  }

  /** Varz special request — the server's metrics snapshot (counters +
    * the per-face latency percentile blocks) as parsed JSON, the
    * in-band twin of the reference server's /varz monitor face. */
  def varz(): com.fasterxml.jackson.databind.JsonNode = {
    out.write(C.encodePacket(C.PUBLISH, C.NONE,
      C.encodePublish(C.Publish(nextId(), 0, Seq(C.PublishMessage(
        "unitdb/varz", Array.emptyByteArray, ""))))))
    out.flush()
    val (rfh, rbody) = C.readPacket(in).getOrElse(
      throw new java.io.EOFException("server closed"))
    require(rfh.msgType == C.PUBLISH && rfh.flowControl == C.NONE)
    val resp = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(C.decodePublish(rbody).messages.head.payload)
    expectPublishAck()
    require(resp.get("status").asInt() == 200, resp.toString)
    resp
  }

  def ping(): Unit = {
    val (fh, _) = request(C.encodePacket(C.PINGREQ, C.NONE,
      Array.emptyByteArray))
    require(fh.msgType == C.PINGREQ && fh.flowControl == C.ACKNOWLEDGE)
  }

  def close(): Unit = {
    try {
      out.write(C.encodePacket(C.DISCONNECT, C.NONE, Array.emptyByteArray))
      out.flush()
    } catch { case _: Exception => () }
    try sock.close() catch { case _: Exception => () }
  }
}
