package graft

import java.io.{InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.AtomicInteger

/** Minimal RFC 6455 websocket stub node (zero egress): accepts the
  * Tendermint-style subscribe request and pushes `NewBlock` event frames on
  * demand — the transport twin of the reference's websocket fixture replay.
  * Implements just enough of the protocol for `java.net.http.WebSocket`:
  * the opening handshake (Sec-WebSocket-Accept), masked client frames
  * (text / ping / close), and unmasked server text frames, including
  * fragmented delivery for the reassembly test.
  */
/** Ships in the MAIN artifact for the same reason as [[StubRpcServer]]:
  * the st8 gate query constructs it from the production classpath; nothing
  * in the engine's operator/source/sink paths references it.
  */
final class StubWsServer {

  private val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
  private val conns = new CopyOnWriteArrayList[Socket]()
  private val subscribeCount = new AtomicInteger(0)
  @volatile private var running = true

  def url: String = s"ws://127.0.0.1:${server.getLocalPort}/websocket"
  def subscriptions: Int = subscribeCount.get()

  /** Handshake gate: while armed, an accepted connection's 101 response is
    * held until [[releaseHandshake]] — lets a test park a client's
    * `buildAsync(...).join()` mid-flight deterministically (the
    * close()-during-reconnect interleaving in WsSubscription's supervisor).
    * Await with a 30 s ceiling so a test failure can never wedge the stub.
    */
  @volatile private var handshakeGate: java.util.concurrent.CountDownLatch = null
  private val heldHandshakes = new AtomicInteger(0)
  private val completedHandshakes = new AtomicInteger(0)
  /** CUMULATIVE successful handshakes (monotone — unlike `connectionCount`,
    * a census that can flicker 0→1→0 faster than a test can poll it): lets
    * a regression assert "connection N fully established" deterministically
    * before asserting it died, so a leak pin can never pass vacuously.
    * Incremented AFTER the connection is registered in `conns`, so
    * `handshakes == N` implies connection N is (or was) visible to
    * `connectionCount` — no window where the census reads 0 merely because
    * registration hasn't happened yet.
    */
  def handshakes: Int = completedHandshakes.get()
  def holdNextHandshake(): Unit = {
    handshakeGate = new java.util.concurrent.CountDownLatch(1)
  }
  /** Connections that have parked at the gate (cumulative). */
  def heldCount: Int = heldHandshakes.get()
  def releaseHandshake(): Unit = {
    val g = handshakeGate
    handshakeGate = null
    if (g != null) g.countDown()
  }

  private def sha1b64(s: String): String =
    Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1").digest(s.getBytes(UTF_8)))

  private def handshake(in: InputStream, out: OutputStream): Boolean = {
    val head = new StringBuilder
    while (!head.endsWith("\r\n\r\n")) {
      val b = in.read()
      if (b < 0) return false
      head.append(b.toChar)
    }
    val key = "(?i)Sec-WebSocket-Key:\\s*(\\S+)".r
      .findFirstMatchIn(head).map(_.group(1))
    key match {
      case Some(k) =>
        val gate = handshakeGate
        if (gate != null) {
          heldHandshakes.incrementAndGet()
          gate.await(30, java.util.concurrent.TimeUnit.SECONDS)
        }
        val accept = sha1b64(k + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11")
        out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
          "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
          s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
        out.flush()
        true
      case None => false
    }
  }

  /** Read one masked client frame: (opcode, payload). */
  private def readFrame(in: InputStream): Option[(Int, Array[Byte])] = {
    val b0 = in.read(); if (b0 < 0) return None
    val b1 = in.read(); if (b1 < 0) return None
    val opcode = b0 & 0x0f
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7f
    if (len == 126) len = (in.read() << 8 | in.read()).toLong
    else if (len == 127) {
      len = 0L
      for (_ <- 0 until 8) len = (len << 8) | in.read()
    }
    val mask = if (masked) Array.fill(4)(in.read().toByte) else Array.emptyByteArray
    val payload = new Array[Byte](len.toInt)
    var off = 0
    while (off < len) {
      val n = in.read(payload, off, len.toInt - off)
      if (n < 0) return None
      off += n
    }
    if (masked) for (i <- payload.indices) payload(i) = (payload(i) ^ mask(i % 4)).toByte
    Some((opcode, payload))
  }

  private def writeFrame(out: OutputStream, finOpcode: Int, payload: Array[Byte]): Unit = {
    out.write(finOpcode)
    if (payload.length < 126) out.write(payload.length)
    else if (payload.length < 65536) {
      out.write(126); out.write(payload.length >> 8); out.write(payload.length & 0xff)
    } else {
      out.write(127)
      for (i <- 7 to 0 by -1) out.write(((payload.length.toLong >> (8 * i)) & 0xff).toInt)
    }
    out.write(payload)
    out.flush()
  }

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val conn = new Thread(() => {
          try {
            val in = sock.getInputStream
            val out = sock.getOutputStream
            if (handshake(in, out)) {
              conns.add(sock)
              completedHandshakes.incrementAndGet()
              var open = true
              while (open && running) readFrame(in) match {
                case Some((0x1, payload)) =>
                  if (new String(payload, UTF_8).contains("\"subscribe\""))
                    subscribeCount.incrementAndGet()
                case Some((0x9, payload)) => // ping → pong
                  sock.synchronized(writeFrame(out, 0x8a, payload))
                case Some((0x8, _)) | None =>
                  open = false
                case _ => // continuation / pong / binary: ignore
              }
            }
          } catch { case _: Throwable => }
          finally { conns.remove(sock); try sock.close() catch { case _: Throwable => } }
        }, "ws-stub-conn")
        // daemon: a connection thread parked in readFrame must never hold
        // the hosting JVM open at exit (the non-daemon-pool hang trap)
        conn.setDaemon(true)
        conn.start()
      } catch { case _: Throwable => }
    }
  }, "ws-stub-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def broadcast(f: (OutputStream, Socket) => Unit): Unit =
    conns.forEach { sock =>
      try sock.synchronized(f(sock.getOutputStream, sock))
      catch { case _: Throwable => conns.remove(sock) }
    }

  /** Tendermint subscribe-event envelope for a NewBlock at `height`. */
  def newBlockJson(height: Long): String =
    s"""{"jsonrpc":"2.0","id":"0#event","result":{""" +
      s""""query":"tm.event='NewBlock'","data":{""" +
      s""""type":"tendermint/event/NewBlock","value":{"block":{"header":{""" +
      s""""height":"$height"}}}}}}"""

  def push(height: Long): Unit = pushRaw(newBlockJson(height))

  def pushRaw(json: String): Unit =
    broadcast((out, _) => writeFrame(out, 0x81, json.getBytes(UTF_8)))

  /** Send one text message as two fragments (FIN=0 text + FIN=1 cont). */
  def pushFragmented(json: String): Unit = {
    val bytes = json.getBytes(UTF_8)
    val mid = bytes.length / 2
    broadcast { (out, _) =>
      writeFrame(out, 0x01, bytes.slice(0, mid))
      writeFrame(out, 0x80, bytes.slice(mid, bytes.length))
    }
  }

  /** Hard-drop every client connection (reconnect test). */
  def dropAll(): Unit = {
    conns.forEach(s => try s.close() catch { case _: Throwable => })
    conns.clear()
  }

  def connectionCount: Int = conns.size()

  def stop(): Unit = {
    running = false
    releaseHandshake() // a still-parked handshake must not outlive the stub
    dropAll()
    try server.close() catch { case _: Throwable => }
  }
}
