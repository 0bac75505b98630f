package graft.metrics

import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.atomic.AtomicLong

/** Loopback TCP streaming bound — the network analog of Bench's
  * `seq_read_gbps` disk probe, re-based from the reference's
  * client/server pair (microbenchmarks/src/network/client.rs:15-21:
  * N parallel streams write fixed-size blocks at a drain for a fixed
  * duration; aggregate bytes / time is the bound).
  *
  * The reference runs it across machines to contextualize engine
  * throughput against the NIC; on this single-node harness the loopback
  * number bounds what any shuffle or remote-read path could move through
  * a socket, the way the page-cache-warm disk probe bounds scans. Both
  * are stated as upper bounds: real object storage adds TLS, HTTP framing
  * and cross-AZ hops under this line.
  */
object NetProbe {

  /** Aggregate GB/s over `streams` concurrent loopback connections, each
    * writing `blockSize` blocks for ~`durationMs`. Returns 0.0 on any
    * setup failure — a bench must never die on its telemetry.
    */
  def tcpGbps(
      streams: Int = 4,
      blockSize: Int = 512 * 1024,
      durationMs: Long = 1000L): Double = {
    try {
      val server = new ServerSocket(0, streams, InetAddress.getLoopbackAddress)
      val port = server.getLocalPort
      val drains = new Thread(() =>
        try {
          while (true) {
            val sock = server.accept()
            val t = new Thread(() => {
              val buf = new Array[Byte](blockSize)
              try { while (sock.getInputStream.read(buf) >= 0) () }
              catch { case _: java.io.IOException => () }
              finally sock.close()
            })
            t.setDaemon(true)
            t.start()
          }
        } catch { case _: java.io.IOException => () }) // server closed
      drains.setDaemon(true)
      drains.start()

      val sent = new AtomicLong(0L)
      val t0 = System.nanoTime()
      val deadline = t0 + durationMs * 1000000L
      val writers = (0 until streams).map { i =>
        val t = new Thread(() => {
          val sock = new Socket(InetAddress.getLoopbackAddress, port)
          sock.setTcpNoDelay(true)
          val out = sock.getOutputStream
          // incompressible payload like the reference's rng fill; loopback
          // does not compress, but keep the probe honest about memory reads
          val block = new Array[Byte](blockSize)
          new java.util.Random(i + 1).nextBytes(block)
          try {
            while (System.nanoTime() < deadline) {
              out.write(block)
              sent.addAndGet(blockSize.toLong)
            }
            out.flush()
          } catch { case _: java.io.IOException => () }
          finally sock.close()
        })
        t.start()
        t
      }
      writers.foreach(_.join(durationMs * 3))
      val elapsed = (System.nanoTime() - t0) / 1e9
      server.close()
      if (elapsed <= 0) 0.0 else sent.get() / elapsed / 1e9
    } catch {
      case scala.util.control.NonFatal(_) => 0.0
    }
  }

  /** Same drain, but the writers speak HTTP/1.1 chunked upload — the
    * reference's http/client.rs:30-90 analog (request line + headers, then
    * `hex-size CRLF block CRLF` frames, terminal `0 CRLF CRLF`). Reported
    * GB/s counts PAYLOAD bytes only, so the gap under [[tcpGbps]] is the
    * HTTP framing + flush overhead the reference contextualizes engine
    * throughput against. The drain does not parse the framing — the probe
    * bounds the client-side streaming path, not a server implementation.
    */
  def httpGbps(
      streams: Int = 4,
      blockSize: Int = 512 * 1024,
      durationMs: Long = 1000L): Double = {
    try {
      val server = new ServerSocket(0, streams, InetAddress.getLoopbackAddress)
      val port = server.getLocalPort
      val drains = new Thread(() =>
        try {
          while (true) {
            val sock = server.accept()
            val t = new Thread(() => {
              val buf = new Array[Byte](blockSize)
              try { while (sock.getInputStream.read(buf) >= 0) () }
              catch { case _: java.io.IOException => () }
              finally sock.close()
            })
            t.setDaemon(true)
            t.start()
          }
        } catch { case _: java.io.IOException => () })
      drains.setDaemon(true)
      drains.start()

      val sent = new AtomicLong(0L)
      val t0 = System.nanoTime()
      val deadline = t0 + durationMs * 1000000L
      val writers = (0 until streams).map { i =>
        val t = new Thread(() => {
          val sock = new Socket(InetAddress.getLoopbackAddress, port)
          sock.setTcpNoDelay(true)
          val out = new java.io.BufferedOutputStream(sock.getOutputStream, blockSize + 64)
          val ascii = java.nio.charset.StandardCharsets.US_ASCII
          val block = new Array[Byte](blockSize)
          new java.util.Random(i + 1).nextBytes(block)
          val frameHead = (blockSize.toHexString + "\r\n").getBytes(ascii)
          val crlf = "\r\n".getBytes(ascii)
          try {
            out.write((s"POST /upload?file_name=file_${i + 1}.txt HTTP/1.1\r\n" +
              "Host: localhost\r\nTransfer-Encoding: chunked\r\n" +
              "Connection: close\r\n\r\n").getBytes(ascii))
            while (System.nanoTime() < deadline) {
              out.write(frameHead)
              out.write(block)
              out.write(crlf)
              sent.addAndGet(blockSize.toLong)
            }
            out.write("0\r\n\r\n".getBytes(ascii))
            out.flush()
          } catch { case _: java.io.IOException => () }
          finally sock.close()
        })
        t.start()
        t
      }
      writers.foreach(_.join(durationMs * 3))
      val elapsed = (System.nanoTime() - t0) / 1e9
      server.close()
      if (elapsed <= 0) 0.0 else sent.get() / elapsed / 1e9
    } catch {
      case scala.util.control.NonFatal(_) => 0.0
    }
  }
}
