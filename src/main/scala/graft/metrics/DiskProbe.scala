package graft.metrics

import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, StandardOpenOption}
import java.util.concurrent.ArrayBlockingQueue
import java.util.concurrent.atomic.AtomicLong

/** Disk-write and pipelined network→disk bounds — the two speed-of-light
  * denominators Bench was missing next to `seq_read_gbps` / `net_gbps`.
  *
  * [[writeGbps]] re-bases the reference's async multi-file writer
  * (microbenchmarks/src/disk/write.rs:14-20: N tasks, each appending
  * fixed-size blocks to its own file for a fixed duration; aggregate
  * MiB/s is the bound). It is the denominator for sink-heavy operators —
  * `Layouts.compact` / `zordered` / the CSV sink — the way the read probe
  * bounds scans.
  *
  * [[netDiskGbps]] re-bases the reference's TCP→O_DIRECT pipeline
  * (microbenchmarks/src/network_disk/server.rs:61-115: socket reader
  * feeds 256 KiB chunks through a bounded channel to N positioned file
  * writers). On a cluster this shape is a remote shuffle write / ingest
  * path: the bound is the min of socket and disk legs when they overlap,
  * which is why it is reported separately from either. JVM port notes:
  * positioned `FileChannel.write` stands in for seek+write, page-cache
  * writes stand in for O_DIRECT (single-node harness — stated as an upper
  * bound like every other probe), and an `ArrayBlockingQueue` is the
  * bounded channel.
  *
  * Both return 0.0 on any setup failure: a bench must never die on its
  * own telemetry.
  */
object DiskProbe {

  /** Aggregate GB/s across `writers` threads, each appending `blockSize`
    * blocks to its own temp file for ~`durationMs`. Buffers are filled with
    * incompressible bytes ONCE per thread (the reference refills per block,
    * which bills rng cost to the disk bound; reuse keeps this a write
    * number). Files are truncated on open and deleted on exit.
    */
  def writeGbps(
      writers: Int = 4,
      blockSize: Int = 1 << 20,
      durationMs: Long = 1000L): Double = {
    try {
      val written = new AtomicLong(0L)
      val t0 = System.nanoTime()
      val deadline = t0 + durationMs * 1000000L
      val threads = (0 until writers).map { i =>
        val t = new Thread(() => {
          val path = Files.createTempFile(s"graft-writeprobe-$i", ".bin")
          val ch = FileChannel.open(path, StandardOpenOption.WRITE,
            StandardOpenOption.TRUNCATE_EXISTING)
          val block = new Array[Byte](blockSize)
          new java.util.Random(i + 1).nextBytes(block)
          try {
            while (System.nanoTime() < deadline) {
              val buf = ByteBuffer.wrap(block)
              while (buf.hasRemaining) ch.write(buf)
              written.addAndGet(blockSize.toLong)
            }
            ch.force(false) // flush data so the number is not purely RAM
          } catch { case _: java.io.IOException => () }
          finally {
            ch.close()
            Files.deleteIfExists(path)
          }
        })
        // daemon: a writer blocked on a stalled mount outlives the join
        // timeout below, and a non-daemon thread would then keep the JVM
        // alive after the bench finishes (every other probe thread in this
        // file and NetProbe is daemon for the same reason)
        t.setDaemon(true)
        t.start()
        t
      }
      threads.foreach(_.join(durationMs * 5))
      val elapsed = (System.nanoTime() - t0) / 1e9
      if (elapsed <= 0) 0.0 else written.get() / elapsed / 1e9
    } catch {
      case scala.util.control.NonFatal(_) => 0.0
    }
  }

  /** COLD sequential read GB/s over the parquet files in `dir`: opens each
    * file with O_DIRECT (`ExtendedOpenOption.DIRECT`), which bypasses the
    * page cache — the honest counterpart of Bench's warm
    * `seq_read_warm_gbps` loop, and the JVM analog of the reference's cold
    * RAID0 read microbenchmark (microbenchmarks/src/disk/read.rs:21-82,
    * which O_DIRECTs the same way). O_DIRECT needs the buffer, offset and
    * length aligned to the filesystem block size; the tail of each file
    * (< one aligned block) is skipped — bounded by blockSize per file,
    * noise at any realistic file size. Returns 0.0 where the filesystem
    * refuses O_DIRECT (tmpfs, some overlayfs) — a bench must never die on
    * its own telemetry, and 0.0 is unmistakably "not measured".
    */
  /** Cold-read probe of an arbitrary directory's DEVICE (VERDICT r12 #7:
    * the round-11 bench inflation took a round to diagnose because the
    * collapsed scratch device had no probe of its own): writes a
    * throwaway `probeBytes` file into `dir`, fsyncs, O_DIRECT-reads it
    * back via [[coldReadGbps]], deletes it. Returns 0.0 on any failure —
    * telemetry must never kill the bench.
    */
  def deviceColdGbps(dir: String, probeBytes: Long = 256L << 20): Double = {
    try {
      val d = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(d)
      val f = java.nio.file.Files.createTempFile(d, "coldprobe", ".parquet")
      try {
        val chunk = ByteBuffer.allocateDirect(1 << 20)
        val ch = FileChannel.open(f, StandardOpenOption.WRITE)
        try {
          var written = 0L
          while (written < probeBytes) {
            chunk.clear()
            while (chunk.hasRemaining) ch.write(chunk)
            written += chunk.capacity()
          }
          ch.force(true)
        } finally ch.close()
        // cold-read EXACTLY the file just written — a stale coldprobe
        // left by a hard-killed prior run, or any pre-existing parquet
        // at the base, must not skew the device number (advice r13)
        coldReadFilesGbps(Array(f.toFile))
      } finally java.nio.file.Files.deleteIfExists(f)
    } catch { case scala.util.control.NonFatal(_) => 0.0 }
  }

  def coldReadGbps(dir: String, align: Int = 4096, blockSize: Int = 1 << 20): Double = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith(".parquet"))
    coldReadFilesGbps(files, align, blockSize)
  }

  def coldReadFilesGbps(
      files: Array[java.io.File],
      align: Int = 4096,
      blockSize: Int = 1 << 20): Double = {
    try {
      if (files.isEmpty) return 0.0
      // alignment: allocate align-extra and slice to an aligned position
      val raw = ByteBuffer.allocateDirect(blockSize + align)
      val addrAligned = raw.alignedSlice(align)
      var bytes = 0L
      val t0 = System.nanoTime()
      files.foreach { f =>
        val ch = FileChannel.open(f.toPath, StandardOpenOption.READ,
          com.sun.nio.file.ExtendedOpenOption.DIRECT)
        try {
          val alignedLen = (f.length() / align) * align
          var pos = 0L
          var eof = false
          while (pos < alignedLen && !eof) {
            addrAligned.clear()
            addrAligned.limit(math.min(addrAligned.capacity().toLong, alignedLen - pos).toInt)
            val n = ch.read(addrAligned, pos)
            if (n <= 0) eof = true
            else { pos += n; bytes += n }
          }
        } finally ch.close()
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      if (elapsed <= 0 || bytes == 0) 0.0 else bytes / elapsed / 1e9
    } catch {
      case scala.util.control.NonFatal(_) => 0.0
    }
  }

  private final case class Chunk(offset: Long, data: Array[Byte], len: Int)

  /** Loopback TCP client → socket reader → bounded queue → `writers`
    * positioned file writers, for ~`durationMs`. Returns payload GB/s
    * through the WHOLE pipeline (bytes fully received off the socket —
    * the reference counts `received` the same way). `queueDepth` is the
    * bounded-channel size; when the disk leg stalls, backpressure reaches
    * the socket exactly as in the reference's `async_channel::bounded`.
    */
  def netDiskGbps(
      writers: Int = 4,
      blockSize: Int = 256 * 1024,
      queueDepth: Int = 4,
      durationMs: Long = 1000L): Double = {
    import java.net.{InetAddress, ServerSocket, Socket}
    import java.util.concurrent.TimeUnit
    import java.util.concurrent.atomic.AtomicBoolean
    try {
      val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
      val port = server.getLocalPort
      val received = new AtomicLong(0L)
      val sink: Path = Files.createTempFile("graft-netdisk", ".bin")
      val queue = new ArrayBlockingQueue[Chunk](queueDepth)
      // Shutdown protocol: no poison pills — a writer that dies mid-run
      // (IOException) would have to re-enqueue one for every sibling or
      // they block forever on take(). Instead the acceptor flips `closed`
      // when the socket drains and writers poll with a timeout: once
      // closed && queue-empty every writer exits on its own, regardless of
      // how many siblings died, and nothing ever blocks unbounded.
      val closed = new AtomicBoolean(false)

      // disk leg: N writers drain the bounded channel with positioned writes
      val writerThreads = (0 until writers).map { _ =>
        val t = new Thread(() => {
          val ch = FileChannel.open(sink, StandardOpenOption.WRITE)
          try {
            var done = false
            while (!done) {
              val c = queue.poll(100, TimeUnit.MILLISECONDS)
              if (c != null) ch.write(ByteBuffer.wrap(c.data, 0, c.len), c.offset)
              else if (closed.get()) done = true
            }
          } catch { case _: java.io.IOException => () }
          finally ch.close()
        })
        t.setDaemon(true)
        t.start()
        t
      }

      // server leg: read socket blocks, hand each through the channel.
      // offer-with-timeout: if every writer died the queue stays full and a
      // bare put() would hang the acceptor past its join timeout.
      val acceptor = new Thread(() => {
        try {
          val sock = server.accept()
          val in = sock.getInputStream
          var offset = 0L
          var n = 0
          val buf = new Array[Byte](blockSize)
          var stalled = false
          while (!stalled && { n = in.read(buf); n >= 0 }) {
            if (queue.offer(Chunk(offset, java.util.Arrays.copyOf(buf, n), n),
                durationMs * 2, TimeUnit.MILLISECONDS)) {
              offset += n
              received.addAndGet(n.toLong)
            } else stalled = true // all writers dead; stop counting
          }
          sock.close()
        } catch {
          case _: java.io.IOException => ()
          case _: InterruptedException => ()
        }
        finally closed.set(true)
      })
      acceptor.setDaemon(true)
      acceptor.start()

      // client leg: stream incompressible blocks for the duration
      val t0 = System.nanoTime()
      val deadline = t0 + durationMs * 1000000L
      val sock = new Socket(InetAddress.getLoopbackAddress, port)
      sock.setTcpNoDelay(true)
      val out = sock.getOutputStream
      val block = new Array[Byte](blockSize)
      new java.util.Random(7).nextBytes(block)
      try {
        while (System.nanoTime() < deadline) out.write(block)
        out.flush()
      } catch { case _: java.io.IOException => () }
      finally sock.close()

      acceptor.join(durationMs * 5)
      writerThreads.foreach(_.join(durationMs * 5))
      val elapsed = (System.nanoTime() - t0) / 1e9
      server.close()
      Files.deleteIfExists(sink)
      if (elapsed <= 0) 0.0 else received.get() / elapsed / 1e9
    } catch {
      case scala.util.control.NonFatal(_) => 0.0
    }
  }
}
