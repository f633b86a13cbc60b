package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FSDataInputStream, Path, PositionedReadable, Seekable}

/**
 * A local-filesystem proxy registered under the scheme `countfs://` that
 * counts the BYTES actually requested by readers (plus opens/lists) — the
 * measurement harness behind the IVF-PQ scan-I/O claim: on a real object
 * store, bytes requested ≈ bytes billed and fetched, so the counter IS the
 * cold-storage cost model. The counter wraps OUTSIDE Hadoop's read-ahead
 * buffering, so it sees exactly what parquet asked for (footers, dictionary
 * pages, column chunks), not the buffer's speculative prefetch.
 *
 * Register with [[CountingFileSystem.register]] and address the same local
 * directory as `countfs:///abs/path` — no data is copied; the scheme only
 * routes reads through the counters. Used by `tools.PqBench` (the SCALE.md
 * byte table) and `PqBytesSpec` (the ≤ 1/8-bytes assertion).
 */
object CountingFileSystem {
  val bytesRead = new AtomicLong
  val opens = new AtomicLong
  val lists = new AtomicLong

  def reset(): Unit = { bytesRead.set(0); opens.set(0); lists.set(0) }

  def register(conf: org.apache.hadoop.conf.Configuration): Unit = {
    conf.set("fs.countfs.impl", classOf[CountingFileSystem].getName)
    // one FS instance per scheme is cached; nothing else to do
  }
}

class CountingFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "countfs"
  override def getUri: java.net.URI = java.net.URI.create("countfs:///")

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    CountingFileSystem.opens.incrementAndGet()
    new FSDataInputStream(new CountingStream(super.open(f, bufferSize)))
  }

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    CountingFileSystem.lists.incrementAndGet()
    super.listStatus(f)
  }
}

/** Byte-counting wrapper over the underlying stream: every read the CALLER
 *  issues adds to the global counter. Implements the two interfaces
 *  FSDataInputStream requires; deliberately NOT ByteBufferReadable, so
 *  parquet takes its byte-array read path (all of which is counted). */
private class CountingStream(in: FSDataInputStream)
    extends java.io.InputStream with Seekable with PositionedReadable {
  private def add(n: Int): Int = {
    if (n > 0) CountingFileSystem.bytesRead.addAndGet(n)
    n
  }
  override def read(): Int = {
    val b = in.read()
    if (b >= 0) CountingFileSystem.bytesRead.incrementAndGet()
    b
  }
  override def read(b: Array[Byte], off: Int, len: Int): Int =
    add(in.read(b, off, len))
  override def read(pos: Long, buf: Array[Byte], off: Int, len: Int): Int =
    add(in.read(pos, buf, off, len))
  override def readFully(pos: Long, buf: Array[Byte], off: Int, len: Int): Unit = {
    in.readFully(pos, buf, off, len)
    CountingFileSystem.bytesRead.addAndGet(len)
  }
  override def readFully(pos: Long, buf: Array[Byte]): Unit = {
    in.readFully(pos, buf)
    CountingFileSystem.bytesRead.addAndGet(buf.length)
  }
  override def seek(pos: Long): Unit = in.seek(pos)
  override def getPos: Long = in.getPos
  override def seekToNewSource(targetPos: Long): Boolean = in.seekToNewSource(targetPos)
  override def available(): Int = in.available()
  override def skip(n: Long): Long = in.skip(n)
  override def close(): Unit = in.close()
}
