package graft.zarr

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.GZIPInputStream

import com.github.luben.zstd.ZstdInputStreamNoFinalizer

import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

/**
 * Chunk decode pipeline for Zarr v3.
 *
 * Byte-stream codecs (zstd/gzip/crc32c) are undone last-to-first, then the
 * terminal array→bytes codec (`bytes` little/big-endian fixed width, or
 * `vlen-utf8`) materializes a [[ColumnChunk]].
 *
 * Wire formats re-derived from the public Zarr v3 codec specs; the vlen-utf8
 * encoding (per element: u32-LE byte length + UTF-8 bytes) matches what the
 * reference's fixture store contains (reference: data/zarr_store.zarr, decode
 * behavior observed via src/testing/load_into_arrow.rs:11-98).
 *
 * Values are produced directly as Catalyst internal values (UTF8String, Long
 * micros for timestamps, Decimal for uint64) so the DSv2 reader never pivots
 * through external row types.
 */
trait ColumnChunk { // implemented here and by the n-D assembler (ZarrNd)
  def length: Int
  /** Catalyst internal value of element i. */
  def get(i: Int): Any

  /**
   * Bulk-copy elements [srcPos, srcPos+n) into `vec` at [destPos, destPos+n).
   * Default: per-element dispatch on the Catalyst value (correct for every
   * chunk kind); fixed-width numeric chunks override with single
   * `put*LittleEndian` memcopies from the decoded chunk bytes — the hot path
   * of the columnar DSv2 reader.
   */
  def writeTo(vec: org.apache.spark.sql.execution.vectorized.WritableColumnVector,
      destPos: Int, srcPos: Int, n: Int): Unit = {
    var i = 0
    while (i < n) { ZarrCodecs.writeValue(vec, destPos + i, get(srcPos + i)); i += 1 }
  }

  /** Release any resource backing the chunk (the ranged shard path holds an
   *  open object stream). Readers call this when a chunk is replaced and
   *  when the reader closes; in-memory chunks are no-ops. */
  def close(): Unit = {}

  /** Elements [from, from+n) as one Catalyst array — the n-D row assembler's
   *  bulk path (a k-D row's innermost vectors are contiguous in the C-order
   *  chunk buffer). Default: boxed copy via `get`; fixed-width numeric
   *  chunks override with a primitive-array copy (UnsafeArrayData wraps a
   *  primitive array with zero boxing). */
  def sliceArray(from: Int, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = get(from + i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object ZarrCodecs {

  private type WCV = org.apache.spark.sql.execution.vectorized.WritableColumnVector

  /** Per-element vector write for the generic [[ColumnChunk.writeTo]] path:
   *  dispatch on the Catalyst internal value produced by `get`. */
  private[zarr] def writeValue(
      vec: org.apache.spark.sql.execution.vectorized.WritableColumnVector,
      row: Int, v: Any): Unit = v match {
    case null                => vec.putNull(row)
    case b: Boolean          => vec.putBoolean(row, b)
    case b: Byte             => vec.putByte(row, b)
    case s: Short            => vec.putShort(row, s)
    case i: Int              => vec.putInt(row, i)
    case l: Long             => vec.putLong(row, l)
    case f: Float            => vec.putFloat(row, f)
    case d: Double           => vec.putDouble(row, d)
    case s: UTF8String       => vec.putByteArray(row, s.getBytes)
    case d: Decimal          => vec.putDecimal(row, d, 20)
    case b: Array[Byte]      => vec.putByteArray(row, b)
    case other               =>
      throw new ZarrException(s"unsupported vector value ${other.getClass.getName}")
  }

  /** Sharded chunk objects at or below this size are fetched with ONE whole
   *  GET; above it the RANGED path reads the index + only the inner chunks
   *  actually accessed (`sharding_indexed` exists to permit exactly this on
   *  object stores), holding one decoded inner chunk at a time instead of
   *  the whole compressed shard (which for >2 GiB objects cannot even be a
   *  single JVM array). Overridable by tests. */
  @volatile private[graft] var rangedShardThresholdBytes: Long = 4L << 20

  /**
   * Fetch-and-decode chunk `ci` of `meta` from `store` — the partition
   * readers' entry point. Non-sharded chunks and small shards are one whole
   * object read; large shards go through the ranged path (1 stat + 1 open,
   * then positioned reads for the index and each ACCESSED inner chunk on
   * that single held stream — a LIMIT that stops after the first rows of a
   * gigabyte shard transfers kilobytes). Whether a shard is "large" is
   * first estimated from metadata alone (chunk length × element width), so
   * below-threshold shards keep the 1-GET/no-stat RPC profile.
   */
  def fetchChunk(store: graft.zarr.ZarrStore, meta: ZarrArrayMeta, ci: Long): ColumnChunk =
    if (meta.rank > 1) ZarrNd.fetchRowChunk(store, meta, ci)
    else meta.codecs match {
      case Seq(sc: ZarrCodec.ShardingCodec) =>
        val rel = meta.chunkPath(ci)
        val est = maxDecodedBytes(meta)
        if (est <= rangedShardThresholdBytes) {
          // small ESTIMATE: read the whole object in the usual single GET —
          // but bounded, because the estimate comes from metadata and the
          // object from the (possibly hostile) store: a multi-GiB object
          // under small-chunk metadata must not reach an unbounded
          // readAllBytes. The bound is generous for every legitimate
          // layout (compressed data ≤ raw + per-inner-chunk framing, plus
          // the index); an object past it falls back to the ranged path,
          // which transfers only what the index says to.
          val innerLen = math.max(1L, sc.innerChunk)
          val nInner = (meta.chunkLength + innerLen - 1) / innerLen
          val plausible = est + nInner * 144L + 4096L
          val raw = store.readBytesIfExistsUpTo(rel, plausible)
          if (!(raw.asInstanceOf[AnyRef] eq graft.zarr.ZarrStore.TooLarge))
            return decodeChunk(raw, meta)
        }
        val totalLen = store.objectLengthIfExists(rel)
        if (totalLen < 0) decodeChunk(null, meta) // vanished → fill (as whole-read does)
        else if (totalLen <= rangedShardThresholdBytes)
          decodeChunk(store.readBytesIfExists(rel), meta) // small after all: 1 GET
        else {
          val in = store.openStream(rel)
          def readRange(off: Long, len: Int): Array[Byte] = {
            val buf = new Array[Byte](len)
            try in.readFully(off, buf, 0, len)
            catch { case e: java.io.IOException =>
              throw new ZarrException(
                s"range read [$off, +$len) failed at ${meta.path}", e) }
            buf
          }
          try shardChunk(totalLen, readRange, meta, sc, memoAll = false,
            closer = () => in.close())
          catch { case t: Throwable => in.close(); throw t }
        }
      case _ => decodeChunk(store.readBytesIfExists(meta.chunkPath(ci)), meta)
    }

  /** Decode one stored chunk (or synthesize a fill-value chunk if bytes==null). */
  def decodeChunk(raw: Array[Byte], meta: ZarrArrayMeta): ColumnChunk = {
    val chunkLen = meta.chunkLength.toInt
    if (raw == null) return fillChunk(meta, chunkLen)
    meta.codecs match {
      case (sc: ZarrCodec.ShardingCodec) +: rest =>
        if (rest.nonEmpty)
          throw new ZarrException(
            s"sharding_indexed must be the only top-level codec at ${meta.path}")
        return decodeShard(raw, meta, sc)
      case _ =>
    }
    var bytes = raw
    // decoded-size bound for the stream decompressors: chunk framing is
    // attacker-controlled on foreign stores, and a kilobyte-scale bomb
    // would otherwise expand until the executor OOMs
    val cap = maxDecodedBytes(meta)
    // undo byte-stream codecs, innermost-last
    meta.codecs.reverse.foreach {
      case ZarrCodec.ZstdCodec(_, _) => bytes = zstdDecompress(bytes, cap, meta.path)
      case ZarrCodec.GzipCodec(_)    => bytes = gzipDecompress(bytes, cap, meta.path)
      case ZarrCodec.ZlibCodec       => bytes = zlibDecompress(bytes, cap, meta.path)
      case ZarrCodec.Crc32cCodec     => bytes = stripCrc32c(bytes, meta.path)
      case _: ZarrCodec.BloscCodec   => bytes = Blosc.decode(bytes, meta.path, cap)
      case ZarrCodec.Lz4Codec        => bytes = lz4Decompress(bytes, cap, meta.path)
      case ZarrCodec.Bz2Codec        => bytes = bz2Decompress(bytes, cap, meta.path)
      case ZarrCodec.XzCodec         => bytes = xzDecompress(bytes, cap, meta.path)
      case ZarrCodec.PackBitsCodec   => bytes = packBitsDecode(bytes, meta.path)
      case ZarrCodec.ShuffleCodec(es) =>
        if (es > 1) bytes = Blosc.unshuffleBuffer(es, bytes)
      case ZarrCodec.DeltaCodec(w, le, fl) =>
        bytes = deltaDecode(bytes, w, le, fl, meta.path)
      case ZarrCodec.BytesCodec(_) | ZarrCodec.VlenUtf8Codec |
           ZarrCodec.VlenBytesCodec |
           _: ZarrCodec.FixedUnicodeCodec => // terminal, handled below
      case _: ZarrCodec.ShardingCodec =>
        throw new ZarrException(s"nested sharding_indexed not supported at ${meta.path}")
    }
    val littleEndian = meta.codecs.collectFirst { case ZarrCodec.BytesCodec(le) => le }.getOrElse(true)
    meta.dtype match {
      case ZarrType.ZString =>
        meta.codecs.collectFirst { case u: ZarrCodec.FixedUnicodeCodec => u } match {
          case Some(u) => decodeFixedUnicode(bytes, u.units, chunkLen,
            u.littleEndian, meta.path)
          case None    => decodeVlen(bytes, chunkLen, meta.path, utf8 = true)
        }
      case ZarrType.ZBytes  => decodeVlen(bytes, chunkLen, meta.path, utf8 = false)
      case dt               => decodeFixed(bytes, dt, chunkLen, littleEndian)
    }
  }

  /**
   * `sharding_indexed` shard decode: parse the (offset, nbytes) u64-LE index
   * (verified+stripped through `index_codecs`), then decode inner chunks
   * LAZILY and memoized — a task whose row range touches part of a shard
   * never decodes the rest; missing inner chunks ((2^64-1, 2^64-1)) read as
   * fill values, like missing chunk objects.
   */
  private def decodeShard(raw: Array[Byte], meta: ZarrArrayMeta,
      sc: ZarrCodec.ShardingCodec): ColumnChunk =
    shardChunk(raw.length,
      (off, len) => java.util.Arrays.copyOfRange(raw, off.toInt, off.toInt + len),
      meta, sc, memoAll = true)

  /**
   * Generalized shard decode over a range-read function: `readRange(off,
   * len)` returns exactly that byte range of the shard object. Backs both
   * the in-memory path (`readRange` = array slice, all inner chunks
   * memoized) and the RANGED object-store path (`readRange` = positioned
   * read, single-slot memo so a task holds ONE decoded inner chunk — not
   * the whole shard — regardless of shard size; row access is sequential,
   * so the slot almost never refetches).
   */
  private def shardChunk(totalLen: Long, readRange: (Long, Int) => Array[Byte],
      meta: ZarrArrayMeta, sc: ZarrCodec.ShardingCodec,
      memoAll: Boolean, closer: () => Unit = () => ()): ColumnChunk = {
    val shardLen = meta.chunkLength.toInt
    val innerLen = sc.innerChunk.toInt
    require(innerLen > 0, s"bad inner chunk shape at ${meta.path}")
    val nInner = (shardLen + innerLen - 1) / innerLen
    val idxSize = nInner * 16 +
      (if (sc.indexCodecs.contains(ZarrCodec.Crc32cCodec)) 4 else 0)
    if (totalLen < idxSize)
      throw new ZarrException(s"shard at ${meta.path} shorter than its index ($idxSize bytes)")
    var idx = readRange(if (sc.indexAtEnd) totalLen - idxSize else 0L, idxSize)
    sc.indexCodecs.reverse.foreach {
      case ZarrCodec.Crc32cCodec => idx = stripCrc32c(idx, meta.path + " shard index")
      case ZarrCodec.BytesCodec(le) =>
        if (!le) throw new ZarrException(s"big-endian shard index not supported at ${meta.path}")
      case other =>
        throw new ZarrException(s"unsupported shard index codec $other at ${meta.path}")
    }
    val bb = ByteBuffer.wrap(idx).order(ByteOrder.LITTLE_ENDIAN)
    val innerMeta = meta.copy(chunkLength = innerLen, codecs = sc.innerCodecs)
    def decodeInner(i: Int): ColumnChunk = {
      val off = bb.getLong(i * 16)
      val len = bb.getLong(i * 16 + 8)
      if (off == -1L && len == -1L) decodeChunk(null, innerMeta) // missing → fill
      // subtraction form: `off + len` can wrap negative for hostile
      // offsets near Long.MaxValue and slip past an addition check;
      // inner chunks above 2 GiB can't be materialized as one array
      else if (off < 0 || len < 0 || len > totalLen - off || len > Int.MaxValue)
        throw new ZarrException(s"shard index entry $i out of bounds at ${meta.path}")
      else decodeChunk(readRange(off, len.toInt), innerMeta)
    }
    val decoded = if (memoAll) new Array[ColumnChunk](nInner) else null
    var slotIdx = -1
    var slot: ColumnChunk = null
    def innerChunk(i: Int): ColumnChunk =
      if (memoAll) {
        if (decoded(i) == null) decoded(i) = decodeInner(i)
        decoded(i)
      } else {
        if (i != slotIdx) { slot = decodeInner(i); slotIdx = i }
        slot
      }
    new ColumnChunk {
      val length = shardLen
      def get(i: Int): Any = innerChunk(i / innerLen).get(i % innerLen)
      // delegate to inner-chunk bulk copies (still lazy: untouched inner
      // chunks of the shard stay undecoded)
      override def writeTo(vec: WCV, destPos: Int, srcPos: Int, cnt: Int): Unit = {
        var written = 0
        while (written < cnt) {
          val s = srcPos + written
          val within = s % innerLen
          val take = math.min(cnt - written, innerLen - within)
          innerChunk(s / innerLen).writeTo(vec, destPos + written, within, take)
          written += take
        }
      }
      override def close(): Unit = closer()
    }
  }

  /** Max legitimate decoded size of one chunk, from metadata alone: the
   *  fixed element width times the chunk length (with slack for packbits
   *  framing), or a 1 GiB backstop when the dtype is variable-length and
   *  the metadata carries no bound. */
  private def maxDecodedBytes(meta: ZarrArrayMeta): Long = {
    val width: Option[Long] = meta.codecs
      .collectFirst { case ZarrCodec.FixedUnicodeCodec(u, _) => 4L * u }
      .orElse(if (meta.dtype.byteSize > 0) Some(meta.dtype.byteSize.toLong) else None)
    width match {
      case Some(w) => meta.chunkLength * w + 64
      case None    => 1L << 30
    }
  }

  /** Drain a decompression stream, failing typed past `cap` bytes. */
  private def readBounded(in: java.io.InputStream, cap: Long, what: String,
      path: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(8192)
    val buf = new Array[Byte](8192)
    var total = 0L
    var n = in.read(buf)
    while (n >= 0) {
      total += n
      if (total > cap)
        throw new ZarrException(
          s"$what chunk decodes past its $cap-byte metadata bound at $path")
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }

  private def zstdDecompress(bytes: Array[Byte], cap: Long, path: String): Array[Byte] = {
    val in = new ZstdInputStreamNoFinalizer(new ByteArrayInputStream(bytes))
    try readBounded(in, cap, "zstd", path) finally in.close()
  }

  private def gzipDecompress(bytes: Array[Byte], cap: Long, path: String): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    try readBounded(in, cap, "gzip", path) finally in.close()
  }

  /** numcodecs `zlib` (Zarr v2): RFC-1950 stream via JDK Inflater. */
  private def zlibDecompress(bytes: Array[Byte], cap: Long, path: String): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(bytes)
      // clamp BEFORE toInt: cap can exceed Int.MaxValue (vlen backstop),
      // and a >512 MiB input would wrap bytes.length*4 negative
      val out = new java.io.ByteArrayOutputStream(
        math.max(64L, math.min(math.min(cap, Int.MaxValue.toLong), bytes.length * 4L)).toInt)
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        // needsDictionary: FDICT-flagged stream — inflate() returns 0 with
        // needsInput()==false forever, so without this check a hostile
        // chunk spins the reader task instead of throwing
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          throw new ZarrException(s"truncated or preset-dictionary zlib chunk at $path")
        total += n
        if (total > cap)
          throw new ZarrException(
            s"zlib chunk decodes past its $cap-byte metadata bound at $path")
        out.write(buf, 0, n)
      }
      out.toByteArray
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new ZarrException(s"corrupt zlib chunk at $path", e)
    } finally inf.end()
  }

  /** numcodecs `bz2` (Zarr v2): a standard bzip2 stream. */
  private def bz2Decompress(bytes: Array[Byte], cap: Long, path: String): Array[Byte] = {
    // the constructor itself rejects bad magic with IOException
    val in =
      try new org.apache.commons.compress.compressors.bzip2
        .BZip2CompressorInputStream(new ByteArrayInputStream(bytes))
      catch { case e: java.io.IOException =>
        throw new ZarrException(s"corrupt bz2 chunk at $path", e) }
    try readBounded(in, cap, "bz2", path)
    catch { case e: java.io.IOException =>
      throw new ZarrException(s"corrupt bz2 chunk at $path", e) }
    finally in.close()
  }

  /** numcodecs `lzma` with FORMAT_XZ: one .xz stream (xz-java via
   *  commons-compress, both on Spark's standard classpath). */
  private def xzDecompress(bytes: Array[Byte], cap: Long, path: String): Array[Byte] = {
    val in =
      try new org.apache.commons.compress.compressors.xz
        .XZCompressorInputStream(new ByteArrayInputStream(bytes))
      catch { case e: java.io.IOException =>
        throw new ZarrException(s"corrupt xz chunk at $path", e) }
    try readBounded(in, cap, "xz", path)
    catch { case e: java.io.IOException =>
      throw new ZarrException(s"corrupt xz chunk at $path", e) }
    finally in.close()
  }

  /** Undo a numcodecs `packbits` filter: header byte = leftover bits in
   *  the final packed byte (0 = it is full), then MSB-first packed bits;
   *  output is the bool chunk's 0/1 byte buffer. */
  private def packBitsDecode(bytes: Array[Byte], path: String): Array[Byte] = {
    if (bytes.length < 1)
      throw new ZarrException(s"packbits chunk missing its header byte at $path")
    val leftover = bytes(0) & 0xFF
    if (leftover > 7)
      throw new ZarrException(s"packbits header claims $leftover leftover bits at $path")
    val packed = bytes.length - 1
    if (leftover > 0 && packed == 0)
      throw new ZarrException(s"packbits leftover bits without a packed byte at $path")
    val n = if (leftover == 0) packed * 8 else (packed - 1) * 8 + leftover
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = ((bytes(1 + (i >> 3)) >> (7 - (i & 7))) & 1).toByte
      i += 1
    }
    out
  }

  /** numcodecs `lz4` (Zarr v2): u32-LE original size, then one raw LZ4
   *  block. The header is attacker-controlled on foreign stores, so the
   *  claimed size is bounded before any allocation. */
  private def lz4Decompress(bytes: Array[Byte], cap: Long, path: String): Array[Byte] = {
    if (bytes.length < 4)
      throw new ZarrException(s"lz4 chunk shorter than its size header at $path")
    val dstLen = ByteBuffer.wrap(bytes, 0, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    // LZ4 blocks expand at most ~255x, and the chunk can't legitimately
    // decode past its metadata-derived size — reject either violation
    // instead of allocating gigabytes
    if (dstLen < 0 || dstLen > math.min(cap, math.max(64L, (bytes.length - 4) * 255L)))
      throw new ZarrException(s"lz4 chunk claims $dstLen decoded bytes at $path")
    val dst = new Array[Byte](dstLen)
    val n =
      try net.jpountz.lz4.LZ4Factory.fastestInstance().safeDecompressor()
        .decompress(bytes, 4, bytes.length - 4, dst, 0, dstLen)
      catch { case e: net.jpountz.lz4.LZ4Exception =>
        throw new ZarrException(s"corrupt lz4 chunk at $path", e) }
    if (n != dstLen)
      throw new ZarrException(s"lz4 chunk decoded $n of $dstLen bytes at $path")
    dst
  }

  /** Undo a numcodecs `delta` filter: running prefix sum over the
   *  fixed-width buffer in the filter dtype's arithmetic (ints wrap exactly
   *  like the numpy encode side, so the round trip is lossless). */
  private def deltaDecode(bytes: Array[Byte], width: Int, littleEndian: Boolean,
      float: Boolean, path: String): Array[Byte] = {
    if (bytes.length % width != 0)
      throw new ZarrException(
        s"delta buffer of ${bytes.length} bytes is not a multiple of $width at $path")
    val out = bytes.clone()
    val n = out.length / width
    if (n <= 1) return out
    val bb = ByteBuffer.wrap(out)
      .order(if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    var i = 1
    (width, float) match {
      case (1, false) => while (i < n) { out(i) = (out(i) + out(i - 1)).toByte; i += 1 }
      case (2, false) => while (i < n) { bb.putShort(i * 2,
        (bb.getShort(i * 2) + bb.getShort((i - 1) * 2)).toShort); i += 1 }
      case (4, false) => while (i < n) { bb.putInt(i * 4,
        bb.getInt(i * 4) + bb.getInt((i - 1) * 4)); i += 1 }
      case (8, false) => while (i < n) { bb.putLong(i * 8,
        bb.getLong(i * 8) + bb.getLong((i - 1) * 8)); i += 1 }
      case (4, true)  => while (i < n) { bb.putFloat(i * 4,
        bb.getFloat(i * 4) + bb.getFloat((i - 1) * 4)); i += 1 }
      case (8, true)  => while (i < n) { bb.putDouble(i * 8,
        bb.getDouble(i * 8) + bb.getDouble((i - 1) * 8)); i += 1 }
      case other => throw new ZarrException(s"delta width $other at $path")
    }
    out
  }

  /** numpy fixed-width unicode (`<U5`): `units` UTF-32 code units per
   *  element, trailing NULs trimmed — zarr-python's default encoding for
   *  numpy string arrays written without an object-dtype filter. */
  private def decodeFixedUnicode(bytes: Array[Byte], units: Int, n: Int,
      littleEndian: Boolean, path: String): ColumnChunk = {
    val need = n.toLong * units * 4
    if (bytes.length < need)
      throw new ZarrException(
        s"fixed-unicode chunk has ${bytes.length} bytes, needs $need at $path")
    val bb = ByteBuffer.wrap(bytes)
      .order(if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val decoded = new Array[UTF8String](n)
    val sb = new java.lang.StringBuilder(units)
    var e = 0
    while (e < n) {
      sb.setLength(0)
      var last = -1 // index of last non-NUL unit: NULs are padding only at the tail
      var u = 0
      while (u < units) {
        if (bb.getInt((e * units + u) * 4) != 0) last = u
        u += 1
      }
      u = 0
      while (u <= last) {
        val cp = bb.getInt((e * units + u) * 4)
        if (cp < 0 || cp > Character.MAX_CODE_POINT ||
            (cp >= Character.MIN_SURROGATE && cp <= Character.MAX_SURROGATE))
          throw new ZarrException(
            s"fixed-unicode chunk has invalid code point $cp at $path")
        sb.appendCodePoint(cp)
        u += 1
      }
      decoded(e) = UTF8String.fromString(sb.toString)
      e += 1
    }
    new ColumnChunk {
      val length = n
      def get(i: Int): Any = decoded(i)
      override def writeTo(vec: WCV, destPos: Int, srcPos: Int, cnt: Int): Unit = {
        var i = 0
        while (i < cnt) {
          vec.putByteArray(destPos + i, decoded(srcPos + i).getBytes)
          i += 1
        }
      }
    }
  }

  private def stripCrc32c(bytes: Array[Byte], path: String): Array[Byte] = {
    if (bytes.length < 4) throw new ZarrException(s"crc32c chunk too short at $path")
    val body = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 4)
    val crc = new java.util.zip.CRC32C()
    crc.update(body)
    val stored = ByteBuffer.wrap(bytes, bytes.length - 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    if (stored != crc.getValue.toInt)
      throw new ZarrException(s"crc32c mismatch at $path")
    body
  }

  /**
   * vlen-utf8: per element a u32-LE byte length followed by that many UTF-8
   * bytes. Two framings exist in the wild: numcodecs' VLenUTF8 (what
   * zarr-python writes, and what the reference's committed store contains)
   * prefixes a u32-LE ELEMENT COUNT; a bare concatenation has no header.
   * We detect the header by value and by strict whole-buffer consumption —
   * decoding the reference store headerless underflows (caught by
   * ZarrSourceSpec's golden-byte tests).
   */
  private def decodeVlen(bytes: Array[Byte], n: Int, path: String,
      utf8: Boolean): ColumnChunk = {
    // parse to (offset, length) views into the decompressed buffer — both
    // readers then pay exactly one copy: the row path wraps (UTF8String
    // .fromBytes slices without copying), the columnar path putByteArray's
    // straight from the buffer into the vector
    val offs = new Array[Int](n)
    val lens = new Array[Int](n)
    def tryParse(offset: Int): Boolean = {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      buf.position(offset)
      var i = 0
      while (i < n) {
        if (buf.remaining() < 4) return false
        val len = buf.getInt
        if (len < 0 || buf.remaining() < len) return false
        offs(i) = buf.position()
        lens(i) = len
        buf.position(buf.position() + len)
        i += 1
      }
      !buf.hasRemaining // must consume exactly
    }
    val headerLooksRight = bytes.length >= 4 &&
      ByteBuffer.wrap(bytes, 0, 4).order(ByteOrder.LITTLE_ENDIAN).getInt == n
    val ok = (headerLooksRight && tryParse(4)) || tryParse(0)
    if (!ok)
      throw new ZarrException(s"vlen-utf8 chunk does not parse as $n elements at $path")
    new ColumnChunk {
      val length = n
      def get(i: Int): Any =
        if (utf8) UTF8String.fromBytes(bytes, offs(i), lens(i))
        else java.util.Arrays.copyOfRange(bytes, offs(i), offs(i) + lens(i))
      override def writeTo(vec: WCV, destPos: Int, srcPos: Int, cnt: Int): Unit = {
        var i = 0
        while (i < cnt) {
          vec.putByteArray(destPos + i, bytes, offs(srcPos + i), lens(srcPos + i))
          i += 1
        }
      }
    }
  }

  private def decodeFixed(bytes: Array[Byte], dt: ZarrType, n: Int, littleEndian: Boolean): ColumnChunk = {
    // the columnar fast paths below bulk-copy via Unsafe (put*LittleEndian)
    // with NO bounds check — a short decoded chunk (truncated object,
    // partial upload) would read past the array and emit adjacent-heap
    // garbage as column values; fail typed instead
    if (bytes.length < n.toLong * dt.byteSize)
      throw new ZarrException(
        s"fixed-width chunk too short: ${bytes.length} bytes for $n × $dt " +
          s"(${n.toLong * dt.byteSize} expected)")
    val order = if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val buf = ByteBuffer.wrap(bytes).order(order)
    import ZarrType._
    dt match {
      case ZBool =>
        chunk(n)(i => bytes(i) != 0)
      case ZInt8 =>
        new ColumnChunk {
          val length = n
          def get(i: Int): Any = bytes(i)
          override def writeTo(vec: WCV, destPos: Int, srcPos: Int, cnt: Int): Unit =
            vec.putBytes(destPos, cnt, bytes, srcPos)
          override def sliceArray(from: Int, cnt: Int) =
            org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
              java.util.Arrays.copyOfRange(bytes, from, from + cnt))
        }
      case ZInt16 =>
        new ColumnChunk {
          val length = n
          def get(i: Int): Any = buf.getShort(i * 2)
          override def sliceArray(from: Int, cnt: Int) = {
            val out = new Array[Short](cnt)
            var i = 0
            while (i < cnt) { out(i) = buf.getShort((from + i) * 2); i += 1 }
            org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
          }
        }
      case ZInt32 =>
        new ColumnChunk {
          val length = n
          def get(i: Int): Any = buf.getInt(i * 4)
          override def writeTo(vec: WCV, destPos: Int, srcPos: Int, cnt: Int): Unit =
            if (littleEndian) vec.putIntsLittleEndian(destPos, cnt, bytes, srcPos * 4)
            else super.writeTo(vec, destPos, srcPos, cnt)
          override def sliceArray(from: Int, cnt: Int) = {
            val out = new Array[Int](cnt)
            var i = 0
            while (i < cnt) { out(i) = buf.getInt((from + i) * 4); i += 1 }
            org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
          }
        }
      case ZInt64 =>
        new ColumnChunk {
          val length = n
          def get(i: Int): Any = buf.getLong(i * 8)
          override def writeTo(vec: WCV, destPos: Int, srcPos: Int, cnt: Int): Unit =
            if (littleEndian) vec.putLongsLittleEndian(destPos, cnt, bytes, srcPos * 8)
            else super.writeTo(vec, destPos, srcPos, cnt)
          override def sliceArray(from: Int, cnt: Int) = {
            val out = new Array[Long](cnt)
            var i = 0
            while (i < cnt) { out(i) = buf.getLong((from + i) * 8); i += 1 }
            org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
          }
        }
      case ZUInt8 =>
        chunk(n)(i => (bytes(i) & 0xff).toShort) // widened: Spark has no unsigned
      case ZUInt16 =>
        chunk(n)(i => buf.getShort(i * 2) & 0xffff)
      case ZUInt32 =>
        chunk(n)(i => buf.getInt(i * 4) & 0xffffffffL)
      case ZUInt64 =>
        chunk(n) { i =>
          val v = buf.getLong(i * 8)
          if (v >= 0) Decimal(v) else Decimal(new java.math.BigDecimal(java.lang.Long.toUnsignedString(v)))
        }
      case ZFloat16 =>
        chunk(n)(i => halfToFloat(buf.getShort(i * 2)))
      case ZFloat32 =>
        new ColumnChunk {
          val length = n
          def get(i: Int): Any = buf.getFloat(i * 4)
          override def writeTo(vec: WCV, destPos: Int, srcPos: Int, cnt: Int): Unit =
            if (littleEndian) vec.putFloatsLittleEndian(destPos, cnt, bytes, srcPos * 4)
            else super.writeTo(vec, destPos, srcPos, cnt)
          override def sliceArray(from: Int, cnt: Int) = {
            val out = new Array[Float](cnt)
            var i = 0
            while (i < cnt) { out(i) = buf.getFloat((from + i) * 4); i += 1 }
            org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
          }
        }
      case ZFloat64 =>
        new ColumnChunk {
          val length = n
          def get(i: Int): Any = buf.getDouble(i * 8)
          override def writeTo(vec: WCV, destPos: Int, srcPos: Int, cnt: Int): Unit =
            if (littleEndian) vec.putDoublesLittleEndian(destPos, cnt, bytes, srcPos * 8)
            else super.writeTo(vec, destPos, srcPos, cnt)
          override def sliceArray(from: Int, cnt: Int) = {
            val out = new Array[Double](cnt)
            var i = 0
            while (i < cnt) { out(i) = buf.getDouble((from + i) * 8); i += 1 }
            org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
          }
        }
      case ZDatetime64(unit, scale) =>
        // i64.MIN is numpy's NaT sentinel: detected BEFORE unit scaling
        // (multiplying it overflows to a garbage-but-valid timestamp) and
        // surfaced as null — datetime fields are nullable for this reason.
        val toMicros: Long => Long = unit match {
          case "s"  => v => v * 1000000L
          case "ms" => v => v * 1000L
          case "us" => v => v
          case "ns" => v => Math.floorDiv(v, 1000L)
        }
        chunk(n) { i =>
          val v = buf.getLong(i * 8)
          if (v == Long.MinValue) null else toMicros(v * scale)
        }
      case ZRaw(bits) =>
        val w = bits / 8
        chunk(n) { i =>
          java.util.Arrays.copyOfRange(bytes, i * w, i * w + w)
        }
      case ZString =>
        throw new ZarrException("string dtype requires vlen-utf8 codec")
      case ZBytes =>
        throw new ZarrException("bytes dtype requires vlen-bytes codec")
    }
  }

  private def chunk(n: Int)(f: Int => Any): ColumnChunk = new ColumnChunk {
    val length = n
    def get(i: Int): Any = f(i)
  }

  /** IEEE-754 half → float (JDK 17 lacks Float.float16ToFloat). */
  def halfToFloat(h: Short): Float = {
    val bits = h & 0xffff
    val sign = (bits >>> 15) & 1
    val exp = (bits >>> 10) & 0x1f
    val frac = bits & 0x3ff
    val f =
      if (exp == 0) {
        // subnormal or zero
        (frac / 1024.0f) * math.pow(2, -14).toFloat
      } else if (exp == 0x1f) {
        if (frac == 0) Float.PositiveInfinity else Float.NaN
      } else {
        (1.0f + frac / 1024.0f) * math.pow(2, exp - 15).toFloat
      }
    if (sign == 1) -f else f
  }

  /**
   * Float fill per the v3 spec's JSON encodings: a plain number, the strings
   * "NaN" / "Infinity" / "-Infinity" (what zarr-python writes for non-finite
   * fills), or a bit-exact "0x…" hex string whose width matches the dtype
   * (8 hex digits for float32, 16 for float64, 4 for float16).
   */
  private def floatFill(node: com.fasterxml.jackson.databind.JsonNode,
      bits: Int): Double = {
    if (!node.isTextual) return node.asDouble(0.0)
    node.asText() match {
      case "NaN"       => Double.NaN
      case "Infinity"  => Double.PositiveInfinity
      case "-Infinity" => Double.NegativeInfinity
      case s if s.startsWith("0x") && s.length == 2 + bits / 4 =>
        bits match {
          case 16 => halfToFloat(java.lang.Integer.parseInt(s.substring(2), 16).toShort).toDouble
          case 32 => java.lang.Float.intBitsToFloat(
            java.lang.Integer.parseUnsignedInt(s.substring(2), 16)).toDouble
          case _  => java.lang.Double.longBitsToDouble(
            java.lang.Long.parseUnsignedLong(s.substring(2), 16))
        }
      case other =>
        throw new ZarrException(s"unsupported float fill_value '$other'")
    }
  }

  /** Chunk of repeated fill value, for absent chunk objects. */
  private def fillChunk(meta: ZarrArrayMeta, n: Int): ColumnChunk = {
    val node = ZarrMeta.parseJson(meta.fillValueJson)
    import ZarrType._
    val v: Any = meta.dtype match {
      case ZBool             => node.asBoolean(false)
      case ZInt8             => node.asInt(0).toByte
      case ZInt16            => node.asInt(0).toShort
      case ZInt32            => node.asInt(0)
      case ZInt64            => node.asLong(0L)
      case ZUInt8            => node.asInt(0).toShort
      case ZUInt16           => node.asInt(0)
      case ZUInt32           => node.asLong(0L)
      case ZUInt64           => Decimal(new java.math.BigDecimal(node.asText("0")))
      case ZFloat16          => floatFill(node, 16).toFloat
      case ZFloat32          => floatFill(node, 32).toFloat
      case ZFloat64          => floatFill(node, 64)
      case ZDatetime64(u, s) =>
        val fv = node.asLong(0L)
        if (fv == Long.MinValue) null // NaT fill → null rows
        else {
          val raw = fv * s
          u match {
            case "s" => raw * 1000000L; case "ms" => raw * 1000L
            case "us" => raw; case "ns" => Math.floorDiv(raw, 1000L)
          }
        }
      case ZString           => UTF8String.fromString(node.asText(""))
      case ZBytes            => Array.emptyByteArray
      case ZRaw(bits)        => new Array[Byte](bits / 8)
    }
    new ColumnChunk {
      val length = n
      def get(i: Int): Any = v
      override def writeTo(vec: WCV, destPos: Int, srcPos: Int, cnt: Int): Unit = v match {
        case null       => vec.putNulls(destPos, cnt)
        case b: Boolean => vec.putBooleans(destPos, cnt, b)
        case b: Byte    => vec.putBytes(destPos, cnt, b)
        case s: Short   => vec.putShorts(destPos, cnt, s)
        case i: Int     => vec.putInts(destPos, cnt, i)
        case l: Long    => vec.putLongs(destPos, cnt, l)
        case f: Float   => vec.putFloats(destPos, cnt, f)
        case d: Double  => vec.putDoubles(destPos, cnt, d)
        case _          => super.writeTo(vec, destPos, srcPos, cnt)
      }
    }
  }
}
