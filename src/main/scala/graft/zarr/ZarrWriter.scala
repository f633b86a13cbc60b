package graft.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import com.github.luben.zstd.Zstd

/**
 * Minimal local-filesystem Zarr v3 store writer.
 *
 * Only used to materialize test fixtures (notably a store equivalent to the
 * reference's committed `data/zarr_store.zarr`: a `/meta` group with 1-D
 * `collection`/`date`/`bbox` arrays, `bytes`+`zstd` for numerics and
 * `vlen-utf8`+`zstd` for strings — spec per /root/repo/FIXTURES.md §1,
 * reference: scripts/generate_data.py:1-36). Round-trips through
 * [[ZarrCodecs]] are asserted in the test suite.
 */
object ZarrWriter {

  private def writeJson(p: Path, text: String): Unit = {
    Files.createDirectories(p.getParent)
    // atomic publish: a plain truncate-then-write lets a concurrent reader
    // (e.g. the micro-batch stream polling zarr.json for growth) observe a
    // partial document — write aside, then rename into place. Object stores
    // give this for free (atomic PUT); local filesystems need the rename.
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp, text.getBytes(StandardCharsets.UTF_8))
    try Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def writeGroup(root: String, group: String): Unit = {
    val g = group.stripPrefix("/").stripSuffix("/")
    val doc = """{"attributes":{},"zarr_format":3,"node_type":"group"}"""
    writeJson(Paths.get(root, "zarr.json"), doc)
    if (g.nonEmpty) {
      var acc = Paths.get(root)
      g.split("/").foreach { seg =>
        acc = acc.resolve(seg)
        writeJson(acc.resolve("zarr.json"), doc)
      }
    }
  }

  private def zstdCompress(b: Array[Byte], level: Int): Array[Byte] =
    Zstd.compress(b, level)

  /** Write a 1-D string array with codecs vlen-utf8 → zstd(level 0). */
  def writeStringArray(root: String, group: String, name: String,
      values: Seq[String], chunkLen: Int): Unit = {
    val g = group.stripPrefix("/").stripSuffix("/")
    val dir = Paths.get(root, g, name)
    val metaJson =
      s"""{"shape":[${values.length}],"data_type":"string",
         |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[$chunkLen]}},
         |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
         |"fill_value":"",
         |"codecs":[{"name":"vlen-utf8","configuration":{}},
         |          {"name":"zstd","configuration":{"level":0,"checksum":false}}],
         |"attributes":{},"zarr_format":3,"node_type":"array","storage_transformers":[]}"""
        .stripMargin
    writeJson(dir.resolve("zarr.json"), metaJson)
    values.grouped(chunkLen).zipWithIndex.foreach { case (chunkVals, ci) =>
      // pad the trailing partial chunk with the fill value ""
      val padded = chunkVals.padTo(chunkLen, "")
      val encoded = padded.map { s =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        val buf = ByteBuffer.allocate(4 + b.length).order(ByteOrder.LITTLE_ENDIAN)
        buf.putInt(b.length).put(b).array()
      }
      // numcodecs VLenUTF8 framing (what zarr-python writes): u32-LE element
      // count header, then per-element length+bytes
      val header = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(chunkLen).array()
      val joined = encoded.foldLeft(header)(_ ++ _)
      val chunkPath = dir.resolve("c").resolve(ci.toString)
      Files.createDirectories(chunkPath.getParent)
      Files.write(chunkPath, zstdCompress(joined, 0))
    }
  }

  /** Write a 1-D int64-backed array (int64 or datetime64[unit]). */
  def writeLongArray(root: String, group: String, name: String,
      values: Seq[Long], chunkLen: Int,
      datetimeUnit: Option[String] = None, fillValue: Long = 0L): Unit = {
    val g = group.stripPrefix("/").stripSuffix("/")
    val dir = Paths.get(root, g, name)
    val dtypeJson = datetimeUnit match {
      case Some(u) => s"""{"name":"numpy.datetime64","configuration":{"unit":"$u","scale_factor":1}}"""
      case None    => "\"int64\""
    }
    val metaJson =
      s"""{"shape":[${values.length}],"data_type":$dtypeJson,
         |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[$chunkLen]}},
         |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
         |"fill_value":$fillValue,
         |"codecs":[{"name":"bytes","configuration":{"endian":"little"}},
         |          {"name":"zstd","configuration":{"level":0,"checksum":false}}],
         |"attributes":{},"zarr_format":3,"node_type":"array","storage_transformers":[]}"""
        .stripMargin
    writeJson(dir.resolve("zarr.json"), metaJson)
    values.grouped(chunkLen).zipWithIndex.foreach { case (chunkVals, ci) =>
      val padded = chunkVals.padTo(chunkLen, fillValue)
      val buf = ByteBuffer.allocate(8 * chunkLen).order(ByteOrder.LITTLE_ENDIAN)
      padded.foreach(buf.putLong)
      val chunkPath = dir.resolve("c").resolve(ci.toString)
      Files.createDirectories(chunkPath.getParent)
      Files.write(chunkPath, zstdCompress(buf.array(), 0))
    }
  }

  /**
   * Write a 1-D int64 array as `sharding_indexed` shards (Zarr v3 sharding
   * spec, constructed byte-by-byte — this helper doubles as the format's
   * executable documentation). Each stored object = concatenated
   * zstd(LE-int64) inner chunks, then the index: per inner chunk
   * (offset: u64 LE, nbytes: u64 LE) from the object's start, missing =
   * (2^64-1, 2^64-1); index body + its crc32c at the END of the object.
   * `missingInner` lists GLOBAL inner-chunk ids to omit (read as fill).
   */
  def writeShardedLongArray(root: String, group: String, name: String,
      values: Seq[Long], shardLen: Int, innerLen: Int,
      missingInner: Set[Int] = Set.empty, fillValue: Long = 0L): Unit = {
    val g = group.stripPrefix("/").stripSuffix("/")
    val dir = Paths.get(root, g, name)
    val metaJson =
      s"""{"shape":[${values.length}],"data_type":"int64",
         |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[$shardLen]}},
         |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
         |"fill_value":$fillValue,
         |"codecs":[{"name":"sharding_indexed","configuration":{
         |  "chunk_shape":[$innerLen],
         |  "codecs":[{"name":"bytes","configuration":{"endian":"little"}},
         |            {"name":"zstd","configuration":{"level":0,"checksum":false}}],
         |  "index_codecs":[{"name":"bytes","configuration":{"endian":"little"}},
         |                  {"name":"crc32c","configuration":{}}],
         |  "index_location":"end"}}],
         |"attributes":{},"zarr_format":3,"node_type":"array","storage_transformers":[]}"""
        .stripMargin
    writeJson(dir.resolve("zarr.json"), metaJson)
    val nInnerPerShard = (shardLen + innerLen - 1) / innerLen
    values.grouped(shardLen).zipWithIndex.foreach { case (shardVals, si) =>
      val padded = shardVals.padTo(shardLen, fillValue)
      val data = new java.io.ByteArrayOutputStream()
      val index = ByteBuffer.allocate(nInnerPerShard * 16).order(ByteOrder.LITTLE_ENDIAN)
      padded.grouped(innerLen).zipWithIndex.foreach { case (innerVals, ii) =>
        if (missingInner.contains(si * nInnerPerShard + ii)) {
          index.putLong(-1L).putLong(-1L) // 2^64-1 twice = absent inner chunk
        } else {
          val buf = ByteBuffer.allocate(8 * innerLen).order(ByteOrder.LITTLE_ENDIAN)
          innerVals.padTo(innerLen, fillValue).foreach(buf.putLong)
          val enc = zstdCompress(buf.array(), 0)
          index.putLong(data.size.toLong).putLong(enc.length.toLong)
          data.write(enc)
        }
      }
      val idxBody = index.array()
      val crc = new java.util.zip.CRC32C()
      crc.update(idxBody)
      val crcBytes = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(crc.getValue.toInt).array()
      val chunkPath = dir.resolve("c").resolve(si.toString)
      Files.createDirectories(chunkPath.getParent)
      data.write(idxBody); data.write(crcBytes)
      Files.write(chunkPath, data.toByteArray)
    }
  }

  /** Sharded 1-D string array: same shard layout as
   *  [[writeShardedLongArray]] with vlen-utf8+zstd inner chunks. */
  def writeShardedStringArray(root: String, group: String, name: String,
      values: Seq[String], shardLen: Int, innerLen: Int): Unit = {
    val g = group.stripPrefix("/").stripSuffix("/")
    val dir = Paths.get(root, g, name)
    val metaJson =
      s"""{"shape":[${values.length}],"data_type":"string",
         |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[$shardLen]}},
         |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
         |"fill_value":"",
         |"codecs":[{"name":"sharding_indexed","configuration":{
         |  "chunk_shape":[$innerLen],
         |  "codecs":[{"name":"vlen-utf8","configuration":{}},
         |            {"name":"zstd","configuration":{"level":0,"checksum":false}}],
         |  "index_codecs":[{"name":"bytes","configuration":{"endian":"little"}},
         |                  {"name":"crc32c","configuration":{}}],
         |  "index_location":"end"}}],
         |"attributes":{},"zarr_format":3,"node_type":"array","storage_transformers":[]}"""
        .stripMargin
    writeJson(dir.resolve("zarr.json"), metaJson)
    val nInnerPerShard = (shardLen + innerLen - 1) / innerLen
    values.grouped(shardLen).zipWithIndex.foreach { case (shardVals, si) =>
      val padded = shardVals.padTo(shardLen, "")
      val data = new java.io.ByteArrayOutputStream()
      val index = ByteBuffer.allocate(nInnerPerShard * 16).order(ByteOrder.LITTLE_ENDIAN)
      padded.grouped(innerLen).foreach { innerVals =>
        val encoded = innerVals.padTo(innerLen, "").map { s =>
          val b = s.getBytes(StandardCharsets.UTF_8)
          ByteBuffer.allocate(4 + b.length).order(ByteOrder.LITTLE_ENDIAN)
            .putInt(b.length).put(b).array()
        }
        val header = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(innerLen).array()
        val enc = zstdCompress(encoded.foldLeft(header)(_ ++ _), 0)
        index.putLong(data.size.toLong).putLong(enc.length.toLong)
        data.write(enc)
      }
      val idxBody = index.array()
      val crc = new java.util.zip.CRC32C()
      crc.update(idxBody)
      val crcBytes = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(crc.getValue.toInt).array()
      val chunkPath = dir.resolve("c").resolve(si.toString)
      Files.createDirectories(chunkPath.getParent)
      data.write(idxBody); data.write(crcBytes)
      Files.write(chunkPath, data.toByteArray)
    }
  }

  /** Write a 1-D float64 array. */
  def writeDoubleArray(root: String, group: String, name: String,
      values: Seq[Double], chunkLen: Int): Unit = {
    val g = group.stripPrefix("/").stripSuffix("/")
    val dir = Paths.get(root, g, name)
    val metaJson =
      s"""{"shape":[${values.length}],"data_type":"float64",
         |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[$chunkLen]}},
         |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
         |"fill_value":0.0,
         |"codecs":[{"name":"bytes","configuration":{"endian":"little"}},
         |          {"name":"zstd","configuration":{"level":0,"checksum":false}}],
         |"attributes":{},"zarr_format":3,"node_type":"array","storage_transformers":[]}"""
        .stripMargin
    writeJson(dir.resolve("zarr.json"), metaJson)
    values.grouped(chunkLen).zipWithIndex.foreach { case (chunkVals, ci) =>
      val padded = chunkVals.padTo(chunkLen, 0.0)
      val buf = ByteBuffer.allocate(8 * chunkLen).order(ByteOrder.LITTLE_ENDIAN)
      padded.foreach(buf.putDouble)
      val chunkPath = dir.resolve("c").resolve(ci.toString)
      Files.createDirectories(chunkPath.getParent)
      Files.write(chunkPath, zstdCompress(buf.array(), 0))
    }
  }

  /** IEEE-754 float → half, round-to-nearest-even (for float16 fixtures). */
  def floatToHalf(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val value = bits & 0x7fffffff
    if (value >= 0x47800000) { // overflow → inf (or NaN)
      if (value > 0x7f800000) (sign | 0x7e00).toShort else (sign | 0x7c00).toShort
    } else if (value < 0x38800000) { // subnormal or zero
      val shift = 126 - (value >>> 23)
      val mant = (value & 0x7fffff) | 0x800000
      if (shift > 24) sign.toShort
      else (sign | ((mant >> shift) + ((mant >> (shift - 1)) & 1))).toShort
    } else {
      ((sign | ((value - 0x38000000) >>> 13)) + ((value >>> 12) & 1)).toShort
    }
  }

  /**
   * Generic 1-D fixed-width array writer covering the full dtype × codec
   * matrix ZarrCodecs decodes: any textual/extension dtype JSON, optional
   * zstd/gzip/none compression, optional crc32c, little/big endian, partial
   * trailing chunks, and deliberately omitted chunk objects (fill-value
   * reads). `put` encodes one element at the current buffer position.
   */
  /** "blosc[-<cname>][-noshuffle|-bitshuffle]" → (cname, shuffle mode); bare
   *  "blosc" defaults to lz4 (matching the DSv2 write path) and unknown
   *  cnames fail here, before any zarr.json naming them is written. */
  private def parseBloscComp(compression: String): (String, String) = {
    val parts = compression.stripPrefix("blosc").stripPrefix("-").split("-")
    // cname is optional: "blosc-noshuffle" means lz4+noshuffle, not a
    // cname called "noshuffle"
    val cname =
      if (parts(0).isEmpty || parts(0) == "noshuffle" || parts(0) == "bitshuffle") "lz4"
      else parts(0)
    Blosc.cnameCode(cname) // validate before the cname reaches zarr.json
    val mode =
      if (parts.contains("noshuffle")) "noshuffle"
      else if (parts.contains("bitshuffle")) "bitshuffle"
      else "shuffle"
    (cname, mode)
  }

  def writeFixedArray(root: String, group: String, name: String,
      dtypeJson: String, width: Int, put: (ByteBuffer, Any) => Unit,
      values: Seq[Any], pad: Any, chunkLen: Int, fillJson: String,
      compression: String = "zstd", crc32c: Boolean = false,
      bigEndian: Boolean = false, omitChunks: Set[Int] = Set.empty,
      bloscBlocksize: Int = 0): Unit = {
    val g = group.stripPrefix("/").stripSuffix("/")
    val dir = Paths.get(root, g, name)
    val codecJsons = Seq(
      Some(s"""{"name":"bytes","configuration":{"endian":"${if (bigEndian) "big" else "little"}"}}"""),
      compression match {
        case "zstd" => Some("""{"name":"zstd","configuration":{"level":0,"checksum":false}}""")
        case "gzip" => Some("""{"name":"gzip","configuration":{"level":5}}""")
        case b if b.startsWith("blosc") =>
          val (cname, mode) = parseBloscComp(b)
          Some(s"""{"name":"blosc","configuration":{"cname":"$cname","clevel":5,""" +
            s""""shuffle":"$mode","typesize":$width,""" +
            s""""blocksize":$bloscBlocksize}}""")
        case _      => None
      },
      if (crc32c) Some("""{"name":"crc32c","configuration":{}}""") else None
    ).flatten
    val metaJson =
      s"""{"shape":[${values.length}],"data_type":$dtypeJson,
         |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[$chunkLen]}},
         |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
         |"fill_value":$fillJson,
         |"codecs":[${codecJsons.mkString(",")}],
         |"attributes":{},"zarr_format":3,"node_type":"array","storage_transformers":[]}"""
        .stripMargin
    writeJson(dir.resolve("zarr.json"), metaJson)
    values.grouped(chunkLen).zipWithIndex.foreach { case (chunkVals, ci) =>
      if (!omitChunks.contains(ci)) {
        val order = if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
        val buf = ByteBuffer.allocate(width * chunkLen).order(order)
        chunkVals.padTo(chunkLen, pad).foreach(v => put(buf, v))
        var bytes = buf.array()
        bytes = compression match {
          case "zstd" => zstdCompress(bytes, 0)
          case "gzip" =>
            val bos = new java.io.ByteArrayOutputStream()
            val gz = new java.util.zip.GZIPOutputStream(bos)
            gz.write(bytes); gz.close(); bos.toByteArray
          case b if b.startsWith("blosc") =>
            val (cname, mode) = parseBloscComp(b)
            Blosc.encode(bytes, width, cname, 5, mode, bloscBlocksize)
          case _ => bytes
        }
        if (crc32c) {
          val crc = new java.util.zip.CRC32C()
          crc.update(bytes)
          val tail = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
            .putInt(crc.getValue.toInt).array()
          bytes = bytes ++ tail
        }
        val chunkPath = dir.resolve("c").resolve(ci.toString)
        Files.createDirectories(chunkPath.getParent)
        Files.write(chunkPath, bytes)
      }
    }
  }

  /**
   * A hand-crafted Zarr V2 store (`.zgroup`/`.zarray`, bare-index chunk
   * keys, numcodecs encodings) — byte-level test input for the v2 read
   * path, built strictly from the public Zarr v2 spec + numcodecs formats
   * (no zarr-python exists in this environment). 7 rows under /meta:
   *
   *  - `id`     `<i8`, zlib (RFC-1950) compressor, last chunk padded full
   *  - `temp`   `>f4` BIG-endian, no compressor (raw)
   *  - `name`   `|O` + vlen-utf8 filter (numcodecs u32 element-count
   *             header framing) + zlib
   *  - `ts`     `<M8[ms]` datetime64, zlib
   *  - `flag`   `|b1`, blosc compressor (numcodecs-style blosc1 frame)
   *  - `score`  `<f8`, zlib, chunk 1 MISSING → rows 3-5 read fill_value 1.5
   */
  // --- shared scaffolding for the hand-crafted v2 fixtures ---------------

  /** One fixture store under `root`/meta: `.zarray` docs, group docs, and
   *  the consolidated `.zmetadata` generated from the SAME doc strings as
   *  the per-array files so the two can never diverge. */
  private final class V2FixtureStore(root: String, rows: Int, chunkLen: Int) {
    private val zarrayDocs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    writeJson(Paths.get(root, ".zgroup"), """{"zarr_format":2}""")
    writeJson(Paths.get(root, "meta", ".zgroup"), """{"zarr_format":2}""")
    def writeArray(name: String, dtype: String, compressor: String,
        filters: String, fill: String, chunks: Map[Int, Array[Byte]]): Unit = {
      val dir = Paths.get(root, "meta", name)
      val doc =
        s"""{"zarr_format":2,"shape":[$rows],"chunks":[$chunkLen],"dtype":"$dtype",
           |"compressor":$compressor,"fill_value":$fill,"order":"C","filters":$filters}"""
          .stripMargin.replace("\n", "")
      zarrayDocs(name) = doc
      writeJson(dir.resolve(".zarray"), doc)
      chunks.foreach { case (i, bytes) =>
        Files.createDirectories(dir)
        Files.write(dir.resolve(i.toString), bytes)
      }
    }
    def writeConsolidated(): Unit = {
      val consolidated = (Seq("\".zgroup\":{\"zarr_format\":2}") ++
        zarrayDocs.map { case (n, d) => s""""$n/.zarray":$d""" }).mkString(",")
      writeJson(Paths.get(root, "meta", ".zmetadata"),
        s"""{"metadata":{$consolidated},"zarr_consolidated_format":1}""")
    }
  }

  private def v2Zlib(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(b); d.finish()
      val out = new Array[Byte](b.length + 64)
      val n = d.deflate(out)
      java.util.Arrays.copyOfRange(out, 0, n)
    } finally d.end()
  }

  private def leLongs(vs: Long*): Array[Byte] = {
    val b = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putLong); b.array()
  }

  private def leInts(vs: Int*): Array[Byte] = {
    val b = ByteBuffer.allocate(vs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putInt); b.array()
  }

  private def leFloats(vs: Float*): Array[Byte] = {
    val b = ByteBuffer.allocate(vs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putFloat); b.array()
  }

  private def leDoubles(vs: Double*): Array[Byte] = {
    val b = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putDouble); b.array()
  }

  def writeV2Fixture(root: String): Unit = {
    val store = new V2FixtureStore(root, rows = 7, chunkLen = 3)
    import store.writeArray
    def zlib(b: Array[Byte]): Array[Byte] = v2Zlib(b)

    // id: 0..6, padded full last chunk (v2 chunk objects are always full)
    writeArray("id", "<i8", """{"id":"zlib","level":6}""", "null", "0", Map(
      0 -> zlib(leLongs(0, 1, 2)),
      1 -> zlib(leLongs(3, 4, 5)),
      2 -> zlib(leLongs(6, 0, 0))))
    // temp: big-endian float32, stored raw
    def beFloats(vs: Float*): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.length * 4).order(ByteOrder.BIG_ENDIAN)
      vs.foreach(b.putFloat); b.array()
    }
    writeArray("temp", ">f4", "null", "null", "0.0", Map(
      0 -> beFloats(1.5f, -2.25f, 3.0f),
      1 -> beFloats(0.5f, 10.0f, -0.75f),
      2 -> beFloats(99.5f, 0f, 0f)))
    // name: numcodecs VLenUTF8 framing — u32 element count, then per
    // element u32 length + bytes (all little-endian)
    def vlen2(vs: String*): Array[Byte] = {
      val enc = vs.map(_.getBytes(StandardCharsets.UTF_8))
      val b = ByteBuffer.allocate(4 + enc.map(_.length + 4).sum)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(vs.length)
      enc.foreach { e => b.putInt(e.length); b.put(e) }
      b.array()
    }
    writeArray("name", "|O", """{"id":"zlib","level":6}""",
      """[{"id":"vlen-utf8"}]""", "\"\"", Map(
        0 -> zlib(vlen2("n0", "n1", "n2")),
        1 -> zlib(vlen2("n3", "n4", "n5")),
        2 -> zlib(vlen2("n6", "", ""))))
    // ts: datetime64[ms] — 2024-01-01 + k days
    val day = 86400000L
    val t0 = 1704067200000L
    writeArray("ts", "<M8[ms]", """{"id":"zlib","level":6}""", "null", "0", Map(
      0 -> zlib(leLongs(t0, t0 + day, t0 + 2 * day)),
      1 -> zlib(leLongs(t0 + 3 * day, t0 + 4 * day, t0 + 5 * day)),
      2 -> zlib(leLongs(t0 + 6 * day, 0, 0))))
    // flag: bool, blosc1 frame (what zarr-python's default compressor writes)
    def bools(vs: Boolean*): Array[Byte] = vs.map(v => if (v) 1.toByte else 0.toByte).toArray
    def blosc(b: Array[Byte]): Array[Byte] = Blosc.encode(b, 1, "lz4", 5, "noshuffle", 0)
    writeArray("flag", "|b1",
      """{"id":"blosc","cname":"lz4","clevel":5,"shuffle":0,"blocksize":0}""",
      "null", "false", Map(
        0 -> blosc(bools(true, false, true)),
        1 -> blosc(bools(false, false, true)),
        2 -> blosc(bools(true, false, false))))
    // score: chunk 1 deliberately MISSING → fill_value 1.5 for rows 3-5
    writeArray("score", "<f8", """{"id":"zlib","level":6}""", "null", "1.5", Map(
      0 -> zlib(leDoubles(0.25, 0.5, 0.75)),
      2 -> zlib(leDoubles(6.25, 0, 0))))
    store.writeConsolidated()
  }

  /**
   * Zarr v2 store exercising the numcodecs surfaces beyond the base
   * fixture: `lz4` compressor (u32-LE size header + raw LZ4 block),
   * `delta` and `shuffle` filters (alone and chained, in declared order),
   * and fixed-width unicode dtypes (`<U4`, `>U3`) — the layouts
   * zarr-python 2.x produces for e.g. coordinate arrays and numpy string
   * arrays saved without an object dtype. 7 rows, chunk 3:
   *  - `id`    `<i8`, filters=[delta <i8], lz4
   *  - `cnt`   `<i4`, filters=[delta <i4, shuffle es=4], lz4
   *  - `temp`  `<f4`, filters=[shuffle es=4], zlib
   *  - `label` `<U4`, lz4 (non-ASCII + empty elements)
   *  - `tag`   `>U3`, raw (big-endian unicode)
   *  - `flag`  `|b1`, filters=[packbits], bz2
   *  - `wt`    `<f8`, lzma (FORMAT_XZ)
   */
  def writeV2FiltersFixture(root: String): Unit = {
    val store = new V2FixtureStore(root, rows = 7, chunkLen = 3)
    import store.writeArray
    def zlib(b: Array[Byte]): Array[Byte] = v2Zlib(b)
    def lz4(b: Array[Byte]): Array[Byte] = {
      val c = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
      val out = new Array[Byte](4 + c.maxCompressedLength(b.length))
      ByteBuffer.wrap(out, 0, 4).order(ByteOrder.LITTLE_ENDIAN).putInt(b.length)
      val n = c.compress(b, 0, b.length, out, 4, out.length - 4)
      java.util.Arrays.copyOfRange(out, 0, 4 + n)
    }
    // per-chunk delta encode, exactly numcodecs.Delta: first element
    // verbatim, then wrapping differences in the dtype's own width
    def delta(width: Int)(b: Array[Byte]): Array[Byte] = {
      val out = b.clone()
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      val ob = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
      var i = b.length / width - 1
      while (i >= 1) {
        width match {
          case 4 => ob.putInt(i * 4, bb.getInt(i * 4) - bb.getInt((i - 1) * 4))
          case 8 => ob.putLong(i * 8, bb.getLong(i * 8) - bb.getLong((i - 1) * 8))
        }
        i -= 1
      }
      out
    }
    def u32(le: Boolean, units: Int)(vs: String*): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.length * units * 4)
        .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      vs.foreach { s =>
        val cps = s.codePoints().toArray
        require(cps.length <= units, s"'$s' exceeds $units units")
        cps.foreach(b.putInt)
        (cps.length until units).foreach(_ => b.putInt(0)) // NUL padding
      }
      b.array()
    }
    // id: cumulative 0,10,30,60,100,150,210 — delta then lz4
    writeArray("id", "<i8", """{"id":"lz4","acceleration":1}""",
      """[{"id":"delta","dtype":"<i8"}]""", "0", Map(
        0 -> lz4(delta(8)(leLongs(0, 10, 30))),
        1 -> lz4(delta(8)(leLongs(60, 100, 150))),
        2 -> lz4(delta(8)(leLongs(210, 0, 0)))))
    // cnt: delta THEN shuffle (declared order), then lz4 — decode must undo
    // lz4, unshuffle, then prefix-sum
    def deltaShuffle(b: Array[Byte]): Array[Byte] =
      Blosc.shuffleBuffer(4, delta(4)(b))
    writeArray("cnt", "<i4", """{"id":"lz4","acceleration":1}""",
      """[{"id":"delta","dtype":"<i4","astype":"<i4"},{"id":"shuffle","elementsize":4}]""",
      "0", Map(
        0 -> lz4(deltaShuffle(leInts(5, 4, 6))),
        1 -> lz4(deltaShuffle(leInts(3, 7, 2))),
        2 -> lz4(deltaShuffle(leInts(8, 0, 0)))))
    // temp: shuffle alone, zlib
    writeArray("temp", "<f4", """{"id":"zlib","level":6}""",
      """[{"id":"shuffle","elementsize":4}]""", "0.0", Map(
        0 -> zlib(Blosc.shuffleBuffer(4, leFloats(1.5f, -2.25f, 3.0f))),
        1 -> zlib(Blosc.shuffleBuffer(4, leFloats(0.5f, 10.0f, -0.75f))),
        2 -> zlib(Blosc.shuffleBuffer(4, leFloats(99.5f, 0f, 0f)))))
    // label: little-endian fixed unicode with non-ASCII and empty elements
    writeArray("label", "<U4", """{"id":"lz4","acceleration":1}""", "null",
      "\"\"", Map(
        0 -> lz4(u32(le = true, 4)("aa", "béta", "")),
        1 -> lz4(u32(le = true, 4)("日本", "x", "yy")),
        2 -> lz4(u32(le = true, 4)("zzz", "", ""))))
    // tag: big-endian fixed unicode, no compressor
    writeArray("tag", ">U3", "null", "null", "\"\"", Map(
      0 -> u32(le = false, 3)("t0", "t1", "t2"),
      1 -> u32(le = false, 3)("t3", "t4", "t5"),
      2 -> u32(le = false, 3)("t6", "", "")))
    // flag: bools through packbits (1-byte leftover header + MSB-first
    // np.packbits bits) then a bzip2 stream
    def packbits(vs: Boolean*): Array[Byte] = {
      val out = new Array[Byte](1 + (vs.length + 7) / 8)
      out(0) = (vs.length % 8).toByte
      vs.zipWithIndex.foreach { case (v, i) =>
        if (v) out(1 + (i >> 3)) = (out(1 + (i >> 3)) | (1 << (7 - (i & 7)))).toByte
      }
      out
    }
    def bz2(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new org.apache.commons.compress.compressors.bzip2
        .BZip2CompressorOutputStream(bos)
      out.write(b); out.close()
      bos.toByteArray
    }
    writeArray("flag", "|b1", """{"id":"bz2","level":9}""",
      """[{"id":"packbits"}]""", "false", Map(
        0 -> bz2(packbits(true, false, true)),
        1 -> bz2(packbits(false, false, true)),
        2 -> bz2(packbits(true, false, false))))
    // wt: float64 through an .xz stream (numcodecs lzma FORMAT_XZ default)
    def xz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new org.apache.commons.compress.compressors.xz
        .XZCompressorOutputStream(bos)
      out.write(b); out.close()
      bos.toByteArray
    }
    writeArray("wt", "<f8", """{"id":"lzma","format":1,"check":-1}""", "null",
      "0.0", Map(
        0 -> xz(leDoubles(0.125, 0.25, 0.5)),
        1 -> xz(leDoubles(1.0, 2.0, 4.0)),
        2 -> xz(leDoubles(8.0, 0, 0))))
    store.writeConsolidated()
  }

  // --- n-D fixtures (independent byte-builders for the k-D read path) ----

  /** Cartesian C-order iteration of a k-D index space: all coordinate
   *  vectors of `dims`, last dim fastest. */
  private def cOrder(dims: Seq[Int]): Iterator[Seq[Int]] =
    dims.foldLeft(Iterator(Seq.empty[Int]))((it, d) =>
      it.flatMap(prefix => (0 until d).iterator.map(prefix :+ _)))

  /**
   * Generic k-D fixed-width array writer, constructed strictly from the
   * Zarr specs (both versions store every chunk as a FULL `chunks`-shaped
   * C-order block, edge chunks padded with the fill value):
   * `value(coord)` supplies each in-bounds element; `omitCells` lists chunk
   * grid cells to leave unwritten (fill-value reads). v3 keys are
   * `c/<i>/<j>…`; v2 keys are `<i>.<j>…` with a `.zarray` document.
   * This builder shares NO code with the scan or the DSv2 write path —
   * it is the independent producer the n-D read math is validated against.
   */
  def writeNdArray(root: String, group: String, name: String,
      v2: Boolean, dtypeJson: String, width: Int,
      put: (ByteBuffer, Any) => Unit, value: Seq[Int] => Any, pad: Any,
      shape: Seq[Int], chunks: Seq[Int], fillJson: String,
      compress: Boolean = true, bigEndian: Boolean = false,
      omitCells: Set[Seq[Int]] = Set.empty): Unit = {
    val g = group.stripPrefix("/").stripSuffix("/")
    val dir = Paths.get(root, g, name)
    val rank = shape.length
    require(chunks.length == rank)
    val endianChar = if (bigEndian) ">" else "<"
    val metaJson =
      if (v2)
        s"""{"zarr_format":2,"shape":[${shape.mkString(",")}],""" +
          s""""chunks":[${chunks.mkString(",")}],""" +
          s""""dtype":"$endianChar$dtypeJson","order":"C","filters":null,""" +
          s""""compressor":${if (compress) """{"id":"zlib","level":6}""" else "null"},""" +
          s""""fill_value":$fillJson}"""
      else
        s"""{"shape":[${shape.mkString(",")}],"data_type":$dtypeJson,
           |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[${chunks.mkString(",")}]}},
           |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
           |"fill_value":$fillJson,
           |"codecs":[{"name":"bytes","configuration":{"endian":"${if (bigEndian) "big" else "little"}"}}${
             if (compress) """,{"name":"zstd","configuration":{"level":0,"checksum":false}}""" else ""}],
           |"attributes":{"_ARRAY_DIMENSIONS":[${(0 until rank).map(d => s""""dim_$d"""").mkString(",")}]},
           |"zarr_format":3,"node_type":"array","storage_transformers":[]}""".stripMargin
    writeJson(dir.resolve(if (v2) ".zarray" else "zarr.json"), metaJson)
    val gridCounts = shape.lazyZip(chunks).map((s, c) => (s + c - 1) / c)
    cOrder(gridCounts).foreach { cell =>
      if (!omitCells.contains(cell)) {
        val order = if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
        val buf = ByteBuffer.allocate(width * chunks.product).order(order)
        cOrder(chunks).foreach { within =>
          val coord = cell.lazyZip(chunks).lazyZip(within).map((t, c, w) => t * c + w)
          val inBounds = coord.lazyZip(shape).forall(_ < _)
          put(buf, if (inBounds) value(coord) else pad)
        }
        val bytes =
          if (!compress) buf.array()
          else if (v2) v2Zlib(buf.array())
          else zstdCompress(buf.array(), 0)
        val chunkPath =
          if (v2) dir.resolve(cell.mkString("."))
          else cell.foldLeft(dir.resolve("c"))((p, i) => p.resolve(i.toString))
        Files.createDirectories(chunkPath.getParent)
        Files.write(chunkPath, bytes)
      }
    }
  }

  /**
   * The n-D golden fixture, 5 rows under /nd (values follow closed
   * formulas so specs and the q_zarr_nd literal oracle agree):
   *
   *  - `id`    1-D int64 [5] chunk [2] — the coordinate column
   *  - `emb`   2-D float32 [5,4] chunk [2,4] (trailing UNCHUNKED — the
   *            contiguous fast path), emb[r][j] = r*10 + j
   *  - `grid`  2-D int32 [5,6] chunk [2,3] (trailing CHUNKED — the grid-
   *            cell general path; cell (1,1) omitted → fill −1 for rows
   *            2-3, cols 3-5), grid[r][j] = r*100 + j
   *  - `cube`  3-D float64 [5,2,3] chunk [2,2,3] (nested fast path),
   *            cube[r][i][j] = r*100 + i*10 + j
   *  - `tail`  3-D int32 [5,3,3] chunk [2,2,2] (general path with EDGE
   *            cells along both trailing dims), tail[r][i][j] = r*9+i*3+j
   */
  def writeNdFixture(root: String): Unit = {
    writeGroup(root, "/nd")
    writeLongArray(root, "/nd", "id", Seq(0L, 1L, 2L, 3L, 4L), 2)
    writeNdArray(root, "/nd", "emb", v2 = false, "\"float32\"", 4,
      (b, v) => b.putFloat(v.asInstanceOf[Float]),
      c => (c(0) * 10 + c(1)).toFloat, 0f,
      shape = Seq(5, 4), chunks = Seq(2, 4), fillJson = "0.0")
    writeNdArray(root, "/nd", "grid", v2 = false, "\"int32\"", 4,
      (b, v) => b.putInt(v.asInstanceOf[Int]),
      c => c(0) * 100 + c(1), -1,
      shape = Seq(5, 6), chunks = Seq(2, 3), fillJson = "-1",
      omitCells = Set(Seq(1, 1)))
    writeNdArray(root, "/nd", "cube", v2 = false, "\"float64\"", 8,
      (b, v) => b.putDouble(v.asInstanceOf[Double]),
      c => (c(0) * 100 + c(1) * 10 + c(2)).toDouble, 0.0,
      shape = Seq(5, 2, 3), chunks = Seq(2, 2, 3), fillJson = "0.0")
    writeNdArray(root, "/nd", "tail", v2 = false, "\"int32\"", 4,
      (b, v) => b.putInt(v.asInstanceOf[Int]),
      c => c(0) * 9 + c(1) * 3 + c(2), 0,
      shape = Seq(5, 3, 3), chunks = Seq(2, 2, 2), fillJson = "0")
  }

  /**
   * v2 n-D fixture, 5 rows under /nd: `.zarray` docs, dot-joined chunk
   * keys, zlib/raw numcodecs encodings, one big-endian array —
   * the foreign layout zarr-python 2.x writes for n-D data.
   *
   *  - `id`   1-D `<i8` zlib
   *  - `emb`  2-D `<f4` [5,4] chunk [2,4] zlib, emb[r][j] = r*10 + j
   *  - `grid` 2-D `>i4` [5,6] chunk [2,3] RAW big-endian (general path +
   *           endianness), grid[r][j] = r*100 + j, cell (0,1) omitted →
   *           fill 7 for rows 0-1, cols 3-5
   */
  def writeNdV2Fixture(root: String): Unit = {
    writeJson(Paths.get(root, ".zgroup"), """{"zarr_format":2}""")
    writeJson(Paths.get(root, "nd", ".zgroup"), """{"zarr_format":2}""")
    writeNdArray(root, "/nd", "id", v2 = true, "i8", 8,
      (b, v) => b.putLong(v.asInstanceOf[Long]),
      c => c(0).toLong, 0L, shape = Seq(5), chunks = Seq(2), fillJson = "0")
    writeNdArray(root, "/nd", "emb", v2 = true, "f4", 4,
      (b, v) => b.putFloat(v.asInstanceOf[Float]),
      c => (c(0) * 10 + c(1)).toFloat, 0f,
      shape = Seq(5, 4), chunks = Seq(2, 4), fillJson = "0.0")
    writeNdArray(root, "/nd", "grid", v2 = true, "i4", 4,
      (b, v) => b.putInt(v.asInstanceOf[Int]),
      c => c(0) * 100 + c(1), 7,
      shape = Seq(5, 6), chunks = Seq(2, 3), fillJson = "7",
      compress = false, bigEndian = true, omitCells = Set(Seq(0, 1)))
  }

  /**
   * The reference's golden fixture: /meta group, 3 rows —
   * collections a/b/c, dates 2023-01-01..03, bbox = WKT boxes ±10/±20/±30.
   */
  def writeReferenceFixture(root: String): Unit = {
    def boxWkt(r: Int): String =
      s"POLYGON (($r -$r, $r $r, -$r $r, -$r -$r, $r -$r))"
    writeGroup(root, "/meta")
    writeStringArray(root, "/meta", "collection",
      Seq("collection_a", "collection_b", "collection_c"), 3)
    writeLongArray(root, "/meta", "date",
      Seq(1672531200000L, 1672617600000L, 1672704000000L), 3,
      datetimeUnit = Some("ms"), fillValue = Long.MinValue)
    writeStringArray(root, "/meta", "bbox",
      Seq(boxWkt(10), boxWkt(20), boxWkt(30)), 3)
  }
}
