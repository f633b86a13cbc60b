package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.util.Random

import org.apache.spark.unsafe.types.UTF8String

import graft.zarr._

/**
 * Property fuzz over the Zarr v2 FOREIGN-layout surface: each case writes a
 * random valid (dtype × filter-chain × compressor × chunk-grid) store
 * through this spec's OWN byte-level encoders (numpy packing, numcodecs
 * delta/shuffle/packbits/vlen framing — nothing shared with the engine's
 * write path or decode stack beyond library-standard compressed formats),
 * then asserts the scan stack decodes exactly the construction values.
 *
 * 240 deterministic seeded cases: dtypes i1..i8/u1..u4/f4/f8/b1/M8[unit]/
 * U{n}/S{n}/|O-vlen, both endiannesses, compressors none/zlib/gzip/zstd/
 * lz4/bz2/lzma-xz, filter chains (delta, shuffle, delta+shuffle, packbits),
 * 1-D and 2-D grids (dot and slash separators), missing chunks → fill.
 * Every 16th case additionally round-trips through the full
 * `spark.read.format("zarr")` path.
 */
class ZarrV2FuzzSpec extends SparkSpec {

  // --- independent numcodecs encoders -----------------------------------

  private def zlib(b: Array[Byte], level: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(level)
    try {
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream(b.length + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close(); bos.toByteArray
  }

  private def lz4(b: Array[Byte]): Array[Byte] = {
    val c = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    val out = new Array[Byte](4 + c.maxCompressedLength(b.length))
    ByteBuffer.wrap(out, 0, 4).order(ByteOrder.LITTLE_ENDIAN).putInt(b.length)
    val n = c.compress(b, 0, b.length, out, 4, out.length - 4)
    java.util.Arrays.copyOfRange(out, 0, 4 + n)
  }

  private def bz2(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(bos)
    out.write(b); out.close(); bos.toByteArray
  }

  private def xz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new org.apache.commons.compress.compressors.xz
      .XZCompressorOutputStream(bos)
    out.write(b); out.close(); bos.toByteArray
  }

  /** numcodecs Delta: first element verbatim, then wrapping differences in
   *  the dtype's own width (independent re-implementation). */
  private def deltaEnc(width: Int, le: Boolean)(b: Array[Byte]): Array[Byte] = {
    val out = b.clone()
    val order = if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val in = ByteBuffer.wrap(b).order(order)
    val ob = ByteBuffer.wrap(out).order(order)
    var i = b.length / width - 1
    while (i >= 1) {
      width match {
        case 2 => ob.putShort(i * 2, (in.getShort(i * 2) - in.getShort((i - 1) * 2)).toShort)
        case 4 => ob.putInt(i * 4, in.getInt(i * 4) - in.getInt((i - 1) * 4))
        case 8 => ob.putLong(i * 8, in.getLong(i * 8) - in.getLong((i - 1) * 8))
      }
      i -= 1
    }
    out
  }

  /** numcodecs Shuffle: byte-plane transpose, es bytes per element
   *  (independent re-implementation, not Blosc.shuffleBuffer). */
  private def shuffleEnc(es: Int)(b: Array[Byte]): Array[Byte] = {
    val nel = b.length / es
    val out = b.clone() // tail beyond nel*es stays verbatim
    var j = 0
    while (j < es) {
      var i = 0
      while (i < nel) { out(j * nel + i) = b(i * es + j); i += 1 }
      j += 1
    }
    out
  }

  /** numcodecs PackBits: leftover-bit-count header + MSB-first bits. */
  private def packbitsEnc(bools: Array[Byte]): Array[Byte] = {
    val n = bools.length
    val out = new Array[Byte](1 + (n + 7) / 8)
    out(0) = (n % 8).toByte
    var i = 0
    while (i < n) {
      if (bools(i) != 0) out(1 + (i >> 3)) = (out(1 + (i >> 3)) | (1 << (7 - (i & 7)))).toByte
      i += 1
    }
    out
  }

  /** numcodecs VLen*: u32-LE element count, then per element u32 len+bytes. */
  private def vlenEnc(parts: Seq[Array[Byte]]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + parts.map(_.length + 4).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(parts.length)
    parts.foreach { e => b.putInt(e.length); b.put(e) }
    b.array()
  }

  // --- the per-dtype model ----------------------------------------------

  /** One fuzzable leaf dtype: numpy typestr body, element byte width (0 =
   *  vlen), random value, raw little/big-endian packing, the Catalyst value
   *  the scan must produce, a JSON fill value + its Catalyst reading. */
  private case class DT(
      body: String, width: Int, deltaOk: Boolean,
      gen: Random => Any,
      put: (ByteBuffer, Any) => Unit,
      expect: Any => Any,
      fillJson: String, fillExpect: Any)

  private def utf32(units: Int, s: String, bb: ByteBuffer): Unit = {
    val cps = s.codePoints().toArray
    cps.foreach(bb.putInt)
    (cps.length until units).foreach(_ => bb.putInt(0))
  }

  private def randStr(r: Random, maxLen: Int): String = {
    val n = r.nextInt(maxLen + 1)
    val sb = new StringBuilder
    (0 until n).foreach { _ =>
      sb.append(r.nextInt(4) match {
        case 0 => ('a' + r.nextInt(26)).toChar.toString
        case 1 => ('0' + r.nextInt(10)).toChar.toString
        case 2 => "é"
        case _ => "日"
      })
    }
    sb.toString
  }

  private def dtypes(r: Random): Seq[DT] = Seq(
    DT("i1", 1, deltaOk = false, _.nextInt(256).toByte.asInstanceOf[Any],
      (b, v) => b.put(v.asInstanceOf[Byte]), identity, "3", 3.toByte),
    DT("i2", 2, deltaOk = true, _.nextInt(65536).toShort.asInstanceOf[Any],
      (b, v) => b.putShort(v.asInstanceOf[Short]), identity, "-7", (-7).toShort),
    DT("i4", 4, deltaOk = true, _.nextInt().asInstanceOf[Any],
      (b, v) => b.putInt(v.asInstanceOf[Int]), identity, "11", 11),
    DT("i8", 8, deltaOk = true, _.nextLong().asInstanceOf[Any],
      (b, v) => b.putLong(v.asInstanceOf[Long]), identity, "0", 0L),
    DT("u1", 1, deltaOk = false, _.nextInt(256).asInstanceOf[Any],
      (b, v) => b.put(v.asInstanceOf[Int].toByte),
      v => v.asInstanceOf[Int].toShort, "200", 200.toShort),
    DT("u2", 2, deltaOk = true, _.nextInt(65536).asInstanceOf[Any],
      (b, v) => b.putShort(v.asInstanceOf[Int].toShort),
      v => v.asInstanceOf[Int], "60000", 60000),
    DT("u4", 4, deltaOk = true, (r => (r.nextLong() & 0xffffffffL): Any),
      (b, v) => b.putInt(v.asInstanceOf[Long].toInt),
      v => v.asInstanceOf[Long], "4000000000", 4000000000L),
    DT("f4", 4, deltaOk = false,
      (r => (if (r.nextInt(10) == 0) Float.NaN else r.nextFloat() * 100 - 50): Any),
      (b, v) => b.putFloat(v.asInstanceOf[Float]), identity, "1.5", 1.5f),
    DT("f8", 8, deltaOk = false,
      (r => (if (r.nextInt(10) == 0) Double.PositiveInfinity
             else r.nextDouble() * 1e6 - 5e5): Any),
      (b, v) => b.putDouble(v.asInstanceOf[Double]), identity, "0.25", 0.25),
    DT("b1", 1, deltaOk = false, _.nextBoolean().asInstanceOf[Any],
      (b, v) => b.put(if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte),
      identity, "true", true),
    {
      val unit = Seq("s", "ms", "us", "ns")(r.nextInt(4))
      val toMicros: Long => Long = unit match {
        case "s" => _ * 1000000L
        case "ms" => _ * 1000L
        case "us" => identity
        case "ns" => Math.floorDiv(_, 1000L)
      }
      DT(s"M8[$unit]", 8, deltaOk = true,
        (rr => (rr.nextLong() % (1L << 48)): Any),
        (b, v) => b.putLong(v.asInstanceOf[Long]),
        v => toMicros(v.asInstanceOf[Long]), "1000", toMicros(1000L))
    },
    {
      val units = 1 + r.nextInt(4)
      DT(s"U$units", units * 4, deltaOk = false,
        (rr => randStr(rr, units): Any),
        (b, v) => utf32(units, v.asInstanceOf[String], b),
        v => UTF8String.fromString(v.asInstanceOf[String]),
        "\"\"", UTF8String.fromString(""))
    },
    {
      val w = 1 + r.nextInt(4)
      DT(s"S$w", w, deltaOk = false,
        (rr => { val a = new Array[Byte](w); rr.nextBytes(a); a }: Any),
        (b, v) => b.put(v.asInstanceOf[Array[Byte]]),
        identity, "0", new Array[Byte](w))
    }
  )

  // vlen |O dtypes handled separately (no fixed width, LE only)
  private def isVlenCase(r: Random): Boolean = r.nextInt(8) == 0

  private def assertValEq(got: Any, want: Any, ctx: String): Unit = (got, want) match {
    case (g: Array[Byte], w: Array[Byte]) =>
      assert(java.util.Arrays.equals(g, w), ctx)
    case (g: Float, w: Float) =>
      assert(java.lang.Float.floatToIntBits(g) == java.lang.Float.floatToIntBits(w), ctx)
    case (g: Double, w: Double) =>
      assert(java.lang.Double.doubleToLongBits(g) == java.lang.Double.doubleToLongBits(w), ctx)
    case _ => assert(got == want, s"$ctx: got $got want $want")
  }

  test("240-case foreign-layout fuzz: random dtype x filters x compressor x grid stores decode exactly") {
    val seed = 20260813L
    (0 until 240).foreach { case0 =>
      val r = new Random(seed + case0)
      val dir = tempDir(s"v2fuzz_$case0")
      val root = java.nio.file.Paths.get(dir)
      java.nio.file.Files.write(root.resolve(".zgroup"),
        """{"zarr_format":2}""".getBytes(StandardCharsets.UTF_8))

      val n = 1 + r.nextInt(25)
      val c0 = 1 + r.nextInt(8)
      val twoD = r.nextInt(4) == 0
      val (tShape, tChunk) =
        if (!twoD) (0, 0)
        else { val ts = 1 + r.nextInt(4); (ts, 1 + r.nextInt(ts)) }
      val sep = if (r.nextBoolean()) "." else "/"
      val le = r.nextBoolean()
      val vlen = !twoD && isVlenCase(r)

      // compressor choice (encoder, json)
      val (compress, compJson): (Array[Byte] => Array[Byte], String) = r.nextInt(7) match {
        case 0 => (identity[Array[Byte]] _, "null")
        case 1 => val lvl = 1 + r.nextInt(9)
          (zlib(_, lvl), s"""{"id":"zlib","level":$lvl}""")
        case 2 => (gzip _, """{"id":"gzip","level":5}""")
        case 3 => (b => com.github.luben.zstd.Zstd.compress(b, r.nextInt(4)),
          """{"id":"zstd","level":0}""")
        case 4 => (lz4 _, """{"id":"lz4","acceleration":1}""")
        case 5 => (bz2 _, """{"id":"bz2","level":9}""")
        case _ => (xz _, """{"id":"lzma","format":1,"check":-1}""")
      }

      val rowElems = if (twoD) tShape else 1
      if (vlen) {
        // |O + vlen-utf8 / vlen-bytes, 1-D only
        val utf8 = r.nextBoolean()
        val vals: IndexedSeq[Any] =
          if (utf8) (0 until n).map(_ => randStr(r, 6))
          else (0 until n).map { _ =>
            val a = new Array[Byte](r.nextInt(7)); r.nextBytes(a); a }
        val filterJson =
          if (utf8) """[{"id":"vlen-utf8"}]""" else """[{"id":"vlen-bytes"}]"""
        val doc =
          s"""{"zarr_format":2,"shape":[$n],"chunks":[$c0],"dtype":"|O",
             |"compressor":$compJson,"fill_value":null,"order":"C",
             |"filters":$filterJson,"dimension_separator":"$sep"}"""
            .stripMargin.replace("\n", "")
        val adir = root.resolve("v")
        java.nio.file.Files.createDirectories(adir)
        java.nio.file.Files.write(adir.resolve(".zarray"),
          doc.getBytes(StandardCharsets.UTF_8))
        val omitted = (0 until (n + c0 - 1) / c0).filter(_ => r.nextInt(7) == 0).toSet
        (0 until (n + c0 - 1) / c0).foreach { ci =>
          if (!omitted.contains(ci)) {
            val slice = (0 until c0).map { k =>
              val idx = ci * c0 + k
              if (idx >= n) Array.emptyByteArray
              else if (utf8) vals(idx).asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
              else vals(idx).asInstanceOf[Array[Byte]]
            }
            java.nio.file.Files.write(adir.resolve(ci.toString),
              compress(vlenEnc(slice)))
          }
        }
        val meta = ZarrMeta.parseArrayV2("v", "v",
          new String(java.nio.file.Files.readAllBytes(adir.resolve(".zarray")),
            StandardCharsets.UTF_8))
        val store = new ZarrStore(dir, new org.apache.hadoop.conf.Configuration())
        var ci = -1L; var chunk: ColumnChunk = null
        (0 until n).foreach { i =>
          val want: Any =
            if (omitted.contains(i / c0))
              (if (utf8) UTF8String.fromString("") else Array.emptyByteArray)
            else if (utf8) UTF8String.fromString(vals(i).asInstanceOf[String])
            else vals(i)
          if (i / c0 != ci) { ci = i / c0; chunk = ZarrCodecs.fetchChunk(store, meta, ci) }
          assertValEq(chunk.get(i % c0), want, s"case $case0 vlen row $i")
        }
      } else {
        val dts = dtypes(r)
        val dt = dts(r.nextInt(dts.length))
        val typestr = (if (dt.width > 1) (if (le) "<" else ">") else "|") + dt.body
        // filter chain (declared order = encode order)
        val isBool = dt.body == "b1"
        val isUnicode = dt.body.startsWith("U")
        val isRawS = dt.body.startsWith("S")
        val canShuffle = dt.width > 1 && !isUnicode
        val useDelta = dt.deltaOk && r.nextInt(3) == 0
        val useShuffle = canShuffle && r.nextInt(3) == 0
        val usePackbits = isBool && r.nextBoolean()
        val filters = Seq(
          if (useDelta) Some(s"""{"id":"delta","dtype":"$typestr"}""") else None,
          if (useShuffle) Some(s"""{"id":"shuffle","elementsize":${dt.width}}""") else None,
          if (usePackbits) Some("""{"id":"packbits"}""") else None).flatten
        val filterJson =
          if (filters.isEmpty) "null" else filters.mkString("[", ",", "]")
        val shapeJson = if (twoD) s"$n,$tShape" else s"$n"
        val chunkJson = if (twoD) s"$c0,$tChunk" else s"$c0"
        val doc =
          s"""{"zarr_format":2,"shape":[$shapeJson],"chunks":[$chunkJson],"dtype":"$typestr",
             |"compressor":$compJson,"fill_value":${dt.fillJson},"order":"C",
             |"filters":$filterJson,"dimension_separator":"$sep"}"""
            .stripMargin.replace("\n", "")
        val adir = root.resolve("v")
        java.nio.file.Files.createDirectories(adir)
        java.nio.file.Files.write(adir.resolve(".zarray"),
          doc.getBytes(StandardCharsets.UTF_8))

        // leaf values in row-major order; fill-padded full chunk objects
        val vals: IndexedSeq[Any] = (0 until n * rowElems).map(_ => dt.gen(r))
        val fillRaw: Any = dt.fillJson match {
          case "3" => 3.toByte; case "-7" => (-7).toShort; case "11" => 11
          case "0" if isRawS => new Array[Byte](dt.width)
          case "0" => 0L; case "200" => 200; case "60000" => 60000
          case "4000000000" => 4000000000L
          case "1.5" => 1.5f; case "0.25" => 0.25; case "true" => true
          case "\"\"" => ""; case "1000" => 1000L
        }
        val grid0 = (n + c0 - 1) / c0
        val grid1 = if (twoD) (tShape + tChunk - 1) / tChunk else 1
        val omitted = (for { i <- 0 until grid0; j <- 0 until grid1
          if r.nextInt(7) == 0 } yield (i, j)).toSet
        for { gi <- 0 until grid0; gj <- 0 until grid1 } {
          if (!omitted.contains((gi, gj))) {
            val elems = c0 * (if (twoD) tChunk else 1)
            val buf = ByteBuffer.allocate(dt.width * elems)
              .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
            for { wi <- 0 until c0; wj <- 0 until (if (twoD) tChunk else 1) } {
              val row = gi * c0 + wi
              val colIdx = gj * tChunk + wj
              val inBounds = row < n && (!twoD || colIdx < tShape)
              val v = if (!inBounds) fillRaw
                else vals(row * rowElems + (if (twoD) colIdx else 0))
              dt.put(buf, v)
            }
            var bytes = buf.array()
            if (useDelta) bytes = deltaEnc(dt.width, le)(bytes)
            if (useShuffle) bytes = shuffleEnc(dt.width)(bytes)
            if (usePackbits) bytes = packbitsEnc(bytes)
            val key = if (twoD) s"$gi$sep$gj" else gi.toString
            val p = adir.resolve(key) // "/"-separated keys are nested dirs
            java.nio.file.Files.createDirectories(p.getParent)
            java.nio.file.Files.write(p, compress(bytes))
          }
        }

        // decode through the scan stack and compare element-for-element
        val meta = ZarrMeta.parseArrayV2("v", "v", doc)
        val store = new ZarrStore(dir, new org.apache.hadoop.conf.Configuration())
        val ctx = s"case $case0 ($typestr filters=$filterJson comp=$compJson " +
          s"grid=${shapeJson}/${chunkJson} sep=$sep omitted=${omitted.size})"
        var ci = -1L; var chunk: ColumnChunk = null
        def leafWant(row: Int, colIdx: Int): Any = {
          val gi = row / c0
          val gj = if (twoD) colIdx / tChunk else 0
          if (omitted.contains((gi, gj))) dt.expect(fillRaw)
          else dt.expect(vals(row * rowElems + colIdx))
        }
        (0 until n).foreach { row =>
          if (row / c0 != ci) { ci = row / c0; chunk = ZarrCodecs.fetchChunk(store, meta, ci) }
          if (!twoD) assertValEq(chunk.get(row % c0), leafWant(row, 0), s"$ctx row $row")
          else {
            val ad = chunk.get(row % c0)
              .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            val leafDt = ZarrSchema.catalystType(meta.dtype)
            (0 until tShape).foreach { j =>
              assertValEq(ad.get(j, leafDt), leafWant(row, j), s"$ctx row $row col $j")
            }
          }
        }

        // every 16th case: the full DSv2 read path over the same store
        if (case0 % 16 == 0 && !isRawS) {
          val df = spark.read.format("zarr").load(dir)
          assert(df.count() == n, s"$ctx full-path count")
        }
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
