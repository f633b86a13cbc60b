package graft.zarr

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/**
 * Zarr v3 metadata model + parser.
 *
 * Parses the `zarr.json` documents of a Zarr v3 store: group nodes and 1-D
 * array nodes with a regular chunk grid and default chunk-key encoding.
 * Mirrors the metadata surface the reference consumes through the `zarrs`
 * crate (reference: src/table_provider.rs:107-113, src/schema.rs:56-125),
 * re-derived here from the public Zarr v3 spec.
 *
 * Everything in this file is plain-`Serializable` so array metadata can ride
 * inside Spark `InputPartition`s to executors.
 */
sealed trait ZarrType extends Serializable {
  /** Fixed encoded byte width per element, or -1 for variable-length. */
  def byteSize: Int
}
object ZarrType {
  case object ZBool    extends ZarrType { val byteSize = 1 }
  case object ZInt8    extends ZarrType { val byteSize = 1 }
  case object ZInt16   extends ZarrType { val byteSize = 2 }
  case object ZInt32   extends ZarrType { val byteSize = 4 }
  case object ZInt64   extends ZarrType { val byteSize = 8 }
  case object ZUInt8   extends ZarrType { val byteSize = 1 }
  case object ZUInt16  extends ZarrType { val byteSize = 2 }
  case object ZUInt32  extends ZarrType { val byteSize = 4 }
  case object ZUInt64  extends ZarrType { val byteSize = 8 }
  case object ZFloat16 extends ZarrType { val byteSize = 2 }
  case object ZFloat32 extends ZarrType { val byteSize = 4 }
  case object ZFloat64 extends ZarrType { val byteSize = 8 }
  case object ZString  extends ZarrType { val byteSize = -1 }
  /** provisional v3 `bytes` dtype: variable-length binary (vlen-bytes codec). */
  case object ZBytes   extends ZarrType { val byteSize = -1 }
  /** `r*` raw-bits type; `bits` must be a multiple of 8. */
  final case class ZRaw(bits: Int) extends ZarrType { val byteSize = bits / 8 }
  /** numpy.datetime64 with unit in {s, ms, us, ns} and a scale factor. */
  final case class ZDatetime64(unit: String, scaleFactor: Long) extends ZarrType { val byteSize = 8 }
}

/** One codec in a Zarr v3 codec chain. Applied last-to-first on read. */
sealed trait ZarrCodec extends Serializable
object ZarrCodec {
  final case class BytesCodec(littleEndian: Boolean) extends ZarrCodec
  case object VlenUtf8Codec extends ZarrCodec
  case object VlenBytesCodec extends ZarrCodec
  final case class ZstdCodec(level: Int, checksum: Boolean) extends ZarrCodec
  final case class GzipCodec(level: Int) extends ZarrCodec
  /** numcodecs `zlib` (Zarr v2 compressor): RFC-1950 zlib framing, unlike
   *  the v3 `gzip` codec's RFC-1952 wrapper. */
  case object ZlibCodec extends ZarrCodec
  /** crc32c appends a 4-byte checksum; on read we verify+strip. */
  case object Crc32cCodec extends ZarrCodec
  /** numcodecs `lz4` (Zarr v2 compressor): a u32-LE original-size header
   *  followed by ONE raw LZ4 block — distinct from blosc's lz4 (blosc1
   *  frame) and from the LZ4 frame format. */
  case object Lz4Codec extends ZarrCodec
  /** numcodecs `bz2` (Zarr v2 compressor): a standard bzip2 stream. */
  case object Bz2Codec extends ZarrCodec
  /** numcodecs `lzma` with format=FORMAT_XZ (its default): an .xz stream. */
  case object XzCodec extends ZarrCodec
  /** numcodecs `packbits` filter (bool arrays only): 1 header byte holding
   *  `n % 8` (leftover bits in the final packed byte, 0 = none), then
   *  MSB-first `np.packbits` output. */
  case object PackBitsCodec extends ZarrCodec
  /** numcodecs `delta` filter: element-wise differences in the dtype's own
   *  arithmetic (first element stored verbatim); decode is a running prefix
   *  sum over the fixed-width buffer. `width`/`littleEndian`/`float` come
   *  from the filter's dtype typestr, validated against the array dtype at
   *  parse time (an `astype` differing from `dtype` is rejected — decoding
   *  it would need a numpy cast table we don't carry). */
  final case class DeltaCodec(width: Int, littleEndian: Boolean,
      float: Boolean) extends ZarrCodec
  /** numcodecs `shuffle` filter: standalone byte-shuffle with a fixed
   *  element size (the same plane transform blosc applies inside its frame,
   *  without any framing). Ragged tail bytes are stored verbatim, the
   *  c-blosc convention. */
  final case class ShuffleCodec(elementSize: Int) extends ZarrCodec
  /** Terminal codec for numpy fixed-width unicode (`<U5`): each element is
   *  exactly `units` UTF-32 code units, trailing NULs trimmed. Only
   *  produced by the v2 parser; the array dtype stays ZString so schema,
   *  stats, and pruning treat decoded values as ordinary strings. */
  final case class FixedUnicodeCodec(units: Int, littleEndian: Boolean)
      extends ZarrCodec
  /**
   * Blosc1 frame (the zarr-python default compressor; v3 codec name
   * "blosc"). The frame header is self-describing, so decode ignores this
   * configuration; it's carried for the write side and for validation.
   * shuffle ∈ {noshuffle, shuffle, bitshuffle} per the public v3 codec spec.
   */
  final case class BloscCodec(
      cname: String, clevel: Int, shuffle: String, typesize: Int,
      blocksize: Int) extends ZarrCodec
  /**
   * Zarr v3 `sharding_indexed` (public sharding codec spec): one stored
   * object holds a whole grid cell of INNER chunks plus a binary index of
   * (offset: u64 LE, nbytes: u64 LE) per inner chunk — the object-store
   * layout for huge arrays (fewer objects, range reads). The array's
   * `chunk_grid` chunk_shape is the SHARD shape; `innerChunk` is the inner
   * chunk shape; `indexCodecs` encode the index (typically bytes+crc32c);
   * missing inner chunks are (2^64-1, 2^64-1) → fill value.
   */
  final case class ShardingCodec(
      innerChunk: Long,
      innerCodecs: Seq[ZarrCodec],
      indexCodecs: Seq[ZarrCodec],
      indexAtEnd: Boolean) extends ZarrCodec
}

/** Metadata of one Zarr array (= one table column).
 *
 *  The table model maps dimension 0 to the ROW axis; a k-D array (k ≥ 2,
 *  C-order) contributes one column whose value is the trailing-dims block of
 *  each row — `ArrayType(element)` for 2-D, nested for deeper ranks. Rows,
 *  chunk partitioning, LIMIT, and COUNT(*) all remain dim-0 concepts;
 *  `trailingShape`/`trailingChunk` describe dims 1..k-1 (empty for 1-D). */
final case class ZarrArrayMeta(
    name: String,        // column name (array path minus group prefix)
    path: String,        // store-relative array dir, e.g. "meta/date"
    length: Long,        // shape(0) — the row count
    chunkLength: Long,   // regular chunk_grid chunk_shape(0) — rows per chunk
    dtype: ZarrType,
    codecs: Seq[ZarrCodec],
    separator: String,   // chunk-key separator, "/" or "."
    fillValueJson: String, // raw JSON text of fill_value (decoded lazily)
    v2Keys: Boolean = false, // "v2" chunk_key_encoding: bare <i>, no "c" prefix
    attrsJson: String = null, // raw user attributes JSON (v3 `attributes` /
                             // v2 `.zattrs`), null = none — surfaced as
                             // Spark column metadata
    trailingShape: Seq[Long] = Nil, // shape(1..) for k-D arrays, [] for 1-D
    trailingChunk: Seq[Long] = Nil  // chunk shape along the trailing dims
) extends Serializable {
  def rank: Int = 1 + trailingShape.length
  /** Elements per ROW: the product of the trailing dims (1 for 1-D). */
  def rowElems: Long = trailingShape.product
  /** Elements per stored CHUNK OBJECT (edge chunks are stored full-size). */
  def chunkElems: Long = chunkLength * trailingChunk.product
  /** Chunk-grid extent along each trailing dim. */
  def trailingChunkCounts: Seq[Long] =
    trailingShape.lazyZip(trailingChunk).map((s, c) => (s + c - 1) / c)
  def numChunks: Long = if (length == 0) 0 else (length + chunkLength - 1) / chunkLength
  /** Store-relative path of chunk i under the array's chunk-key encoding. */
  def chunkPath(i: Long): String =
    if (v2Keys) s"$path/$i" else s"$path/c$separator$i"
  /** Chunk path of the (dim-0 index, trailing indices) grid cell of a k-D
   *  array: v3 default keys are `c<sep>i<sep>j…`; v2 keys are `i<sep>j…`
   *  (sep "." for real v2 stores). */
  def chunkPathNd(i: Long, trailing: Seq[Long]): String = {
    val idx = (i +: trailing).mkString(separator)
    if (v2Keys) s"$path/$idx" else s"$path/c$separator$idx"
  }
}

/** Errors raised by the Zarr reader (reference: src/error.rs:4-42). */
final class ZarrException(msg: String, cause: Throwable = null) extends RuntimeException(msg, cause)

object ZarrMeta {
  private val mapper = new ObjectMapper()

  def parseJson(text: String): JsonNode = mapper.readTree(text)

  def isGroup(node: JsonNode): Boolean =
    node.path("node_type").asText() == "group"

  /** Normalize a user-attributes node to its raw JSON, or null when absent/
   *  empty/malformed — the ONE definition behind every read path (v3
   *  inline, consolidated v2, listed `.zattrs`), so consolidated and
   *  listed resolution of the same store can never disagree. */
  def attrsJsonOf(node: JsonNode): String =
    if (node != null && node.isObject && node.size() > 0) node.toString else null

  /** A hostile/corrupt metadata document with `chunks: [0]` reaches
   *  `numChunks` as a divide-by-zero, and a negative chunk length turns
   *  every decoded-size bound negative so each chunk fails with a
   *  misleading "decodes past its bound" — reject both up front with the
   *  same typed rejection every other hostile field gets. */
  private def validateDims(length: Long, chunkLength: Long, path: String): Unit = {
    if (length < 0)
      throw new ZarrException(s"negative array shape $length at $path")
    if (chunkLength <= 0)
      throw new ZarrException(s"non-positive chunk shape $chunkLength at $path")
  }

  /** Shared tail of the v3/v2 array parsers for rank ≥ 2: read + validate
   *  the trailing dims and bound the per-chunk / per-row element counts
   *  (decode materializes one chunk object; a row must fit one ArrayData). */
  private def parseTrailing(shapeAt: Int => Long, chunkAt: Int => Long,
      rank: Int, chunkLen: Long, path: String): (Seq[Long], Seq[Long]) = {
    val ts = (1 until rank).map(shapeAt)
    val tc = (1 until rank).map(chunkAt)
    ts.lazyZip(tc).foreach((s, c) => validateDims(s, c, path))
    // overflow-safe products: dims are positive (validated above)
    var chunkElems = chunkLen
    var rowElems = 1L
    ts.lazyZip(tc).foreach { (s, c) =>
      chunkElems = if (chunkElems > Long.MaxValue / c) Long.MaxValue else chunkElems * c
      val s1 = math.max(s, 1)
      rowElems = if (rowElems > Long.MaxValue / s1) Long.MaxValue else rowElems * s1
    }
    if (chunkElems > Int.MaxValue - 8)
      throw new ZarrException(
        s"chunk grid of $chunkElems elements per chunk object cannot be " +
          s"decoded as one in-memory chunk at $path — re-chunk the array")
    if (rowElems > Int.MaxValue - 8)
      throw new ZarrException(
        s"rows of $rowElems elements exceed the maximum array column size at $path")
    // the row-SLAB bound: producing the rows of one dim-0 chunk requires
    // every trailing cell of that chunk in memory at once (a row spans the
    // whole trailing space), and cells are WHOLE decoded chunks — each
    // trailing dim rounds UP to a chunk multiple (shape 1025 with chunk
    // 1024 materializes 2048). Bound the chunk-rounded product like a
    // single decoded chunk, or a grid whose individual dims all pass would
    // still OOM an executor the moment one row is read.
    var slabTrailing = 1L
    ts.lazyZip(tc).foreach { (s, c) =>
      val rounded = ((s + c - 1) / c) * c
      slabTrailing = if (slabTrailing > Long.MaxValue / math.max(rounded, 1)) Long.MaxValue
        else slabTrailing * math.max(rounded, 1)
    }
    val slabElems =
      if (chunkLen > (Int.MaxValue - 8) / math.max(slabTrailing, 1)) Long.MaxValue
      else chunkLen * slabTrailing
    if (slabElems > Int.MaxValue - 8)
      throw new ZarrException(
        s"reading one dim-0 chunk of this grid needs $chunkLen × $slabTrailing " +
          s"decoded elements in memory at $path — use a smaller dim-0 chunk size")
    (ts, tc)
  }

  /** Parse one array `zarr.json`. `path` is the store-relative array dir. */
  def parseArray(path: String, name: String, text: String): ZarrArrayMeta = {
    val n = parseJson(text)
    require(n.path("zarr_format").asInt() == 3, s"only Zarr v3 supported, at $path")
    require(n.path("node_type").asText() == "array", s"not an array node: $path")
    val shape = n.path("shape")
    val rank = shape.size()
    if (rank < 1)
      throw new ZarrException(s"array with empty shape at $path")
    val grid = n.path("chunk_grid")
    if (grid.path("name").asText() != "regular")
      throw new ZarrException(s"unsupported chunk_grid '${grid.path("name").asText()}' at $path")
    val chunkShape = grid.path("configuration").path("chunk_shape")
    if (chunkShape.size() != rank)
      throw new ZarrException(s"chunk_shape rank must match shape rank at $path")
    validateDims(shape.get(0).asLong(), chunkShape.get(0).asLong(), path)
    val (trailingShape, trailingChunk) =
      if (rank == 1) (Nil, Nil)
      else parseTrailing(i => shape.get(i).asLong(), i => chunkShape.get(i).asLong(),
        rank, chunkShape.get(0).asLong(), path)
    val cke = n.path("chunk_key_encoding")
    // "default": keys are c<sep><i> (sep defaults "/"); "v2" (zarr-v2
    // migrated stores): bare <i> keys, no "c" prefix (sep, default ".",
    // only separates indices of multi-dim arrays — moot for 1-D)
    var v2Keys = false
    val sep = cke.path("name").asText() match {
      case "default" | "" =>
        val s = cke.path("configuration").path("separator").asText()
        if (s.isEmpty) "/" else s
      case "v2" =>
        v2Keys = true
        val s = cke.path("configuration").path("separator").asText()
        if (s.isEmpty) "." else s
      case other => throw new ZarrException(s"unsupported chunk_key_encoding '$other' at $path")
    }
    val codecs = parseCodecs(n.path("codecs"), path, rank)
    if (rank > 1 && codecs.exists(_.isInstanceOf[ZarrCodec.ShardingCodec]))
      throw new ZarrException(
        s"sharding_indexed on a $rank-D array is not supported at $path " +
          "(shard the row dimension of a 1-D layout instead)")
    ZarrArrayMeta(
      name = name,
      path = path,
      length = shape.get(0).asLong(),
      chunkLength = chunkShape.get(0).asLong(),
      dtype = parseDType(n.path("data_type"), path),
      codecs = codecs,
      separator = sep,
      fillValueJson = n.path("fill_value").toString,
      v2Keys = v2Keys,
      attrsJson = attrsJsonOf(n.path("attributes")),
      trailingShape = trailingShape,
      trailingChunk = trailingChunk
    )
  }

  /**
   * Parse one Zarr v2 `.zarray` document (the majority format of public
   * stores in the wild; the reference is v3-only, so this is extension, not
   * parity). v2 maps onto the same [[ZarrArrayMeta]] model:
   *
   *  - chunk keys are the bare index (`<path>/<i>` for 1-D) — exactly the
   *    existing `v2Keys` layout;
   *  - `dtype` is a numpy typestr (`<i8`, `>f4`, `|b1`, `|O`, `<M8[ms]`…):
   *    the byteorder char becomes the BytesCodec endianness;
   *  - `filters`: only the vlen ones are meaningful for 1-D tables —
   *    `vlen-utf8`/`vlen-bytes` (numcodecs framing with its u32 element-
   *    count header, which [[ZarrCodecs]] already auto-detects);
   *  - `compressor`: a numcodecs object — blosc (self-describing frame),
   *    zstd, zlib (RFC-1950 — distinct from v3 gzip), gzip;
   *  - `order`: C and F are identical for 1-D; both accepted there. k-D
   *    arrays must be C-order (the row-block assembly math is C-order).
   */
  def parseArrayV2(path: String, name: String, text: String): ZarrArrayMeta = {
    import ZarrCodec._
    val n = parseJson(text)
    require(n.path("zarr_format").asInt() == 2, s"not a Zarr v2 array at $path")
    val shape = n.path("shape")
    val rank = shape.size()
    if (rank < 1)
      throw new ZarrException(s"array with empty shape at $path")
    val chunks = n.path("chunks")
    if (chunks.size() != rank)
      throw new ZarrException(s"chunks rank must match shape rank at $path")
    validateDims(shape.get(0).asLong(), chunks.get(0).asLong(), path)
    val (trailingShape, trailingChunk) =
      if (rank == 1) (Nil, Nil)
      else parseTrailing(i => shape.get(i).asLong(), i => chunks.get(i).asLong(),
        rank, chunks.get(0).asLong(), path)
    val order = n.path("order").asText("C")
    if (order != "C" && (order != "F" || rank > 1)) // F flips the layout for k-D
      throw new ZarrException(s"unsupported order '$order' for $rank-D array at $path")
    val typestr = n.path("dtype").asText()
    val pd = parseDTypeV2(typestr, path)
    val dtype = pd.dtype
    val littleEndian = pd.littleEndian
    val chunkElemCount = chunks.get(0).asLong() * trailingChunk.product
    // the chunk's decoded byte size when the dtype is fixed-width — the
    // bound hostile filter/codec parameters are validated against
    val chunkByteSize: Option[Long] = pd.unicodeUnits match {
      case Some(u) => Some(chunkElemCount * 4L * u)
      case None if dtype != null && dtype.byteSize > 0 =>
        Some(chunkElemCount * dtype.byteSize)
      case None => None
    }
    val filters = n.path("filters")
    val filterCodecs: Seq[ZarrCodec] =
      if (filters.isNull || filters.isMissingNode) Seq.empty
      else {
        val it = filters.elements()
        val out = Seq.newBuilder[ZarrCodec]
        while (it.hasNext) {
          val f = it.next()
          f.path("id").asText() match {
            case "vlen-utf8"  => out += VlenUtf8Codec
            case "vlen-bytes" => out += VlenBytesCodec
            case "delta"      => out += parseDeltaV2(f, dtype, littleEndian, path)
            case "shuffle" =>
              val es = f.path("elementsize").asInt(4) // numcodecs default
              // upper bound too: a forged elementsize in the billions makes
              // the unshuffle plane loop spin ~elementsize times per chunk
              // (nel=0) — a metadata-driven CPU DoS on foreign stores. The
              // 64-byte floor keeps legitimate tiny-chunk stores readable:
              // numcodecs' default elementsize 4 on a 2-byte chunk decodes
              // fine (nel=0 → verbatim), so it must not be rejected
              if (es < 1 ||
                  es > math.max(64L, chunkByteSize.getOrElse(1L << 20)))
                throw new ZarrException(s"shuffle filter elementsize $es at $path")
              out += ShuffleCodec(es)
            case "packbits" =>
              if (dtype != ZarrType.ZBool)
                throw new ZarrException(
                  s"packbits filter is bool-only, array dtype is '$typestr' at $path")
              out += PackBitsCodec
            case other => throw new ZarrException(s"unsupported v2 filter '$other' at $path")
          }
        }
        out.result()
      }
    // object dtype carries its real type in the vlen filter
    val resolved = dtype match {
      case null =>
        if (filterCodecs.contains(VlenUtf8Codec)) ZarrType.ZString
        else if (filterCodecs.contains(VlenBytesCodec)) ZarrType.ZBytes
        else throw new ZarrException(
          s"v2 object dtype '|O' needs a vlen-utf8 or vlen-bytes filter at $path")
      case dt => dt
    }
    val comp = n.path("compressor")
    val compCodec: Seq[ZarrCodec] =
      if (comp.isNull || comp.isMissingNode) Seq.empty
      else comp.path("id").asText() match {
        case "blosc" => Seq(BloscCodec(
          cname = comp.path("cname").asText("lz4"),
          clevel = comp.path("clevel").asInt(5),
          shuffle = comp.path("shuffle").asInt(1) match {
            case 0 => "noshuffle"
            case 2 => "bitshuffle"
            case _ => "shuffle" // 1, or -1 AUTOSHUFFLE (frame self-describes)
          },
          typesize = 0, blocksize = comp.path("blocksize").asInt(0)))
        case "zstd" => Seq(ZstdCodec(comp.path("level").asInt(0), checksum = false))
        case "zlib" => Seq(ZlibCodec)
        case "gzip" => Seq(GzipCodec(comp.path("level").asInt(5)))
        case "lz4"  => Seq(Lz4Codec) // `acceleration` only tunes encode speed
        case "bz2"  => Seq(Bz2Codec)
        case "lzma" =>
          // numcodecs LZMA: format 1 = FORMAT_XZ (its default). ALONE/RAW
          // formats would need the python lzma filter-chain model — reject.
          val fmt = comp.path("format").asInt(1)
          if (fmt != 1)
            throw new ZarrException(
              s"lzma compressor format $fmt not supported (only XZ=1) at $path")
          Seq(XzCodec)
        case other => throw new ZarrException(s"unsupported v2 compressor '$other' at $path")
      }
    val terminal: Seq[ZarrCodec] = pd.unicodeUnits match {
      case Some(u) => Seq(FixedUnicodeCodec(u, littleEndian))
      case None => resolved match {
        case ZarrType.ZString | ZarrType.ZBytes => Seq.empty // vlen filter is terminal
        case _ => Seq(BytesCodec(littleEndian))
      }
    }
    ZarrArrayMeta(
      name = name,
      path = path,
      length = shape.get(0).asLong(),
      chunkLength = chunks.get(0).asLong(),
      dtype = resolved,
      codecs = terminal ++ filterCodecs ++ compCodec,
      separator = n.path("dimension_separator").asText(".") match {
        case "/" => "/"
        case _   => "."
      },
      fillValueJson = n.path("fill_value").toString,
      v2Keys = true,
      trailingShape = trailingShape,
      trailingChunk = trailingChunk
    )
  }

  /** numpy typestr → (type, littleEndian); null type = object (`|O`),
   *  resolved from the vlen filter by the caller. */
  /** Parse a numcodecs `delta` filter config against the enclosing array's
   *  dtype. The stored buffer is typed by the filter's `dtype` (and
   *  `astype`, when present) — we only support the interoperable common
   *  case where all three agree on width, kind, and byte order; anything
   *  else would need numpy's cast semantics and is rejected loudly. */
  private def parseDeltaV2(f: JsonNode, arrayDtype: ZarrType,
      arrayLe: Boolean, path: String): ZarrCodec.DeltaCodec = {
    import ZarrType._
    val dts = f.path("dtype").asText("")
    if (dts.isEmpty)
      throw new ZarrException(s"delta filter missing dtype at $path")
    val fpd = parseDTypeV2(dts, path)
    val (fdt, fle) = (fpd.dtype, fpd.littleEndian)
    val (width, float) = fdt match {
      case ZInt8 | ZUInt8                  => (1, false)
      case ZInt16 | ZUInt16                => (2, false)
      case ZInt32 | ZUInt32                => (4, false)
      case ZInt64 | ZUInt64                => (8, false)
      case ZDatetime64(_, _)               => (8, false)
      case ZFloat32                        => (4, true)
      case ZFloat64                        => (8, true)
      case _ => // bool (no numeric difference), f2, O, S*, U*
        throw new ZarrException(s"unsupported delta filter dtype '$dts' at $path")
    }
    if (f.has("astype") && !f.path("astype").isNull) {
      val ats = f.path("astype").asText("")
      if (parseDTypeV2(ats, path) != fpd)
        throw new ZarrException(
          s"delta filter astype '$ats' != dtype '$dts' not supported at $path")
    }
    val arrayFloat = arrayDtype match {
      case ZFloat32 | ZFloat64 => true
      case _                   => false
    }
    if (arrayDtype == null || arrayDtype.byteSize != width ||
        arrayFloat != float || arrayLe != fle)
      throw new ZarrException(
        s"delta filter dtype '$dts' does not match array dtype at $path")
    ZarrCodec.DeltaCodec(width, fle, float)
  }

  /** A parsed numpy typestr: `dtype` is null for `|O` (object — the real
   *  type comes from a vlen filter); `unicodeUnits` is set for fixed-width
   *  unicode (`<U5` → ZString plus a FixedUnicodeCodec terminal). */
  private final case class V2DType(dtype: ZarrType, littleEndian: Boolean,
      unicodeUnits: Option[Int])

  /** Bounded parse of a typestr's width digits: the value is hostile on
   *  foreign stores, so an absurd width is a typed rejection, not a raw
   *  NumberFormatException or a gigabyte per-element allocation. */
  private def parseWidthV2(digits: String, typestr: String, path: String): Int = {
    // ≤7 digits can't overflow Int; the 1 MiB/element cap is far above any
    // real numpy fixed-width dtype
    if (digits.length > 7 || digits.toInt > (1 << 20))
      throw new ZarrException(s"v2 dtype '$typestr' width out of range at $path")
    digits.toInt
  }

  private def parseDTypeV2(typestr: String, path: String): V2DType = {
    import ZarrType._
    if (typestr.isEmpty) throw new ZarrException(s"missing v2 dtype at $path")
    val le = typestr.charAt(0) != '>'
    val body = if ("<>|=".contains(typestr.charAt(0))) typestr.substring(1) else typestr
    val t = body match {
      case "b1" => ZBool
      case "i1" => ZInt8
      case "i2" => ZInt16
      case "i4" => ZInt32
      case "i8" => ZInt64
      case "u1" => ZUInt8
      case "u2" => ZUInt16
      case "u4" => ZUInt32
      case "u8" => ZUInt64
      case "f2" => ZFloat16
      case "f4" => ZFloat32
      case "f8" => ZFloat64
      case "O"  => null
      case s if s.startsWith("M8[") && s.endsWith("]") =>
        s.stripPrefix("M8[").stripSuffix("]") match {
          case u @ ("s" | "ms" | "us" | "ns") => ZDatetime64(u, 1L)
          case other =>
            throw new ZarrException(s"unsupported v2 datetime64 unit '$other' at $path")
        }
      case s if s.startsWith("S") && s.drop(1).forall(_.isDigit) && s.length > 1 =>
        ZRaw(parseWidthV2(s.drop(1), typestr, path) * 8) // fixed-width bytes
      case s if s.startsWith("U") && s.drop(1).forall(_.isDigit) && s.length > 1 =>
        return V2DType(ZString, le,
          Some(parseWidthV2(s.drop(1), typestr, path))) // fixed-width UTF-32
      case other => throw new ZarrException(s"unsupported v2 dtype '$typestr' ($other) at $path")
    }
    V2DType(t, le, None)
  }

  /** Zarr v3 dtype → internal type. Rejections mirror reference src/schema.rs:89-122. */
  def parseDType(dt: JsonNode, path: String): ZarrType = {
    import ZarrType._
    if (dt.isTextual) {
      dt.asText() match {
        case "bool"    => ZBool
        case "int8"    => ZInt8
        case "int16"   => ZInt16
        case "int32"   => ZInt32
        case "int64"   => ZInt64
        case "uint8"   => ZUInt8
        case "uint16"  => ZUInt16
        case "uint32"  => ZUInt32
        case "uint64"  => ZUInt64
        case "float16" => ZFloat16
        case "float32" => ZFloat32
        case "float64" => ZFloat64
        case "string"  => ZString
        case "bytes"   => ZBytes
        case s if s.startsWith("complex") =>
          throw new ZarrException(s"complex data type '$s' not supported, at $path")
        case s if s.startsWith("r") && s.drop(1).forall(_.isDigit) =>
          val bits = s.drop(1).toInt
          if (bits % 8 != 0) throw new ZarrException(s"raw bits '$s' not byte-aligned, at $path")
          ZRaw(bits)
        case other =>
          throw new ZarrException(s"unsupported data type '$other' at $path")
      }
    } else {
      dt.path("name").asText() match {
        case "numpy.datetime64" =>
          val cfg = dt.path("configuration")
          val unit = cfg.path("unit").asText()
          val scale = if (cfg.has("scale_factor")) cfg.path("scale_factor").asLong() else 1L
          unit match {
            case "s" | "ms" | "us" | "ns" => ZDatetime64(unit, scale)
            case other =>
              throw new ZarrException(s"unsupported datetime64 unit '$other' at $path")
          }
        case other =>
          throw new ZarrException(s"unsupported extension data type '$other' at $path")
      }
    }
  }

  def parseCodecs(codecs: JsonNode, path: String, rank: Int = 1): Seq[ZarrCodec] = {
    import ZarrCodec._
    val it = codecs.elements()
    val out = Seq.newBuilder[ZarrCodec]
    while (it.hasNext) {
      val c = it.next()
      val cfg = c.path("configuration")
      c.path("name").asText() match {
        case "bytes"     => out += BytesCodec(cfg.path("endian").asText("little") == "little")
        case "vlen-utf8" => out += VlenUtf8Codec
        case "vlen-bytes" => out += VlenBytesCodec
        case "transpose" =>
          // only the identity permutation keeps the C-order layout the
          // decode math assumes; any real transposition is rejected typed
          val order = cfg.path("order")
          val identity = order.isArray && order.size() == rank &&
            (0 until rank).forall(i => order.get(i).asInt(-1) == i)
          if (!identity)
            throw new ZarrException(s"transpose codec with non-identity order at $path")
        case "zstd"      => out += ZstdCodec(cfg.path("level").asInt(0), cfg.path("checksum").asBoolean(false))
        case "gzip"      => out += GzipCodec(cfg.path("level").asInt(5))
        case "crc32c"    => out += Crc32cCodec
        case "blosc" =>
          out += BloscCodec(
            cname = cfg.path("cname").asText("lz4"),
            clevel = cfg.path("clevel").asInt(5),
            shuffle = cfg.path("shuffle").asText("noshuffle"),
            typesize = cfg.path("typesize").asInt(0),
            blocksize = cfg.path("blocksize").asInt(0))
        case "sharding_indexed" =>
          val inner = cfg.path("chunk_shape")
          if (inner.size() != 1)
            throw new ZarrException(s"only 1-D shard inner chunks supported at $path")
          out += ShardingCodec(
            innerChunk = inner.get(0).asLong(),
            innerCodecs = parseCodecs(cfg.path("codecs"), path),
            indexCodecs = parseCodecs(cfg.path("index_codecs"), path),
            indexAtEnd = cfg.path("index_location").asText("end") == "end")
        case other       => throw new ZarrException(s"unsupported codec '$other' at $path")
      }
    }
    out.result()
  }
}
