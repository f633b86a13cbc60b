package graft.zarr

import scala.collection.mutable

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/**
 * k-D (k ≥ 2) Zarr array → table-row assembly.
 *
 * The table model maps dimension 0 to the row axis; a row's value is the
 * C-order block over the trailing dims, surfaced as a (nested) Catalyst
 * `ArrayData`. Neither the reference (src/schema.rs:16-41 walks only 1-D
 * children) nor earlier rounds of this repo read n-D stores, yet real-world
 * Zarr is overwhelmingly n-D — this is the extension a user pointing
 * `format("zarr")` at a climate grid or an image stack hits first.
 *
 * Layout handling:
 *
 *  - Chunk objects are full `chunk_shape` blocks in C order (edge chunks
 *    are stored full-size, fill-padded — both v2 and v3). Each object
 *    decodes through the SAME byte-stream/terminal codec pipeline as 1-D
 *    chunks ([[ZarrCodecs.decodeChunk]] with an element-space view of the
 *    metadata whose `chunkLength` is the chunk's total element count).
 *  - FAST PATH (trailing dims unchunked — `chunks(j) == shape(j)` for
 *    j ≥ 1, what our own write path emits and the common layout for
 *    row-record data): a row's elements are one contiguous run of the
 *    single chunk object; innermost vectors are built with primitive-array
 *    slices (zero boxing for fixed-width numerics).
 *  - GENERAL PATH (trailing dims chunked — climate-style grids): every row
 *    spans every trailing-grid cell, so the assembler fetches each cell's
 *    chunk object for the current dim-0 chunk once (memoized for the
 *    task's lifetime of that dim-0 chunk) and gathers elements by C-order
 *    index math. Memory is one dim-0 chunk-row slab (`chunk_rows ×
 *    row_elems` elements) — the same slab a 1-D reader of an equivalent
 *    flattened layout would hold.
 *
 * Partition planning, LIMIT, COUNT(*), and the stats sidecar all key off
 * dim 0 and are untouched; rows are visited in ascending order so each
 * chunk object is fetched and decoded exactly once per task.
 */
object ZarrNd {

  /** All chunk data needed for the rows of dim-0 chunk `ci`, exposed with
   *  the 1-D [[ColumnChunk]] contract: `get(r)` = row r's (nested) array. */
  def fetchRowChunk(store: ZarrStore, meta: ZarrArrayMeta, ci: Long): ColumnChunk = {
    // element-space view: same codecs/dtype/fill, chunkLength = elements
    // per chunk OBJECT (validated ≤ Int.MaxValue at parse)
    val elementMeta = meta.copy(
      chunkLength = meta.chunkElems, trailingShape = Nil, trailingChunk = Nil)
    val rowElems = meta.rowElems.toInt
    val trailingDims = meta.trailingShape.map(_.toInt).toArray
    val unchunkedTrailing = meta.trailingShape == meta.trailingChunk

    if (unchunkedTrailing) {
      val chunk = ZarrCodecs.decodeChunk(
        store.readBytesIfExists(meta.chunkPathNd(ci, meta.trailingChunk.map(_ => 0L))),
        elementMeta)
      new ColumnChunk {
        val length = meta.chunkLength.toInt
        def get(r: Int): Any = nestContiguous(chunk, r * rowElems, trailingDims, 0)
        // columnar path: each row's whole element block is one contiguous
        // run of the decoded chunk, so the leaf level lands in the child
        // vector via the element chunk's BULK writeTo (single primitive
        // memcopies for fixed-width dtypes), with only the per-level
        // putArray offset bookkeeping on top
        override def writeTo(vec: WCV, destPos: Int, srcPos: Int, n: Int): Unit = {
          var i = 0
          while (i < n) {
            putContiguousRow(vec, destPos + i, chunk, (srcPos + i) * rowElems,
              trailingDims, 0)
            i += 1
          }
        }
        override def close(): Unit = chunk.close()
      }
    } else {
      val chunkDims = meta.trailingChunk.map(_.toInt).toArray
      val gridCounts = meta.trailingChunkCounts.map(_.toInt).toArray
      val k = trailingDims.length
      // memo holds every trailing cell of THIS dim-0 chunk: a row spans the
      // whole trailing space, so all cells are needed for every row. The
      // total is the row slab (chunkLength × rowElems elements), bounded at
      // parse time exactly like a single decoded chunk.
      val memo = mutable.LongMap.empty[ColumnChunk]
      def cellChunk(cellId: Long, cell: Array[Long]): ColumnChunk =
        memo.getOrElseUpdate(cellId, ZarrCodecs.decodeChunk(
          store.readBytesIfExists(meta.chunkPathNd(ci, cell.toSeq)), elementMeta))
      val lastDim = k - 1
      val outerDims = trailingDims.take(lastDim) // dims 1..k-1 of the row block
      val leafDt = ZarrSchema.catalystType(meta.dtype)
      new ColumnChunk {
        val length = meta.chunkLength.toInt
        // columnar path: gather the row (same code as `get`), then unfold
        // the nested ArrayData into the vector tree
        override def writeTo(vec: WCV, destPos: Int, srcPos: Int, n: Int): Unit = {
          var i = 0
          while (i < n) {
            putArrayData(vec, destPos + i,
              get(srcPos + i).asInstanceOf[ArrayData], leafDt, trailingDims.length)
            i += 1
          }
        }
        def get(r: Int): Any = {
          // gather the row's elements as CONTIGUOUS RUNS along the last
          // trailing dim: per (outer coordinate, last-dim cell) the cell id
          // and base in-chunk offset are computed once, then a tight loop
          // copies the run — cell/offset math is per RUN, not per element
          val flat = new Array[Any](rowElems)
          val outer = new Array[Int](math.max(lastDim, 1))
          val cell = new Array[Long](k)
          val nOuter = if (lastDim == 0) 1 else outerDims.product
          var flatBase = 0
          var o = 0
          while (o < nOuter) {
            // cell coords + within-cell offset contribution of the outer dims
            var cellIdOuter = 0L
            var offOuter = r.toLong
            var j = 0
            while (j < lastDim) {
              val t = outer(j) / chunkDims(j)
              cell(j) = t
              cellIdOuter = cellIdOuter * gridCounts(j) + t
              offOuter = offOuter * chunkDims(j) + (outer(j) - t * chunkDims(j))
              j += 1
            }
            // walk the last dim cell by cell, copying each contiguous run
            var x = 0
            while (x < trailingDims(lastDim)) {
              val t = x / chunkDims(lastDim)
              cell(lastDim) = t
              val run = math.min(chunkDims(lastDim) - (x - t * chunkDims(lastDim)),
                trailingDims(lastDim) - x)
              val chunk = cellChunk(cellIdOuter * gridCounts(lastDim) + t, cell)
              val off = (offOuter * chunkDims(lastDim) +
                (x - t * chunkDims(lastDim))).toInt
              var i = 0
              while (i < run) { flat(flatBase + x + i) = chunk.get(off + i); i += 1 }
              x += run
            }
            // odometer increment of the outer coordinates
            var d = lastDim - 1
            while (d >= 0 && { outer(d) += 1
              if (outer(d) == trailingDims(d)) { outer(d) = 0; true } else false })
              d -= 1
            flatBase += trailingDims(lastDim)
            o += 1
          }
          nestBoxed(flat, trailingDims, 0, 0, rowElems)
        }
        override def close(): Unit = memo.values.foreach(_.close())
      }
    }
  }

  private type WCV = org.apache.spark.sql.execution.vectorized.WritableColumnVector

  /** Write one row's CONTIGUOUS element block into an array-typed vector at
   *  `destPos`: intermediate levels are putArray offset entries over the
   *  child vector (cursor = the child's elementsAppended, the bookkeeping
   *  Spark's own nested readers use); the leaf level is the element chunk's
   *  bulk [[ColumnChunk.writeTo]]. */
  private def putContiguousRow(vec: WCV, destPos: Int, chunk: ColumnChunk,
      base: Int, dims: Array[Int], level: Int): Unit = {
    val child = vec.arrayData()
    val off = child.getElementsAppended
    val n = dims(level)
    if (level == dims.length - 1) {
      child.reserve(off + n)
      chunk.writeTo(child, off, base, n)
      child.addElementsAppended(n)
    } else {
      var stride = 1
      var j = level + 1
      while (j < dims.length) { stride *= dims(j); j += 1 }
      child.reserve(off + n)
      var i = 0
      while (i < n) {
        putContiguousRow(child, off + i, chunk, base + i * stride, dims, level + 1)
        i += 1
      }
      child.addElementsAppended(n)
    }
    vec.putArray(destPos, off, n)
  }

  /** Write a (possibly nested) ArrayData into an array-typed vector at
   *  `destPos` — the general (gathered) path's columnar write. */
  private def putArrayData(vec: WCV, destPos: Int, a: ArrayData,
      leafDt: org.apache.spark.sql.types.DataType, depth: Int): Unit = {
    val child = vec.arrayData()
    val off = child.getElementsAppended
    val n = a.numElements()
    child.reserve(off + n)
    if (depth == 1) {
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) child.putNull(off + i)
        else ZarrCodecs.writeValue(child, off + i, a.get(i, leafDt))
        i += 1
      }
    } else {
      var i = 0
      while (i < n) { putArrayData(child, off + i, a.getArray(i), leafDt, depth - 1); i += 1 }
    }
    child.addElementsAppended(n)
    vec.putArray(destPos, off, n)
  }

  /** Nested ArrayData over a CONTIGUOUS element run of one decoded chunk:
   *  dims(level..) describe the remaining trailing shape under `base`. */
  private def nestContiguous(chunk: ColumnChunk, base: Int,
      dims: Array[Int], level: Int): ArrayData =
    if (level == dims.length - 1) chunk.sliceArray(base, dims(level))
    else {
      val n = dims(level)
      var stride = 1
      var j = level + 1
      while (j < dims.length) { stride *= dims(j); j += 1 }
      val out = new Array[Any](n)
      var i = 0
      while (i < n) { out(i) = nestContiguous(chunk, base + i * stride, dims, level + 1); i += 1 }
      new GenericArrayData(out)
    }

  /** Nested ArrayData over a flat boxed row gathered by the general path. */
  private def nestBoxed(flat: Array[Any], dims: Array[Int], level: Int,
      from: Int, count: Int): ArrayData =
    if (level == dims.length - 1)
      if (from == 0 && count == flat.length) new GenericArrayData(flat) // 2-D: zero copy
      else new GenericArrayData(java.util.Arrays.copyOfRange(
        flat.asInstanceOf[Array[AnyRef]], from, from + count))
    else {
      val n = dims(level)
      val stride = count / n
      val out = new Array[Any](n)
      var i = 0
      while (i < n) { out(i) = nestBoxed(flat, dims, level + 1, from + i * stride, stride); i += 1 }
      new GenericArrayData(out)
    }
}
