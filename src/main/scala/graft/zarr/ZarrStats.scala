package graft.zarr

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/**
 * Per-chunk column statistics sidecar (`_graft_stats.json`, stored next to
 * the group's `zarr.json`).
 *
 * Zarr v3 metadata carries no chunk statistics, which is why the reference
 * (and round-2 us) declined filter pushdown entirely — a pushed filter could
 * never skip I/O. But OUR write path owns chunk layout, so it can record
 * min/max/null-count per chunk per column at encode time for near-zero cost,
 * and the scan can then prune whole chunk ranges from pushed filters the way
 * Parquet prunes row groups. At 100 TB this is the difference between
 * scanning everything and scanning the chunks a selective predicate touches.
 *
 * Safety model:
 *  - Stats are written atomically with the table commit (same job writes
 *    both; a reader never sees stats for a half-written table because
 *    readers key off `zarr.json`).
 *  - The scan treats stats as advisory: every pushed filter is ALSO returned
 *    to Spark as a residual, so a MISSING sidecar only costs performance,
 *    and structural corruption degrades safely — a sidecar whose chunk grid
 *    doesn't match the array metadata is ignored outright, and any failure
 *    while evaluating stat values keeps the range (no pruning, no error).
 *  - LIMIT of the model (same one Delta/Iceberg stats carry): residual
 *    filters cannot resurrect rows in a range the stats "proved" empty, so
 *    stats that are WRONG-but-well-formed cause silent row loss. The grid
 *    check catches appends/truncations, but an equal-length in-place chunk
 *    rewrite by a foreign writer (`z[:] = new_values` in zarr-python) is
 *    undetectable. The contract: a store's sidecar is trusted only while
 *    the store is mutated exclusively through graft writers (which always
 *    rewrite it); after foreign mutation, delete `_graft_stats.json` —
 *    scans then run unpruned and correct.
 *  - min/max are stored over non-null values; `nulls` counts nulls, so
 *    IsNull/IsNotNull can prune too. Values serialize as strings (exact for
 *    integers; `Double.toString` round-trips for floats; raw for strings).
 */
final case class ColumnChunkStats(
    min: Array[String],  // per chunk; null entry = chunk has no non-null value
    max: Array[String],
    nulls: Array[Long]) extends Serializable

final case class StoreChunkStats(
    chunkRows: Long,
    nChunks: Int,
    totalRows: Long,
    columns: Map[String, ColumnChunkStats],
    /** Per-chunk geometry envelopes for geo-typed WKT columns:
     *  column → per-chunk [minx, miny, maxx, maxy] (null entry = envelope
     *  unknown → keep). Union over the chunk's PARSEABLE geometries — sound
     *  because a row whose WKT yields no envelope can never satisfy
     *  `bbox_intersects` (it evaluates false), so it constrains nothing. */
    envelopes: Map[String, Array[Array[Double]]] = Map.empty) extends Serializable {

  /** Rows physically present in chunk i (last chunk may be short). */
  def rowsInChunk(i: Int): Long =
    if (i == nChunks - 1) totalRows - (nChunks - 1).toLong * chunkRows else chunkRows
}

object ZarrStats {
  val FileName = "_graft_stats.json"
  private val mapper = new ObjectMapper()

  def relPath(group: String): String = {
    val rel = group.stripPrefix("/").stripSuffix("/")
    if (rel.isEmpty) FileName else s"$rel/$FileName"
  }

  def toJson(s: StoreChunkStats): String = {
    val root = mapper.createObjectNode()
    root.put("chunk_rows", s.chunkRows)
    root.put("n_chunks", s.nChunks)
    root.put("total_rows", s.totalRows)
    val cols = root.putObject("columns")
    s.columns.toSeq.sortBy(_._1).foreach { case (name, c) =>
      val o = cols.putObject(name)
      def strArr(field: String, vs: Array[String]): Unit = {
        val a = o.putArray(field)
        vs.foreach(v => if (v == null) a.addNull() else a.add(v))
      }
      strArr("min", c.min)
      strArr("max", c.max)
      val n = o.putArray("nulls")
      c.nulls.foreach(n.add)
    }
    if (s.envelopes.nonEmpty) {
      val envs = root.putObject("envelopes")
      s.envelopes.toSeq.sortBy(_._1).foreach { case (name, perChunk) =>
        val a = envs.putArray(name)
        perChunk.foreach { e =>
          if (e == null) a.addNull()
          else { val box = a.addArray(); e.foreach(box.add) }
        }
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def parse(text: String): StoreChunkStats = {
    val root = mapper.readTree(text)
    val nChunks = root.get("n_chunks").asInt()
    def strArr(a: ArrayNode): Array[String] =
      (0 until a.size()).map(i => if (a.get(i).isNull) null else a.get(i).asText()).toArray
    val cols = root.get("columns").asInstanceOf[ObjectNode]
    val m = Map.newBuilder[String, ColumnChunkStats]
    cols.fieldNames().forEachRemaining { name =>
      val o = cols.get(name)
      val c = ColumnChunkStats(
        strArr(o.get("min").asInstanceOf[ArrayNode]),
        strArr(o.get("max").asInstanceOf[ArrayNode]),
        (0 until o.get("nulls").size()).map(o.get("nulls").get(_).asLong()).toArray)
      require(c.min.length == nChunks && c.max.length == nChunks && c.nulls.length == nChunks,
        s"stats column $name arrays don't cover $nChunks chunks")
      m += name -> c
    }
    val envs = Map.newBuilder[String, Array[Array[Double]]]
    val envNode = root.get("envelopes")
    if (envNode != null && envNode.isObject) {
      envNode.fieldNames().forEachRemaining { name =>
        val a = envNode.get(name).asInstanceOf[ArrayNode]
        if (a.size() == nChunks) { // wrong-grid envelope column: ignored
          envs += name -> (0 until nChunks).map { i =>
            val e = a.get(i)
            if (e == null || e.isNull || e.size() != 4) null
            else Array(e.get(0).asDouble, e.get(1).asDouble, e.get(2).asDouble, e.get(3).asDouble)
          }.toArray
        }
      }
    }
    StoreChunkStats(root.get("chunk_rows").asLong(), nChunks, root.get("total_rows").asLong(),
      m.result(), envs.result())
  }

  /** Load the sidecar for a group, or None if absent/unreadable/unparseable —
   *  stats are advisory, so ANY failure (including an fs-level checksum
   *  mismatch on a hand-edited file) degrades to "no pruning", never an error. */
  def read(store: ZarrStore, group: String): Option[StoreChunkStats] =
    try {
      val b = store.readBytesIfExists(relPath(group))
      if (b == null) None else Some(parse(new String(b, StandardCharsets.UTF_8)))
    } catch { case _: Exception => None }
}
