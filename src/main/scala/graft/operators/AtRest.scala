package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Shared at-rest table machinery for the incremental operators
 * ([[DedupIndex]]'s LSH index + corpus, [[Similarity]]'s IVF table):
 * atomic small-file writes, VERSIONED ROOTS for crash-atomic maintenance
 * publishes, `_meta.json` parameter sidecars that turn silent parameter
 * mismatches into loud errors, and a writer LEASE enforcing the
 * single-writer contract.
 *
 * Versioned-root layout:
 * {{{
 *   root/_current            <- pointer file: the live version number
 *   root/_v<N>/...           <- one complete table per version
 *   root/_meta.json          <- layout parameters (version-independent)
 *   root/_lease              <- writer fence
 *   root/_committed/batch-<B><- exactly-once ingest markers (corpus/IVF)
 * }}}
 * Underscore-prefixed names are invisible to parquet partition discovery,
 * so a raw `spark.read.parquet(root)` on a versioned root fails LOUDLY
 * (no schema) instead of silently mixing versions — readers go through
 * [[resolve]]. A root with data but no `_current` is a legacy
 * (pre-round-12) table and resolves to itself, so existing tables keep
 * working; the first maintenance rewrite migrates them.
 *
 * Maintenance publish protocol: stage the FULL new table under
 * `root/_v<N+1>` (invisible to readers), then swap the `_current`
 * pointer with one atomic rename, then GC stale versions KEEPING the
 * just-replaced one — a reader that resolved the old version right
 * before the swap still reads a complete table; the old version dies on
 * the NEXT maintenance pass (one-generation reader grace; a production
 * deployment would add a time-based grace instead).
 */
object AtRest {

  def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write-then-rename, so no reader (or replay) ever sees a partial
   *  file — every pointer/sidecar/marker the recovery paths depend on
   *  goes through here. */
  def writeFile(fs: FileSystem, p: Path, bytes: Array[Byte]): Unit = {
    val tmp = new Path(p.getParent, s".tmp-${p.getName}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new IllegalStateException(s"atomic write rename $tmp -> $p failed")
  }

  def readFile(fs: FileSystem, p: Path): Array[Byte] = {
    val st = fs.getFileStatus(p)
    val in = fs.open(p)
    try { val b = new Array[Byte](st.getLen.toInt); in.readFully(b); b } finally in.close()
  }

  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private def utf8(b: Array[Byte]): String =
    new String(b, java.nio.charset.StandardCharsets.UTF_8)

  // ------------------------------------------------------------ versioning

  private def currentPointer(root: String) = new Path(root, "_current")
  private def versionDir(root: String, v: Long) = new Path(root, s"_v$v")

  /** The live version number, None for legacy/fresh roots. A corrupt
   *  pointer is an error, not a silent legacy fallback — falling back
   *  would read a stale table as if current. */
  def currentVersion(fs: FileSystem, root: String): Option[Long] = {
    val p = currentPointer(root)
    if (!fs.exists(p)) None
    else utf8(readFile(fs, p)).trim.toLongOption match {
      case some @ Some(_) => some
      case None => throw new IllegalStateException(
        s"$root/_current is unparsable; restore it to the live version number")
    }
  }

  /** The directory holding the CURRENT complete table: `root/_v<N>` for
   *  versioned roots, `root` itself for legacy (pre-versioning) tables
   *  and fresh paths. Every reader resolves through here. */
  def resolve(spark: SparkSession, root: String): String = {
    val fs = fsFor(spark, root)
    currentVersion(fs, root) match {
      case Some(v) => versionDir(root, v).toString
      case None => root
    }
  }

  /** The resolved dir for a table a WRITER is about to touch, creating
   *  the versioned layout for fresh roots: an existing `_current` wins;
   *  a root already holding data stays legacy (the first maintenance
   *  rewrite migrates it); an empty/absent root becomes `_v0`. */
  def ensureVersioned(spark: SparkSession, root: String): String = {
    val fs = fsFor(spark, root)
    currentVersion(fs, root) match {
      case Some(v) => versionDir(root, v).toString
      case None =>
        val rootPath = new Path(root)
        val hasData = fs.exists(rootPath) && fs.listStatus(rootPath).exists { st =>
          val n = st.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }
        if (hasData) root
        else {
          fs.mkdirs(versionDir(root, 0L))
          writeFile(fs, currentPointer(root), utf8("0"))
          versionDir(root, 0L).toString
        }
    }
  }

  /** The staging directory for the next version — wiped if a crashed
   *  earlier attempt left partial data there. Returns (version, dir). */
  def nextStaging(fs: FileSystem, root: String): (Long, Path) = {
    val v = currentVersion(fs, root).getOrElse(-1L) + 1L
    val dir = versionDir(root, v)
    if (fs.exists(dir)) fs.delete(dir, true)
    (v, dir)
  }

  /**
   * Atomically flip `root` to version `v` (one pointer-file rename),
   * then GC: every other version directory EXCEPT the one just replaced
   * is deleted (one-generation reader grace), and legacy at-root data
   * directories (`ingest_batch=` / `<layoutCol>=`) are swept — the
   * migration step that makes the first versioned rewrite safe on a
   * pre-versioning table.
   */
  def publishVersion(spark: SparkSession, root: String, v: Long,
      legacyLayoutCol: String): Unit = {
    val fs = fsFor(spark, root)
    val prev = currentVersion(fs, root)
    writeFile(fs, currentPointer(root), utf8(v.toString))
    // the swap is done — everything below is cleanup of now-unreachable data
    val keep = Set(s"_v$v") ++ prev.map(p => s"_v$p")
    fs.listStatus(new Path(root)).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory &&
          ((n.startsWith("_v") && !keep.contains(n) && n.drop(2).forall(_.isDigit)) ||
            n.startsWith("ingest_batch=") || n.startsWith(legacyLayoutCol + "=")))
        fs.delete(st.getPath, true)
    }
  }

  // ---------------------------------------------------------- meta sidecar

  /**
   * `_meta.json`: the layout/signature parameters a table was written
   * with, as a flat string map — e.g. for the LSH index the banding
   * parameters, whose silent mismatch "yields zero collisions" (admits
   * every duplicate). Written at table creation, validated by every
   * probe/append/maintenance entry point: mismatch = loud typed error,
   * absent = legacy table (adopted by the next write).
   */
  def writeMeta(spark: SparkSession, root: String, params: Map[String, String]): Unit = {
    val fs = fsFor(spark, root)
    fs.mkdirs(new Path(root))
    val json = params.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")
    writeFile(fs, new Path(root, "_meta.json"), utf8(json))
  }

  private val MetaEntry = """"([^"]+)"\s*:\s*"([^"]*)"""".r

  def readMeta(spark: SparkSession, root: String): Option[Map[String, String]] = {
    val fs = fsFor(spark, root)
    val p = new Path(root, "_meta.json")
    if (!fs.exists(p)) None
    else {
      val parsed = MetaEntry.findAllMatchIn(utf8(readFile(fs, p)))
        .map(m => m.group(1) -> m.group(2)).toMap
      // a PRESENT but unparsable sidecar must not silently disable
      // validation (the exact failure mode the sidecar exists to catch) —
      // writes are atomic, so garbage here means external damage
      if (parsed.isEmpty)
        throw new IllegalStateException(
          s"$root/_meta.json exists but holds no parameters — restore it or " +
            "delete it to explicitly mark the table legacy/unvalidated")
      Some(parsed)
    }
  }

  /** Throw unless every `params` entry matches the persisted sidecar
   *  (absent sidecar = legacy table, accepted). The error names every
   *  mismatched key with both values — the loud replacement for the
   *  zero-collisions / silent-mis-prune failure modes. */
  def validateMeta(spark: SparkSession, root: String,
      params: Map[String, String]): Unit =
    readMeta(spark, root).foreach { meta =>
      val bad = params.toSeq.sortBy(_._1).flatMap { case (k, v) =>
        meta.get(k) match {
          case Some(stored) if stored != v => Some(s"$k: caller=$v stored=$stored")
          case _ => None
        }
      }
      if (bad.nonEmpty)
        throw new IllegalStateException(
          s"parameter mismatch against $root/_meta.json (a mismatched probe/append " +
            s"would silently return wrong results): ${bad.mkString("; ")}")
    }

  /** Validate against an existing sidecar, then (re-)write it — the
   *  adopt-or-check step every writer runs: legacy tables gain a sidecar,
   *  parameter drift fails loudly. */
  def validateOrAdoptMeta(spark: SparkSession, root: String,
      params: Map[String, String]): Unit = {
    validateMeta(spark, root, params)
    if (readMeta(spark, root).isEmpty) writeMeta(spark, root, params)
  }

  // ---------------------------------------------------------------- lease

  /**
   * Writer fence: take `root/_lease` or die. The single-writer contract
   * was previously enforced only by convention — a second concurrent
   * ingest stream would corrupt silently; with the lease it fails
   * loudly. Atomic create-no-overwrite claims a free lease; a live
   * foreign lease (younger than `ttlMs`) throws; a stale one (crashed
   * writer) is broken and re-claimed. Same-owner re-acquire refreshes
   * the heartbeat. Best-effort on stores without atomic create — the
   * contract is fail-loud-on-the-common-race, not distributed
   * consensus.
   *
   * One documented benign race: a stream restarting on the SAME
   * checkpoint re-acquires its own (same-owner) lease before the
   * previous query's termination listener fires; the late listener then
   * releases the re-acquired lease. The window closes at the restarted
   * stream's next micro-batch (per-batch same-owner re-acquire
   * refreshes), and only a same-identity restart can hit it — a foreign
   * writer in the window would be caught by that re-acquire.
   */
  def acquireLease(spark: SparkSession, root: String, owner: String,
      ttlMs: Long = 10 * 60 * 1000L): Unit = {
    val fs = fsFor(spark, root)
    fs.mkdirs(new Path(root))
    val p = new Path(root, "_lease")
    def tryCreate(): Boolean =
      try {
        val out = fs.create(p, false)
        try out.write(utf8(leaseBody(owner))) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (tryCreate()) return
    // taken: same owner refreshes; a live foreign holder is fatal; a
    // stale one is broken (delete + one retry)
    val st = try Some(fs.getFileStatus(p)) catch {
      case _: java.io.FileNotFoundException => None
    }
    val holder = st.map(_ => utf8(readFile(fs, p)).linesIterator.next()).getOrElse("")
    if (holder == owner) { writeFile(fs, p, utf8(leaseBody(owner))); return }
    val age = st.map(s => System.currentTimeMillis() - s.getModificationTime)
    if (st.isDefined && age.exists(_ < ttlMs))
      throw new IllegalStateException(
        s"$root is write-locked by '$holder' (lease age ${age.get} ms < ttl $ttlMs ms); " +
          "two concurrent writers are not supported — stop the other writer or, " +
          "if it crashed, wait for the lease to go stale")
    if (st.isDefined) fs.delete(p, false)
    if (!tryCreate())
      throw new IllegalStateException(s"$root lease lost a re-claim race; retry")
  }

  private def leaseBody(owner: String): String = {
    val host = try java.net.InetAddress.getLocalHost.getHostName catch {
      case _: Exception => "unknown"
    }
    s"$owner\n$host pid=${ProcessHandle.current().pid()} ts=${System.currentTimeMillis()}\n"
  }

  /** Release only an own lease (a foreign holder's fence stays). */
  def releaseLease(spark: SparkSession, root: String, owner: String): Unit = {
    val fs = fsFor(spark, root)
    val p = new Path(root, "_lease")
    if (fs.exists(p) && utf8(readFile(fs, p)).linesIterator.next() == owner)
      fs.delete(p, false)
  }

  /** Run `body` under the root's writer lease with a fresh owner id —
   *  the wrapper every batch-entry writer uses. */
  def withLease[T](spark: SparkSession, root: String)(body: => T): T = {
    val owner = java.util.UUID.randomUUID().toString
    acquireLease(spark, root, owner)
    try body finally releaseLease(spark, root, owner)
  }
}
