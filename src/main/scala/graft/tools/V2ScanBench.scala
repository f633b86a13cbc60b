package graft.tools

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Zarr V2 read-path scale bench:
 * `runMain graft.tools.V2ScanBench [rows] [chunkRows] [dir]`.
 *
 * Generates a Zarr V2 store the way a foreign producer would lay it out —
 * `.zgroup`/`.zarray`/`.zmetadata`, bare-index chunk keys, int64 + float64
 * columns, numcodecs `zlib` chunks (incompressible mixed-bit values, so the
 * scan pays real inflate work) — then measures the row vs columnar reader
 * at local[32] and checks both readers' int64 sum against the generator's.
 */
object V2ScanBench {

  private def writeStore(dir: String, rows: Long, chunkRows: Int): Unit = {
    val root = Paths.get(dir)
    // reuse across runs — the consolidated doc lives at t/.zmetadata, and
    // the shape must match (a stale store of another size would silently
    // flow into the sum check and fail it confusingly)
    val zmeta = root.resolve("t/.zmetadata")
    if (Files.exists(zmeta) &&
        new String(Files.readAllBytes(zmeta), "UTF-8")
          .contains(s""""shape":[$rows]"""))
      return
    def zlib(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(1)
      try {
        d.setInput(b); d.finish()
        val out = new Array[Byte](b.length + 1024)
        var n = 0
        while (!d.finished()) n += d.deflate(out, n, out.length - n)
        java.util.Arrays.copyOfRange(out, 0, n)
      } finally d.end()
    }
    def put(rel: String, b: Array[Byte]): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, b)
    }
    put(".zgroup", """{"zarr_format":2}""".getBytes("UTF-8"))
    put("t/.zgroup", """{"zarr_format":2}""".getBytes("UTF-8"))
    def zarray(dtype: String): String =
      s"""{"zarr_format":2,"shape":[$rows],"chunks":[$chunkRows],"dtype":"$dtype",
         |"compressor":{"id":"zlib","level":1},"fill_value":0,"order":"C","filters":null}"""
        .stripMargin.replace("\n", "")
    put("t/v/.zarray", zarray("<i8").getBytes("UTF-8"))
    put("t/x/.zarray", zarray("<f8").getBytes("UTF-8"))
    val nChunks = ((rows + chunkRows - 1) / chunkRows).toInt
    var c = 0
    while (c < nChunks) {
      val bv = ByteBuffer.allocate(chunkRows * 8).order(ByteOrder.LITTLE_ENDIAN)
      val bx = ByteBuffer.allocate(chunkRows * 8).order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < chunkRows) {
        val g = c.toLong * chunkRows + i
        // mixed bits (real inflate work) masked to 38 bits so the table
        // sum stays within Long under Spark's default ANSI arithmetic
        val v = (g * 2654435761L) & ((1L << 38) - 1)
        bv.putLong(v)
        bx.putDouble(v.toDouble)
        i += 1
      }
      put(s"t/v/$c", zlib(bv.array()))
      put(s"t/x/$c", zlib(bx.array()))
      c += 1
    }
    put("t/.zmetadata",
      (s"""{"metadata":{".zgroup":{"zarr_format":2},""" +
        s""""v/.zarray":${zarray("<i8")},"x/.zarray":${zarray("<f8")}},""" +
        """"zarr_consolidated_format":1}""").getBytes("UTF-8"))
  }

  private def read(spark: SparkSession, dir: String, columnar: Boolean, target: Long): DataFrame =
    spark.read.format("zarr").option("group", "/t")
      .option("columnar", columnar.toString)
      .option("target_partition_rows", target.toString)
      .load(dir)

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 16L * 1024 * 1024
    val chunkRows = if (args.length > 1) args(1).toInt else 1 << 19
    val dir = if (args.length > 2) args(2) else "/tmp/graft_v2scanbench/store.zarr"
    val runs = 5
    val t0 = System.nanoTime()
    writeStore(dir, rows, chunkRows)
    System.err.println(f"[v2scanbench] store ready in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    val storeBytes = {
      def du(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(du).sum).getOrElse(0L)
      du(new java.io.File(dir))
    }
    val spark = BenchHarness.session(32)
    def scan(columnar: Boolean): Long =
      read(spark, dir, columnar, chunkRows.toLong)
        .select(sum("v"), sum("x")).collect().head.getLong(0)
    def timeBest(body: => Unit): Double =
      BenchHarness.timeBest(runs, "v2scanbench")(body)
    val expected = { // recompute the generator's masked sum (no closed form)
      var acc = 0L; var g = 0L
      while (g < rows) { acc += (g * 2654435761L) & ((1L << 38) - 1); g += 1 }
      acc
    }
    require(scan(columnar = true) == expected, "columnar v2 sum mismatch")
    require(scan(columnar = false) == expected, "row v2 sum mismatch")
    val planned = read(spark, dir, columnar = true, chunkRows.toLong)
      .queryExecution.toRdd.getNumPartitions
    val tCol = timeBest(scan(columnar = true))
    val tRow = timeBest(scan(columnar = false))
    println(s"""{"metric":"v2scanbench","rows":$rows,"store_bytes":$storeBytes,""" +
      s""""tasks":$planned,"columnar_sec":${f(tCol)},"row_sec":${f(tRow)},""" +
      s""""speedup":${f(tRow / tCol)},"mrows_per_sec":${f(rows / tCol / 1e6)}}""")
    spark.stop()
  }

  private def f(d: Double): String = f"$d%.3f"
}
