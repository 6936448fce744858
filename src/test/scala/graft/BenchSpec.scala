package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the bench's derived AQE pre-coalesce count: the
  * partition width is a pure function of (input bytes on disk, advisory
  * target, core count) — no pinned constant to re-tune per scale factor.
  */
class BenchSpec extends AnyFunSuite {

  test("derivePreCoalesce floors at 4x cores when input is tiny or absent") {
    // Unreadable dir -> inputBytes 0 -> the 4x-cores floor, already pow2.
    assert(Bench.derivePreCoalesce("/nonexistent/dir", "64m", 32) === 128)
    // A floor that is not a power of two rounds UP (4*24=96 -> 128).
    assert(Bench.derivePreCoalesce("/nonexistent/dir", "64m", 24) === 128)
  }

  test("derivePreCoalesce scales with input bytes / target, next pow2") {
    val dir = Files.createTempDirectory("dpc").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "data.bin")
    val out = new java.io.FileOutputStream(f)
    try out.write(new Array[Byte](17 * 1024)) finally out.close()
    f.deleteOnExit()
    // 17 KiB * 32 / 1 KiB = 544 -> next power of two 1024 (> 128 floor).
    assert(Bench.derivePreCoalesce(dir.getAbsolutePath, "1k", 32) === 1024)
    // Exact power of two stays put: 16 KiB * 32 / 1 KiB = 512.
    val g = new java.io.File(dir, "data2.bin")
    val out2 = new java.io.FileOutputStream(g)
    try out2.write(new Array[Byte](15 * 1024)) finally out2.close()
    g.deleteOnExit()
    assert(Bench.derivePreCoalesce(dir.getAbsolutePath, "1k", 32) === 1024)
    // Byte-suffix parsing is Spark's own: 32 KiB at "32k" = 32 partitions
    // of working set -> floor still governs (32*32/32 = 32 < 128).
    assert(Bench.derivePreCoalesce(dir.getAbsolutePath, "32k", 32) === 128)
  }

  test("derivePreCoalesce at the sf10 fixture shape lands on 1024") {
    // The documented anchor: ~1.6 GB of parquet, 64m advisory target,
    // 32 cores -> 1.6e9 * 32 / 64MiB ~= 763 -> 1024. Synthesized via a
    // sparse file so the spec does not need the real fixture.
    val dir = Files.createTempDirectory("dpc10").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "sparse.bin")
    val raf = new java.io.RandomAccessFile(f, "rw")
    try raf.setLength(1600L * 1000 * 1000) finally raf.close()
    f.deleteOnExit()
    assert(Bench.derivePreCoalesce(dir.getAbsolutePath, "64m", 32) === 1024)
  }

  test("contentionJson: load begin/end and wall/timed ratio as JSON fields, " +
    "degenerate timed total flagged with the -1 sentinel") {
    assert(Bench.contentionJson(1.5, 32.25, 400.0, 100.0) ===
      """"load_begin":1.50,"load_end":32.25,"wall_timed_ratio":4.00""")
    // Unavailable load (JVM reports -1) stays visible, not omitted.
    assert(Bench.contentionJson(-1.0, -1.0, 10.0, 4.0) ===
      """"load_begin":-1.00,"load_end":-1.00,"wall_timed_ratio":2.50""")
    // A zero timed total (all queries failed) can't divide: -1 sentinel.
    assert(Bench.contentionJson(0.5, 0.5, 10.0, 0.0)
      .endsWith(""""wall_timed_ratio":-1.00"""))
    // The fragment embeds into a JSON object parseably.
    val obj = s"""{${Bench.contentionJson(2.0, 3.0, 9.0, 3.0)}}"""
    assert(obj === """{"load_begin":2.00,"load_end":3.00,"wall_timed_ratio":3.00}""")
  }
}
