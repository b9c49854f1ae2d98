package graft.connector

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import graft.functions.CHValues
import org.scalatest.funsuite.AnyFunSuite

/** ClickHouse LZ4 frame format (reference compression.rs:1-10): layout
  * pinned byte-by-byte, checksum verified before decompression, loud
  * failure on corruption / foreign framing, multi-frame chunking.
  * CityHash128 itself has no in-sandbox oracle (like farmHash64) — the
  * kernel is transcribed from the published city.cc 1.0.2 sharing every
  * primitive with the certified cityHash64; these tests pin the frame
  * contract around it.
  */
class CHLz4Spec extends AnyFunSuite {

  private def roundTrip(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new CHLz4.FramedOutputStream(bos)
    out.write(data)
    out.close()
    new CHLz4.FramedInputStream(new ByteArrayInputStream(bos.toByteArray)).readAllBytes()
  }

  test("frame layout: checksum(16) + 0x82 + LE sizes + raw LZ4 block") {
    val raw = "clickhouse frame layout pin".getBytes("UTF-8")
    val frame = CHLz4.compressFrame(raw, 0, raw.length)
    // method byte right after the 16-byte checksum
    assert(frame(16) == 0x82.toByte)
    def u32(off: Int) = (frame(off) & 0xff) | ((frame(off + 1) & 0xff) << 8) |
      ((frame(off + 2) & 0xff) << 16) | ((frame(off + 3) & 0xff) << 24)
    val csize = u32(17)
    val dsize = u32(21)
    assert(dsize == raw.length)
    // compressed size INCLUDES the 9-byte header (compression.rs:43)
    assert(csize == frame.length - 16)
    // checksum covers method+sizes+payload, halves little-endian low-then-high
    val (lo, hi) = CHValues.cityHash128(java.util.Arrays.copyOfRange(frame, 16, frame.length))
    def u64(off: Int) = (0 until 8).map(i => (frame(off + i) & 0xffL) << (8 * i)).reduce(_ | _)
    assert(u64(0) == lo && u64(8) == hi)
    // payload is a RAW LZ4 block: lz4-java's block decoder reads it directly
    val back = new Array[Byte](dsize)
    net.jpountz.lz4.LZ4Factory.fastestInstance().safeDecompressor()
      .decompress(frame, 25, frame.length - 25, back, 0)
    assert(back.toSeq == raw.toSeq)
  }

  test("round-trip: empty, tiny, and multi-frame (> 1 MiB) bodies") {
    assert(roundTrip(Array.emptyByteArray).isEmpty)
    val tiny = Array[Byte](42)
    assert(roundTrip(tiny).toSeq == tiny.toSeq)
    val rnd = new scala.util.Random(7)
    val big = new Array[Byte]((1 << 20) * 2 + 12345) // 3 frames
    rnd.nextBytes(big)
    assert(java.util.Arrays.equals(roundTrip(big), big))
  }

  test("corruption fails loudly at the checksum, before any decode") {
    val raw = ("payload " * 100).getBytes("UTF-8")
    val bos = new ByteArrayOutputStream()
    val out = new CHLz4.FramedOutputStream(bos)
    out.write(raw)
    out.close()
    val bytes = bos.toByteArray
    bytes(40) = (bytes(40) ^ 0x1).toByte // flip one payload bit
    val ex = intercept[java.io.IOException] {
      new CHLz4.FramedInputStream(new ByteArrayInputStream(bytes)).readAllBytes()
    }
    assert(ex.getMessage.contains("checksum mismatch"))
  }

  test("foreign framing (wrong method byte) is rejected by name") {
    // 16 zero 'checksum' bytes + a gzip-looking byte where 0x82 must be
    val junk = new Array[Byte](32)
    junk(16) = 0x1f
    val ex = intercept[java.io.IOException] {
      new CHLz4.FramedInputStream(new ByteArrayInputStream(junk)).readAllBytes()
    }
    assert(ex.getMessage.contains("not speaking ClickHouse LZ4 framing"))
  }

  test("truncated frame raises EOF, not a silent short read") {
    val raw = "truncate me".getBytes("UTF-8")
    val frame = CHLz4.compressFrame(raw, 0, raw.length)
    val cut = java.util.Arrays.copyOfRange(frame, 0, frame.length - 3)
    intercept[java.io.EOFException] {
      new CHLz4.FramedInputStream(new ByteArrayInputStream(cut)).readAllBytes()
    }
  }

  test("cityHash128 structural pins: length-class boundaries all distinct and stable") {
    // every kernel branch: <8, 8..15, 16..127+16 (murmur), >=128+16 (long loop incl. tail)
    val lens = Seq(0, 1, 7, 8, 15, 16, 17, 32, 64, 127, 143, 144, 200, 256, 300, 1024)
    val hs = lens.map { n =>
      CHValues.cityHash128(Array.tabulate[Byte](n)(i => (i * 37 + n).toByte))
    }
    assert(hs.distinct.size == hs.size)
    // determinism across calls
    assert(CHValues.cityHash128("abc".getBytes) == CHValues.cityHash128("abc".getBytes))
  }

  test("cityHash128 frozen goldens: the v1.0.2 kernel (post r14-ADVICE combine fix) cannot drift silently") {
    // no independent 1.0.2-128 implementation exists in this sandbox
    // (documented since r14), so these are REGRESSION pins, not an
    // oracle: the values freeze the kernel as fixed per the r14 ADVICE
    // (long-path low half mixes w.first — the published 1.0.2 form; the
    // 1.1 form uses w.second). The >=144 rows (multi-chunk tail + loop)
    // are exactly the class the ADVICE showed the self-consistent specs
    // could not catch — any future edit that lands back on 1.1 (or
    // anything else) now fails here by value.
    val golden = Seq(
      0 -> (7729516827876973744L, -3794982543293472971L),
      1 -> (7510738640994486348L, 5765236432015506836L),
      7 -> (-2796684220032947173L, -2698154100111001702L),
      8 -> (2247050725022230979L, 6976449857103044622L),
      15 -> (-4109960165197045850L, 6823996475121851919L),
      16 -> (1220282968574538211L, -5272323318049850057L),
      17 -> (-1765874745696388702L, -2341098245408055589L),
      32 -> (2190986743270484237L, -6837277054447406873L),
      64 -> (4517297716502532583L, 5334090507333207636L),
      127 -> (4799644538190125744L, 2304918128572454356L),
      143 -> (48712992181160740L, -8156932559606432363L),
      144 -> (-4536012733272394485L, 4279621992542065082L),
      200 -> (2646402557528111078L, 6150117654398905529L),
      256 -> (-5793023108538023442L, 4004061735977003157L),
      300 -> (-5454943841542913608L, 5313921457481453057L),
      1024 -> (4333417877098680149L, 4881406434374574460L))
    golden.foreach { case (n, expected) =>
      val got = CHValues.cityHash128(Array.tabulate[Byte](n)(i => (i * 37 + n).toByte))
      assert(got == expected, s"cityHash128 drift at len=$n: got $got")
    }
  }
}
