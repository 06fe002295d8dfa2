package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** The baseline JPEG codec behind mm_jpeg_decode: hand-computed exact
  * fixtures (flat blocks quantize to hand-derivable DC values — every
  * number in the assertions is computed in the comments from the Annex-K
  * tables at quality 90), lossy-round-trip tolerance on structured and
  * pseudo-random bodies across all three sampling layouts, determinism,
  * and the strict rejection contract (progressive, 12-bit, restart
  * intervals, 16-bit quant tables, truncation, trailing bytes).
  */
class JpegSpec extends AnyFunSuite {

  private def enc(w: Int, h: Int, planes: Int, sub: Boolean,
      raw: Array[Byte]): Array[Byte] =
    Multimodal.encodeJpeg(w, h, planes, sub, raw)
  private def dec(p: Array[Byte]) = Multimodal.decodeJpeg(p)

  test("flat gray decodes EXACTLY: DC 576 / q00 3 = 192 reconstructs 200") {
    // v=200 → shift 72 → F(0,0) = 0.25·(1/2)·64·72 = 576; lum q00 at Q90 =
    // (16·20+50)/100 = 3; 576/3 = 192 exact → dequant 576 → IDCT 72 → 200.
    val raw = Array.fill(16 * 16)(200.toByte)
    val Some((w, h, nc, px)) = dec(enc(16, 16, 1, false, raw))
    assert((w, h, nc) === (16, 16, 1))
    assert(px.forall(_ == 200), s"distinct values: ${px.distinct.toSeq}")
  }

  test("flat RGB through 4:2:0 decodes to the hand-computed (100, 150, 199)") {
    // (100,150,200) → YCbCr rint = (141,161,99); flat planes survive the
    // box downsample; DC quant (lum q00 3 / chrom q00 3) reconstructs
    // Y=141, Cb=161, Cr=99 exactly (derivation in mm_jpeg scaladoc terms:
    // 104→35→105→13.125→141; 264→88→264→33 exact; −232→−77→−231→−29);
    // inverse transform rints to (100, 150, 199) — blue loses 1 to the
    // color-transform round trip, pinned deliberately as the LOSSY bit.
    val raw = new Array[Byte](16 * 16 * 3)
    for (i <- 0 until 16 * 16) {
      raw(3 * i) = 100.toByte; raw(3 * i + 1) = 150.toByte
      raw(3 * i + 2) = 200.toByte
    }
    val Some((w, h, nc, px)) = dec(enc(16, 16, 3, true, raw))
    assert((w, h, nc) === (16, 16, 3))
    val rs = px.indices.filter(_ % 3 == 0).map(px).distinct
    val gs = px.indices.filter(_ % 3 == 1).map(px).distinct
    val bs = px.indices.filter(_ % 3 == 2).map(px).distinct
    assert(rs === Seq(100) && gs === Seq(150) && bs === Seq(199),
      s"r=$rs g=$gs b=$bs")
  }

  private def cycledBody(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 37 + 11) % 256).toByte)

  private def meanDiff(w: Int, h: Int, planes: Int, sub: Boolean): Double = {
    val raw = cycledBody(w * h * planes)
    val Some((dw, dh, nc, px)) = dec(enc(w, h, planes, sub, raw))
    assert((dw, dh, nc) === (w, h, planes))
    val srcS = new Array[Long](3); val decS = new Array[Long](3)
    raw.indices.foreach(i => srcS(i % planes) += raw(i) & 0xff)
    px.indices.foreach(i => decS(i % planes) += px(i))
    (0 until planes).map(c =>
      math.abs(srcS(c) - decS(c)).toDouble / (w * h)).max
  }

  test("channel means survive the lossy round trip within JpegTol on all layouts") {
    assert(meanDiff(16, 16, 3, true) <= 3.0, "4:2:0")
    assert(meanDiff(16, 16, 3, false) <= 3.0, "4:4:4")
    assert(meanDiff(16, 16, 1, false) <= 3.0, "gray")
    // non-MCU-aligned geometry: edge replication pads, decode trims
    assert(meanDiff(24, 8, 3, true) <= 3.0, "24x8 4:2:0")
    assert(meanDiff(10, 6, 1, false) <= 3.0, "10x6 gray")
  }

  test("encode + decode are deterministic") {
    val raw = cycledBody(16 * 16 * 3)
    val j1 = enc(16, 16, 3, true, raw); val j2 = enc(16, 16, 3, true, raw)
    assert(java.util.Arrays.equals(j1, j2))
    val Some((_, _, _, p1)) = dec(j1); val Some((_, _, _, p2)) = dec(j2)
    assert(p1.toSeq === p2.toSeq)
  }

  /** Index of the first 0xFF,`marker` pair in the blob. */
  private def markerAt(p: Array[Byte], m: Int): Int =
    p.indices.dropRight(1).find(i =>
      (p(i) & 0xff) == 0xff && (p(i + 1) & 0xff) == m).get

  test("strict rejection: progressive, 12-bit, DRI, 16-bit DQT, truncation, trailing bytes") {
    val good = enc(16, 16, 3, true, cycledBody(16 * 16 * 3))
    assert(dec(good).isDefined)
    // (a) SOF0 → SOF2 (progressive): same payload, different frame marker
    val prog = good.clone(); prog(markerAt(good, 0xc0) + 1) = 0xc2.toByte
    assert(dec(prog).isEmpty, "progressive accepted")
    // (b) 8 → 12 bit sample precision in SOF0
    val deep = good.clone(); deep(markerAt(good, 0xc0) + 4) = 12.toByte
    assert(dec(deep).isEmpty, "12-bit accepted")
    // (c) a restart-interval segment ahead of SOS
    val sos = markerAt(good, 0xda)
    val dri = good.take(sos) ++
      Array(0xff, 0xdd, 0x00, 0x04, 0x00, 0x10).map(_.toByte) ++ good.drop(sos)
    assert(dec(dri).isEmpty, "restart interval accepted")
    // (d) 16-bit quant table: Pq nibble flips, table bytes now run short
    val dqt = good.clone(); dqt(markerAt(good, 0xdb) + 4) = 0x10.toByte
    assert(dec(dqt).isEmpty, "16-bit DQT accepted")
    // (e) truncated scan
    assert(dec(good.dropRight(10)).isEmpty, "truncated scan accepted")
    // (f) trailing bytes after EOI
    assert(dec(good :+ 0x00.toByte).isEmpty, "trailing garbage accepted")
    // (g) not a JPEG at all
    assert(dec("P6 2 2 255\nxxxxxxxxxxxx".getBytes("US-ASCII")).isEmpty)
  }
}
