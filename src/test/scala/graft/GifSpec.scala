package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** The GIF87a codec behind mm_gif_decode: byte-exact lossless round trips
  * (LZW is exact, unlike JPEG), the KwKwK self-referencing code path, a
  * body long enough to force code-width growth and a dictionary reset,
  * extension-block skipping, local-color-table override, and the strict
  * rejection contract (signature, interlace, missing global table,
  * truncation at every tier, out-of-range codes, wrong pixel count,
  * missing trailer).
  */
class GifSpec extends AnyFunSuite {

  private def enc(w: Int, h: Int, idx: Array[Byte]): Array[Byte] =
    Multimodal.encodeGif(w, h, idx)
  private def dec(p: Array[Byte]) = Multimodal.decodeGif(p)

  private def roundTrip(w: Int, h: Int, idx: Array[Byte]): Unit = {
    val Some((dw, dh, ps, pal, out)) = dec(enc(w, h, idx))
    assert((dw, dh, ps) === (w, h, Multimodal.GifPalSize))
    assert(pal.length === 3 * Multimodal.GifPalSize)
    assert(out.toSeq === idx.toSeq, "decoded indices differ from source")
  }

  test("byte-exact round trip on a 16x16 cycled body") {
    roundTrip(16, 16, Array.tabulate(256)(i => ((i * 7 + 3) % 64).toByte))
  }

  test("KwKwK: an alternating two-symbol body exercises code == next") {
    // 0,1,0,1,... makes the encoder's dictionary grow (0,1),(1,0),(0,1,0)…
    // and the decoder hit the code-not-yet-in-table case immediately
    roundTrip(16, 16, Array.tabulate(256)(i => (i % 2).toByte))
  }

  test("flat body (maximal LZW compression) round-trips") {
    roundTrip(16, 16, Array.fill(256)(37.toByte))
  }

  test("long pseudo-random body forces width growth past 8 bits and round-trips") {
    // 100x100 = 10,000 pixels; random-ish indices add ~1 dict entry per
    // output code, driving next past 256 and 512 (width 7->10)
    val rnd = new scala.util.Random(42)
    roundTrip(100, 100, Array.fill(10000)(rnd.nextInt(64).toByte))
  }

  test("very long low-entropy body forces a dictionary reset at 4096 and round-trips") {
    // 256x256 = 65,536 pixels of a short repeating phrase: entries keep
    // growing (LZW learns ever-longer runs), reaching 4096 and the
    // encoder's mid-stream CLEAR
    val idx = Array.tabulate(256 * 256)(i => ((i % 7) ^ (i % 3)).toByte)
    roundTrip(256, 256, idx)
  }

  test("palette formula matches the oracle's SQL formula") {
    (0 until Multimodal.GifPalSize).foreach { k =>
      val (r, g, b) = Multimodal.gifPalette(k)
      assert(r === k * 4 && g === (k * 7) % 256 && b === (k * 13) % 256)
      assert(r >= 0 && r <= 255 && g >= 0 && g <= 255 && b >= 0 && b <= 255)
    }
  }

  test("extension blocks before the image descriptor are skipped") {
    val base = enc(4, 4, Array.tabulate(16)(i => (i % 64).toByte))
    // splice a 89a-style graphics-control extension (0x21 0xF9, one 4-byte
    // sub-block, terminator) between the palette and the descriptor
    val palEnd = 13 + 3 * Multimodal.GifPalSize
    val ext = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = base.take(palEnd) ++ ext ++ base.drop(palEnd)
    val Some((w, h, _, _, out)) = dec(spliced)
    assert((w, h) === (4, 4) && out.length === 16)
  }

  test("local color table overrides the global one") {
    val base = enc(2, 2, Array[Byte](0, 1, 2, 3))
    val palEnd = 13 + 3 * Multimodal.GifPalSize
    // set the descriptor's local-table flag (2-color table: bits=1) and
    // splice a 2-entry palette after the descriptor's packed byte
    val descAt = palEnd // image separator position
    val out = base.clone()
    out(descAt + 9) = (out(descAt + 9) | 0x80).toByte // LCT present, bits 1 -> size 2
    val lct = Array[Byte](10, 20, 30, 40, 50, 60)
    val spliced = out.take(descAt + 10) ++ lct ++ out.drop(descAt + 10)
    // indices 2,3 exceed the 2-entry local palette -> strict reject
    assert(dec(spliced).isEmpty)
    // an in-range body accepts and serves the local palette
    val base2 = enc(2, 2, Array[Byte](0, 1, 0, 1))
    val out2 = base2.clone()
    out2(descAt + 9) = (out2(descAt + 9) | 0x80).toByte
    val spliced2 = out2.take(descAt + 10) ++ lct ++ out2.drop(descAt + 10)
    val Some((_, _, ps2, pal2, idx2)) = dec(spliced2)
    assert(ps2 === 2 && pal2.toSeq === lct.map(_.toInt).toSeq)
    assert(idx2.toSeq === Seq[Byte](0, 1, 0, 1))
  }

  test("strict rejections: signature, interlace, no global table, truncation, trailer") {
    val good = enc(8, 8, Array.tabulate(64)(i => (i % 64).toByte))
    // bad signature
    val badSig = good.clone(); badSig(3) = 'X'.toByte
    assert(dec(badSig).isEmpty)
    // interlace flag on the image descriptor
    val palEnd = 13 + 3 * Multimodal.GifPalSize
    val inter = good.clone(); inter(palEnd + 9) = (inter(palEnd + 9) | 0x40).toByte
    assert(dec(inter).isEmpty)
    // global color table flag cleared
    val noPal = good.clone(); noPal(10) = (noPal(10) & 0x7f).toByte
    assert(dec(noPal).isEmpty)
    // truncations at every tier
    assert(dec(good.take(5)).isEmpty) // inside the signature
    assert(dec(good.take(12)).isEmpty) // inside the screen descriptor
    assert(dec(good.take(palEnd - 1)).isEmpty) // inside the palette
    assert(dec(good.take(good.length / 2)).isEmpty) // inside the data
    // missing trailer
    assert(dec(good.dropRight(1)).isEmpty)
    // trailer corrupted
    val noTrail = good.clone(); noTrail(noTrail.length - 1) = 0
    assert(dec(noTrail).isEmpty)
    // the untouched stream still decodes
    assert(dec(good).isDefined)
  }

  test("mm_gif_decode over the testdata assets: geometry and palette invariants") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Multimodal.gifDecode(spark, TestSpark.sfDir)
      .as[(Long, String, Int, Int, Int, Double, Double, Double)]
      .collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, w, h, ps, r, g, b) =>
      assert(w === Multimodal.GifN && h === Multimodal.GifN)
      assert(ps === Multimodal.GifPalSize)
      assert(r >= 0 && r <= 255 && g >= 0 && g <= 255 && b >= 0 && b <= 255)
    }
  }
}
