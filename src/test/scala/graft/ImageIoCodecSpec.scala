package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ImageIoCodec, Multimodal}

/** The REAL image codec (javax.imageio): roundtrips, box filter math,
  * stub fallback, and the Spark-side operators over genuine PNG/BMP
  * payloads.
  */
class ImageIoCodecSpec extends AnyFunSuite {

  private def pattern(id: Long) = Multimodal.synthPattern(id)

  test("PNG and BMP encode→decode roundtrips pixels exactly") {
    for (fmt <- Seq("png", "bmp"); id <- Seq(0L, 7L, 123L, 999L)) {
      val (w, h, pix) = pattern(id)
      val bytes = ImageIoCodec.encodeGray(w, h, pix, fmt)
      assert(ImageIoCodec.sniffFormat(bytes) == fmt)
      val (dw, dh, dpix) = ImageIoCodec.decodeGray(bytes)
      assert((dw, dh) == (w, h), s"$fmt dims")
      assert(dpix.sameElements(pix), s"$fmt pixels")
    }
  }

  test("decodeMeta returns real dims for images, stub values otherwise") {
    val (w, h, pix) = pattern(42L)
    val png = ImageIoCodec.encodeGray(w, h, pix, "png")
    assert(ImageIoCodec.decodeMeta(png) == (png.length.toLong, "png", w, h, 1))
    val junk = Array.tabulate[Byte](32)(i => (i * 7).toByte)
    assert(ImageIoCodec.decodeMeta(junk) == Multimodal.StubCodec.decodeMeta(junk))
    // PNG magic with a truncated body must fall back, not throw
    val broken = png.take(12)
    assert(ImageIoCodec.decodeMeta(broken) ==
      Multimodal.StubCodec.decodeMeta(broken))
  }

  test("boxDownscale is the floor-of-block-mean and crops partial blocks") {
    // 4x2 image, factor 2 -> 2x1: blocks {0,1,10,11} -> 5, {2,3,12,13} -> 7
    val pix = Array(0, 1, 2, 3, 10, 11, 12, 13)
    val (ow, oh, out) = ImageIoCodec.boxDownscale(4, 2, pix, 2)
    assert((ow, oh) == (2, 1))
    assert(out.toSeq == Seq((0 + 1 + 10 + 11) / 4, (2 + 3 + 12 + 13) / 4))
    // 5x3 at factor 2 crops the odd row/col
    val (ow2, oh2, _) = ImageIoCodec.boxDownscale(5, 3, new Array[Int](15), 2)
    assert((ow2, oh2) == (2, 1))
  }

  test("resize re-encodes in the source container and halves dims") {
    val (w, h, pix) = pattern(8L) // w,h even by construction
    for (fmt <- Seq("png", "bmp")) {
      val bytes = ImageIoCodec.encodeGray(w, h, pix, fmt)
      val (ow, oh, out) = ImageIoCodec.resize(bytes, 2)
      assert((ow, oh) == (w / 2, h / 2))
      assert(ImageIoCodec.sniffFormat(out) == fmt)
      val (dw, dh, dpix) = ImageIoCodec.decodeGray(out)
      assert((dw, dh) == (ow, oh))
      val (_, _, expect) = ImageIoCodec.boxDownscale(w, h, pix, 2)
      assert(dpix.sameElements(expect))
    }
  }

  test("frameFingerprint keys on decoded pixels, not container bytes") {
    val (w, h, pix) = pattern(5L)
    val png = ImageIoCodec.encodeGray(w, h, pix, "png")
    val bmp = ImageIoCodec.encodeGray(w, h, pix, "bmp")
    assert(!png.sameElements(bmp))
    assert(ImageIoCodec.frameFingerprint(png, 0) ==
      ImageIoCodec.frameFingerprint(bmp, 0))
    val pix2 = pix.clone(); pix2(0) = (pix2(0) + 1) % 256
    val png2 = ImageIoCodec.encodeGray(w, h, pix2, "png")
    assert(ImageIoCodec.frameFingerprint(png, 0) !=
      ImageIoCodec.frameFingerprint(png2, 0))
  }

  test("withMediaMeta over real blobs through the pluggable codec") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val blobs = Multimodal.synthImages(ids, "doc_id")
    val metas = Multimodal.withMediaMeta(blobs, "blob", ImageIoCodec)
      .select($"doc_id", $"media.format", $"media.width", $"media.height")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    for (id <- 1L to 4L) {
      val (w, h, _) = pattern(id)
      val fmt = if (id % 2 == 0) "png" else "bmp"
      assert(metas(id) == ((fmt, w, h)), s"id=$id")
    }
  }

  test("resizeVerifiedStats roundtrip guard passes on real images") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ids = (1L to 10L).toDF("doc_id")
    val out = Multimodal.resizeVerifiedStats(
      Multimodal.synthImages(ids, "doc_id"), "blob", "doc_id", 2)
      .collect()
    assert(out.length == 10)
    out.foreach { r =>
      val id = r.getLong(0)
      val (w, h, pix) = pattern(id)
      val (ow, oh, rp) = ImageIoCodec.boxDownscale(w, h, pix, 2)
      assert(r.getLong(1) == ow && r.getLong(2) == oh)
      assert(r.getLong(3) == rp.map(_.toLong).sum)
    }
  }
}
