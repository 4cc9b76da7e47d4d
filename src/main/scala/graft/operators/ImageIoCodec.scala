package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.operators.Multimodal.{MediaCodec, StubCodec}

/** REAL image codec on the JDK's `javax.imageio` (public API, zero new
  * dependencies): decodes actual PNG and BMP payloads for
  * `decodeMeta`, box-filter-downscales + re-encodes for `resize`, and
  * folds decoded luminance into the feature vector for
  * `frameFeatures`. Non-image bytes (wrong magic, or a payload ImageIO
  * rejects) fall back to [[Multimodal.StubCodec]], so the operator
  * plumbing never throws on mixed-media columns — the production
  * posture for a crawl corpus where a fraction of blobs is always
  * corrupt.
  *
  * Determinism contract (what the oracle relies on): everything
  * DERIVED FROM DECODED PIXELS is exact-integer and replayable —
  * dimensions, box-filtered pixel values (floor of the block mean),
  * luminance sums. Re-ENCODED bytes are NOT fingerprinted anywhere:
  * PNG/BMP writers are free to vary compression across JDKs, so
  * [[Multimodal.resizeVerifiedStats]] instead re-decodes its own
  * output inside the kernel and fails loudly if the roundtrip does not
  * reproduce the computed pixels.
  *
  * ImageIO static readers are thread-safe for independent streams;
  * `ImageIO.setUseCache(false)` keeps decoding heap-only (no temp
  * files per task). Still single-frame: n_frames is 1 for stills
  * (animated formats are out of JDK scope).
  */
object ImageIoCodec extends MediaCodec {
  ImageIO.setUseCache(false)

  /** Magic-byte sniff — cheaper and stricter than trying every reader:
    * PNG `\x89PNG\r\n\x1a\n`, BMP `BM`. Returns null when neither.
    */
  def sniffFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 8 &&
        (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G' && bytes(4) == 0x0d && bytes(5) == 0x0a &&
        bytes(6) == 0x1a && bytes(7) == 0x0a) "png"
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else null

  /** Decode to (width, height, row-major luminance ints 0–255), or
    * null when the payload is not a decodable PNG/BMP. Luminance =
    * the red channel of the ARGB int — exact for the grayscale-written
    * fixtures (r = g = b) and deterministic for any input.
    */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    if (sniffFormat(bytes) == null) return null
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return null
    val (w, h) = (img.getWidth, img.getHeight)
    val pix = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        pix(y * w + x) = (img.getRGB(x, y) >> 16) & 0xff
        x += 1
      }
      y += 1
    }
    (w, h, pix)
  }

  /** Floor-of-block-mean downscale by `factor` per axis (the exact-
    * integer box filter): out(x,y) = ⌊Σ block / factor²⌋ over the full
    * factor×factor block; trailing rows/cols that do not fill a block
    * are cropped (out dims = in dims / factor). Pure pixel math — the
    * piece the SQL oracle replays.
    */
  def boxDownscale(w: Int, h: Int, pix: Array[Int],
                   factor: Int): (Int, Int, Array[Int]) = {
    val ow = w / factor; val oh = h / factor
    val out = new Array[Int](ow * oh)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        var s = 0
        var dy = 0
        while (dy < factor) {
          var dx = 0
          while (dx < factor) {
            s += pix((oy * factor + dy) * w + (ox * factor + dx))
            dx += 1
          }
          dy += 1
        }
        out(oy * ow + ox) = s / (factor * factor)
        ox += 1
      }
      oy += 1
    }
    (ow, oh, out)
  }

  /** Encode row-major luminance ints as a real `format` ("png"/"bmp")
    * payload, r = g = b = v (TYPE_INT_RGB — both JDK writers accept
    * it; TYPE_BYTE_GRAY trips the BMP writer on some JDKs).
    */
  def encodeGray(w: Int, h: Int, pix: Array[Int], format: String): Array[Byte] = {
    require(format == "png" || format == "bmp", s"unsupported format: $format")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = pix(y * w + x) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, bos), s"no ImageIO writer for $format")
    bos.toByteArray
  }

  override def decodeMeta(bytes: Array[Byte]): (Long, String, Int, Int, Int) = {
    val g = decodeGray(bytes)
    if (g == null) StubCodec.decodeMeta(bytes)
    else (bytes.length.toLong, sniffFormat(bytes), g._1, g._2, 1)
  }

  /** Real resize: decode → box downscale → re-encode in the SAME
    * container format. Non-image payloads fall back to the stub.
    */
  override def resize(bytes: Array[Byte], factor: Int): (Int, Int, Array[Byte]) = {
    val g = decodeGray(bytes)
    if (g == null) StubCodec.resize(bytes, factor)
    else {
      val (ow, oh, out) = boxDownscale(g._1, g._2, g._3, factor)
      (ow, oh, encodeGray(ow, oh, out, sniffFormat(bytes)))
    }
  }

  /** Luminance folded into `dim` slots by pixel index (the decoded-
    * pixel analog of the stub's byte histogram); same /255 scaling so
    * downstream thresholds ([[Multimodal.frameSignatures]]) transfer.
    */
  override def frameFeatures(bytes: Array[Byte], frame: Int, dim: Int): Array[Float] = {
    val g = decodeGray(bytes)
    if (g == null) return StubCodec.frameFeatures(bytes, frame, dim)
    val out = new Array[Float](dim)
    var i = 0
    while (i < g._3.length) {
      out((i + frame) % dim) += g._3(i) / 255.0f
      i += 1
    }
    out
  }

  /** Same slot-list layout as the stub's fingerprint, fed by decoded
    * luminance instead of raw bytes — two images share a fingerprint
    * iff their decoded pixels agree slot-for-slot, independent of the
    * container's compression bytes.
    */
  override def frameFingerprint(bytes: Array[Byte], frame: Int): String = {
    val g = decodeGray(bytes)
    if (g == null) return StubCodec.frameFingerprint(bytes, frame)
    val sb = new StringBuilder
    var s = 0
    while (s < 8) {
      sb.append(s).append(':')
      var i = 0
      while (i < g._3.length) {
        if ((i + frame) % 8 == s) sb.append(g._3(i)).append(',')
        i += 1
      }
      sb.append(';')
      s += 1
    }
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(sb.toString.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }
}
