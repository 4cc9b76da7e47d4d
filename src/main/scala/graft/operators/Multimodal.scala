package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise with
  * `mapPartitions` (the Scala analog of `mapInPandas` batch UDFs).
  *
  * The actual media codecs are NOT available in this environment, so
  * the decode step is a clearly-marked deterministic stub
  * ([[StubCodec]]); everything Spark-side — schema, batch iteration,
  * partitioning, output shape — is real and tested. At 100 TB the
  * pattern matters more than the codec: blobs stay in executor memory
  * one batch at a time, never collected, and the metadata projection
  * prunes the binary column when downstream only needs features.
  */
object Multimodal {

  /** Typed media metadata attached to every blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)
  ))

  /** Pluggable per-blob codec behind every batch operator here: the
    * deterministic [[StubCodec]] (default — exercises the Spark-side
    * plumbing on arbitrary bytes) or the real [[ImageIoCodec]]
    * (JDK `javax.imageio`, decodes actual PNG/BMP payloads, falls back
    * to the stub for non-image bytes). The contract is pure
    * bytes-in/values-out so implementations stay task-local —
    * Serializable because instances ride the mapPartitions closures.
    */
  trait MediaCodec extends Serializable {
    /** (n_bytes, format, width, height, n_frames) for one blob. */
    def decodeMeta(bytes: Array[Byte]): (Long, String, Int, Int, Int)
    /** (out_width, out_height, re-encoded payload) at 1/factor scale. */
    def resize(bytes: Array[Byte], factor: Int): (Int, Int, Array[Byte])
    /** Fixed-size feature vector for one frame of the blob. */
    def frameFeatures(bytes: Array[Byte], frame: Int, dim: Int): Array[Float]
    /** Canonical content fingerprint of one frame. */
    def frameFingerprint(bytes: Array[Byte], frame: Int): String
  }

  /** STUB media codec — deterministic functions of the blob bytes in
    * place of real image/audio decoding. The real-image member of the
    * family is [[ImageIoCodec]]; this one stays the default because it
    * accepts ANY bytes (the synthetic md5 blobs the mm_* oracle
    * queries use) and replays bit-for-bit in SQL.
    */
  object StubCodec extends MediaCodec {
    /** "Decode" header metadata from a blob. */
    def decodeMeta(bytes: Array[Byte]): (Long, String, Int, Int, Int) = {
      val fmt = if (bytes.isEmpty) "empty" else (bytes(0) & 0x3) match {
        case 0 => "img"
        case 1 => "audio"
        case 2 => "video"
        case _ => "other"
      }
      val w = if (bytes.length > 1) 16 + (bytes(1) & 0x7f) else 0
      val h = if (bytes.length > 2) 16 + (bytes(2) & 0x7f) else 0
      val frames = if (bytes.length > 3) 1 + (bytes(3) & 0xf) else 1
      (bytes.length.toLong, fmt, w, h, frames)
    }

    /** STUB "resize" by integer `factor` per axis: halves the declared
      * dimensions and keeps the first ceil(n/factor²) payload bytes (a
      * real codec decodes, box-filters, re-encodes; the byte-count
      * contraction and dim arithmetic here stand in for it
      * deterministically).
      */
    def resize(bytes: Array[Byte], factor: Int): (Int, Int, Array[Byte]) = {
      val (_, _, w, h, _) = decodeMeta(bytes)
      val keep = math.max((bytes.length + factor * factor - 1) / (factor * factor), 0)
      (w / factor, h / factor, bytes.take(keep))
    }

    /** Canonical fingerprint of ONE frame's feature-generating content:
      * md5 over the per-slot ordered byte lists that determine
      * [[frameFeatures]](bytes, frame, 8). Two frames share a
      * fingerprint iff the byte sequence feeding every feature slot is
      * identical — i.e. their decoded features are bit-equal — without
      * ever fingerprinting floats (float formatting is engine-specific;
      * integer byte values are not). The string layout
      * `s:b,b,...,;` per slot is replayed verbatim by the oracle.
      */
    def frameFingerprint(bytes: Array[Byte], frame: Int): String = {
      val sb = new StringBuilder
      var s = 0
      while (s < 8) {
        sb.append(s).append(':')
        var i = 0
        while (i < bytes.length) {
          if ((i + frame) % 8 == s) sb.append(bytes(i) & 0xff).append(',')
          i += 1
        }
        sb.append(';')
        s += 1
      }
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(sb.toString.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }

    /** "Decode" one frame: a fixed-size feature vector (stub: byte
      * histogram folded to `dim`).
      */
    def frameFeatures(bytes: Array[Byte], frame: Int, dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        out((i + frame) % dim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Extract typed metadata for every blob: one `mapPartitions` pass,
    * batch-iterating rows so only one partition of blobs is resident
    * per task.
    */
  def withMediaMeta(df: DataFrame, blobCol: String,
                    codec: MediaCodec = StubCodec): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("media", mediaMetaSchema))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val (n, fmt, w, h, fr) = codec.decodeMeta(
          if (bytes == null) Array.emptyByteArray else bytes)
        Row.fromSeq(r.toSeq :+ Row(n, fmt, w, h, fr))
      }
    }(enc)
  }

  /** Batch resize: binary → binary through the (stub) codec, one
    * partition of blobs resident per task, output dims carried as
    * typed columns. The pattern for any media transcode at 100 TB:
    * blobs never shuffle (the transform is a projection-shaped
    * mapPartitions), and downstream can project away the payload to
    * keep exchanges feature-only.
    */
  def resizeBlobs(df: DataFrame, blobCol: String, factor: Int,
                  codec: MediaCodec = StubCodec): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("out_w", IntegerType, nullable = false),
      StructField("out_h", IntegerType, nullable = false),
      StructField("resized", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val (w, h, out) = codec.resize(
          if (bytes == null) Array.emptyByteArray else bytes, factor)
        Row.fromSeq(r.toSeq ++ Seq(w, h, out))
      }
    }(enc)
  }

  /** Frame sampling: explode every blob into `(frame_idx, features)`
    * rows, sampling at most `maxFrames` evenly-spaced frames. The
    * output drops the blob column — downstream shuffles move features,
    * not media bytes.
    */
  def sampleFrames(df: DataFrame, blobCol: String, idCol: String,
                   maxFrames: Int, dim: Int = 8,
                   codec: MediaCodec = StubCodec): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val bIdx = df.schema.fieldIndex(blobCol)
    val iIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](bIdx)
        if (bytes == null) Iterator.empty
        else {
          val (_, _, _, _, nFrames) = codec.decodeMeta(bytes)
          val take = math.min(nFrames, maxFrames)
          val step = math.max(nFrames / math.max(take, 1), 1)
          (0 until take).iterator.map { i =>
            Row(r.get(iIdx), i * step,
              codec.frameFeatures(bytes, i * step, dim).toSeq)
          }
        }
      }
    }(enc)
  }

  /** Frame-level dedup ACROSS blobs — the video/image analog of
    * sub-document block dedup: every sampled frame is fingerprinted by
    * its feature-generating content ([[codec.frameFingerprint]] —
    * integer byte lists, never floats) in the same mapPartitions pass
    * that samples it, so only `(fingerprint, doc_id, frame_idx)` rows
    * ever reach an exchange — media payloads stay at rest. keep =
    * lexicographically lowest (doc_id, frame_idx) per content group.
    * At 100 TB this is how near-free cross-video frame dedup works:
    * the shuffle is fingerprint-sized regardless of blob size.
    */
  def dedupFrames(df: DataFrame, blobCol: String, idCol: String,
                  maxFrames: Int = 4,
                  codec: MediaCodec = StubCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("fp", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val bIdx = df.schema.fieldIndex(blobCol)
    val iIdx = df.schema.fieldIndex(idCol)
    val fps = df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](bIdx)
        if (bytes == null) Iterator.empty
        else {
          val (_, _, _, _, nFrames) = codec.decodeMeta(bytes)
          val take = math.min(nFrames, maxFrames)
          val step = math.max(nFrames / math.max(take, 1), 1)
          val id = r.getAs[Number](iIdx).longValue()
          (0 until take).iterator.map { i =>
            Row(id, (i * step).toLong,
              codec.frameFingerprint(bytes, i * step))
          }
        }
      }
    }(enc)
    // window, not self-join: fps is an unpersisted mapPartitions
    // relation, and a groupBy+join-back would evaluate it twice —
    // decoding and fingerprinting every blob a second time. One
    // fp-partitioned window shuffles the fingerprint rows once and
    // reads the decode pass once (content groups are duplicate-set
    // sized, so the per-group window buffer is bounded).
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("fp"))
    fps
      .withColumn("c", min(struct(col("doc_id"), col("frame_idx"))).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .select(col("doc_id"), col("frame_idx"), col("fp"),
        col("c.doc_id").as("canonical_doc"),
        col("c.frame_idx").as("canonical_frame"), col("n_copies"),
        (col("doc_id") === col("c.doc_id") &&
          col("frame_idx") === col("c.frame_idx")).as("keep"))
  }

  /** Perceptual-hash-style bit signature per sampled frame: bit s is
    * set iff feature slot s crosses mid-scale — the binarization step
    * of every real pHash/aHash pipeline (there it's DCT coefficients
    * vs their median; here the [[StubCodec]] features stand in, and
    * the threshold compare is monotone in the underlying integer byte,
    * so both engines binarize identically with no float-tie risk).
    * Input is [[sampleFrames]] output; `dim` there sets the signature
    * width (≤ 64 bits in a long).
    *
    * Returns `(<idCol>, frame_idx, sig)`.
    */
  def frameSignatures(frames: DataFrame, idCol: String): DataFrame =
    frames.select(col(idCol), col("frame_idx").cast("long").as("frame_idx"),
      expr("""aggregate(
        transform(features, (f, i) -> if(f >= 0.5F, shiftleft(1L, i), 0L)),
        0L, (acc, x) -> acc + x)""").as("sig"))

  /** All frame pairs whose signatures differ by ≤ 1 bit, by EXACT
    * multi-probe: every frame emits its own signature plus the
    * `width` one-bit flips (17 probe keys at width 16), and a probe
    * hitting another frame's exact signature IS a distance-≤1 pair —
    * identity probes find distance 0, flip probes exactly distance 1,
    * so no verification join is needed and recall is 1.0 by
    * construction (the bit-sampling LSH guarantee, cf. Indyk–Motwani).
    * Canonical (a < b) ordering keeps each unordered pair once.
    *
    * Scale shape: probes are a `width+1`-way Generate (linear in
    * frames), and the one equi-join shuffles on the signature key —
    * near-dup-density-bounded fan-out, never an all-pairs product.
    * For ≥ 64-bit production hashes at higher distance thresholds,
    * band the signature (the [[graft.operators.Dedup]] SimHash
    * rotation scheme) instead of widening the probe set
    * combinatorially.
    *
    * Returns `(id_a, frame_a, id_b, frame_b, dist)`.
    */
  def hammingNearDupPairs(sigs: DataFrame, idCol: String,
                          width: Int): DataFrame = {
    require(width >= 1 && width <= 64, s"width must be in [1, 64]: $width")
    val probes = sigs.select(col(idCol).as("id_a"),
        col("frame_idx").as("frame_a"), col("sig").as("sig_a"),
        explode(array(col("sig") +: (0 until width).map(b =>
          col("sig").bitwiseXOR(shiftleft(lit(1L), b))): _*)).as("probe"))
    probes.join(sigs.select(col(idCol).as("id_b"),
        col("frame_idx").as("frame_b"), col("sig").as("sig_b")),
        col("probe") === col("sig_b"))
      .filter(struct(col("id_a"), col("frame_a")) <
        struct(col("id_b"), col("frame_b")))
      .select(col("id_a"), col("frame_a"), col("id_b"), col("frame_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long")
          .as("dist"))
  }

  /** Fixed-size window segmentation of an audio blob — the PCM framing
    * pass every audio pipeline runs before feature extraction (VAD,
    * loudness normalization, silence trimming). The stub treats each
    * byte as one centered sample (b − 128); a real decoder would emit
    * PCM floats — the window shape, batch iteration, and exact-integer
    * feature parity are what carry to production. Per window:
    * `sum_amp` = Σ|s| and `sum_sq` = Σs² (exact longs — float math
    * stays OUT of the kernel so both engines derive RMS identically
    * downstream), `zcr` = sign changes between consecutive samples
    * within the window. One mapPartitions pass; output rows carry
    * features only, so downstream shuffles never move audio bytes.
    */
  def audioWindows(df: DataFrame, blobCol: String, idCol: String,
                   windowSize: Int): DataFrame = {
    require(windowSize >= 1, "windowSize must be >= 1")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("win_idx", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sum_amp", LongType, nullable = false),
      StructField("sum_sq", LongType, nullable = false),
      StructField("zcr", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val bIdx = df.schema.fieldIndex(blobCol)
    val iIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](bIdx)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val id = r.getAs[Number](iIdx).longValue()
          (0 until bytes.length by windowSize).iterator.map { start =>
            val end = math.min(start + windowSize, bytes.length)
            var sumAmp = 0L; var sumSq = 0L; var zcr = 0L
            var i = start
            while (i < end) {
              val s = (bytes(i) & 0xff) - 128
              sumAmp += math.abs(s); sumSq += s.toLong * s
              if (i > start) {
                val prev = (bytes(i - 1) & 0xff) - 128
                if ((prev >= 0) != (s >= 0)) zcr += 1
              }
              i += 1
            }
            Row(id, (start / windowSize).toLong, (end - start).toLong,
              sumAmp, sumSq, zcr)
          }
        }
      }
    }(enc)
  }

  /** Exact media dedup by content fingerprint — the multimodal twin of
    * [[Dedup.exact]]: every blob is fingerprinted (md5 over its hex
    * encoding; hex is an injective byte encoding, so groups equal raw
    * byte equality, and the hex hop keeps the fingerprint replayable by
    * engines whose md5 takes only strings) and only (fingerprint, id)
    * ever reaches the exchange — media payloads never shuffle. keep =
    * lowest id per content group; the group size rides along for
    * storage-savings reporting.
    */
  def dedupBlobs(df: DataFrame, blobCol: String, idCol: String): DataFrame = {
    val fp = df.select(col(idCol).cast("long").as("doc_id"),
      md5(hex(col(blobCol))).as("fp"))
    val grp = fp.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .withColumnRenamed("fp", "__gfp")
    // null-SAFE join key: null blobs form one "no content" group in the
    // aggregate, and a plain equi-join would silently drop those rows
    fp.join(grp, col("fp") <=> col("__gfp"))
      .select(col("doc_id"), col("canonical_id"), col("n_copies"),
        (col("doc_id") === col("canonical_id")).as("keep"))
  }

  // ---- real-codec e2e (ImageIoCodec over genuine PNG/BMP payloads) --

  /** Deterministic REAL-image fixtures: for each input id, an actual
    * PNG (even ids) or BMP (odd ids) whose luminance pattern is the
    * pure integer formula
    * `v(x,y) = (7·(id mod 1000) + 31·x + 17·y) mod 256` over
    * `w = 4 + 2·(id mod 5)`, `h = 4 + 2·(id mod 3)` — encoded through
    * the JDK's own ImageIO writers, so downstream decode exercises the
    * real container formats while the SQL oracle replays the PIXEL
    * math analytically (it never needs to parse PNG). Dims are even
    * so a factor-2 resize is exact. One mapPartitions pass; each task
    * encodes only its partition's blobs.
    */
  def synthImages(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val iIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getAs[Number](iIdx).longValue()
        val (w, h, pix) = synthPattern(id)
        val fmt = if (id % 2 == 0) "png" else "bmp"
        Row(id, ImageIoCodec.encodeGray(w, h, pix, fmt))
      }
    }(enc)
  }

  /** The [[synthImages]] pixel formula, shared with the spec suite. */
  def synthPattern(id: Long): (Int, Int, Array[Int]) = {
    val w = 4 + 2 * (id % 5).toInt
    val h = 4 + 2 * (id % 3).toInt
    val a = 7 * (id % 1000)
    val pix = Array.tabulate(w * h)(i =>
      ((a + 31 * (i % w) + 17 * (i / w)) % 256).toInt)
    (w, h, pix)
  }

  /** Decoded-pixel statistics per blob through a REAL decode: format
    * (magic-sniffed), dimensions, Σv and the position-weighted
    * Σ v·(1 + x + y·w) — all exact longs, so the oracle can verify the
    * real ImageIO decode against the analytic pattern without ever
    * touching the container bytes. Non-decodable payloads yield a NULL
    * stats row (flagged, not dropped — corrupt-blob accounting is the
    * production behavior). Blobs stay at rest: one mapPartitions pass,
    * features-only output.
    */
  def decodeStats(df: DataFrame, blobCol: String, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("format", StringType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("pix_sum", LongType),
      StructField("pos_sum", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val bIdx = df.schema.fieldIndex(blobCol)
    val iIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getAs[Number](iIdx).longValue()
        val bytes = r.getAs[Array[Byte]](bIdx)
        val g = if (bytes == null) null else ImageIoCodec.decodeGray(bytes)
        if (g == null) Row(id, null, null, null, null, null)
        else {
          val (w, h, pix) = g
          var ps = 0L; var qs = 0L; var i = 0
          while (i < pix.length) {
            ps += pix(i); qs += pix(i).toLong * (1 + i % w + (i / w) * w)
            i += 1
          }
          Row(id, ImageIoCodec.sniffFormat(bytes), w.toLong, h.toLong, ps, qs)
        }
      }
    }(enc)
  }

  /** `width`-bit aHash-style signature per REAL image: decoded
    * luminance folded into `width` slots by pixel index, bit s set iff
    * `width · slotsum(s) ≥ Σv` — i.e. the slot is at or above the
    * image's mean slot mass. ALL-INTEGER binarization (the float-free
    * analog of [[frameSignatures]]'s 0.5 threshold), so the oracle
    * replays it exactly from the pattern. Non-decodable payloads are
    * dropped (signature of corrupt media is meaningless).
    * Returns `(doc_id, frame_idx = 0, sig)` — feed
    * [[hammingNearDupPairs]] directly.
    */
  def imageSignatures(df: DataFrame, blobCol: String, idCol: String,
                      width: Int): DataFrame = {
    require(width >= 1 && width <= 64, s"width must be in [1, 64]: $width")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("sig", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val bIdx = df.schema.fieldIndex(blobCol)
    val iIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getAs[Number](iIdx).longValue()
        val bytes = r.getAs[Array[Byte]](bIdx)
        val g = if (bytes == null) null else ImageIoCodec.decodeGray(bytes)
        if (g == null) Iterator.empty
        else {
          val slots = new Array[Long](width)
          var tot = 0L; var i = 0
          while (i < g._3.length) {
            slots(i % width) += g._3(i); tot += g._3(i); i += 1
          }
          var sig = 0L; var s = 0
          while (s < width) {
            if (width * slots(s) >= tot) sig |= 1L << s
            s += 1
          }
          Iterator.single(Row(id, 0L, sig))
        }
      }
    }(enc)
  }

  /** Real resize e2e with an IN-KERNEL roundtrip proof: decode →
    * box-downscale ([[ImageIoCodec.boxDownscale]], floor-of-block-mean
    * — the exact-integer math the oracle replays) → re-encode in the
    * same container → RE-DECODE the fresh payload and require the
    * pixels to match the computed ones (encoded bytes themselves are
    * never fingerprinted: compression may vary by JDK, pixels may
    * not). Emits `(doc_id, out_w, out_h, rpix_sum, rpos_sum,
    * n_bytes_out)`; a roundtrip mismatch throws — fail loud, never
    * ship silently-wrong media.
    */
  def resizeVerifiedStats(df: DataFrame, blobCol: String, idCol: String,
                          factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("out_w", LongType),
      StructField("out_h", LongType),
      StructField("rpix_sum", LongType),
      StructField("rpos_sum", LongType),
      StructField("n_bytes_out", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val bIdx = df.schema.fieldIndex(blobCol)
    val iIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getAs[Number](iIdx).longValue()
        val bytes = r.getAs[Array[Byte]](bIdx)
        val g = if (bytes == null) null else ImageIoCodec.decodeGray(bytes)
        if (g == null) Row(id, null, null, null, null, null)
        else {
          val (w, h, pix) = g
          val (ow, oh, out) = ImageIoCodec.boxDownscale(w, h, pix, factor)
          val reEnc = ImageIoCodec.encodeGray(ow, oh, out,
            ImageIoCodec.sniffFormat(bytes))
          val back = ImageIoCodec.decodeGray(reEnc)
          if (back == null || back._1 != ow || back._2 != oh ||
              !java.util.Arrays.equals(back._3, out))
            throw new IllegalStateException(
              s"resize roundtrip mismatch for id=$id ${ow}x$oh")
          var ps = 0L; var qs = 0L; var i = 0
          while (i < out.length) {
            ps += out(i); qs += out(i).toLong * (1 + i % ow + (i / ow) * ow)
            i += 1
          }
          Row(id, ow.toLong, oh.toLong, ps, qs, reEnc.length.toLong)
        }
      }
    }(enc)
  }
}
