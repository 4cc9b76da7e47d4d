package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators.{Multimodal, Similarity}

/** Text/vector function edges + multimodal plumbing + ANN sanity. */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokenCount and jaccard edges") {
    val df = Seq(("a", "one two  three"), ("b", "one"), ("c", "one two"))
      .toDF("id", "text")
    val counts = df.select($"id", TF.tokenCount($"text").as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(counts == Map("a" -> 3, "b" -> 1, "c" -> 2))

    val sh = df.select($"id", TF.normalizeWs($"text").as("norm"))
      .select($"id", TF.charShinglesOf($"norm", 3).as("s"))
    val j = sh.as("x").crossJoin(sh.as("y"))
      .filter($"x.id" === "a" && $"y.id" === "c")
      .select(TF.jaccard($"x.s", $"y.s")).collect()(0).getDouble(0)
    assert(j > 0.4 && j < 1.0) // "one two" shingles ⊂ "one two three"

    // containment sees the subset relation jaccard dilutes: every
    // shingle of "one two" is inside "one two three"
    val c = sh.as("x").crossJoin(sh.as("y"))
      .filter($"x.id" === "a" && $"y.id" === "c")
      .select(TF.overlapCoefficient($"x.s", $"y.s")).collect()(0).getDouble(0)
    assert(c == 1.0)
    // empty-vs-empty convention
    val e = Seq(("e1", ""), ("e2", "")).toDF("id", "text")
      .select($"id", TF.charShinglesOf(TF.normalizeWs($"text"), 3).as("s"))
    val ec = e.as("x").crossJoin(e.as("y")).filter($"x.id" === "e1" && $"y.id" === "e2")
      .select(TF.overlapCoefficient($"x.s", $"y.s")).collect()(0).getDouble(0)
    assert(ec == 1.0)
  }

  test("langId picks the language with most marker hits; ties go to list order") {
    val df = Seq(
      ("de", "der hund und die katze ist nicht hier"),
      ("en", "the cat and the dog is here with you"),
      ("tie", "xyzzy plugh")).toDF("label", "text")
    val got = df.select($"label", TF.langId($"text").as("l"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("de") == "de" && got("en") == "en")
    assert(got("tie") == TF.langMarkers.head._1) // all-zero scores → first language
  }

  test("vector functions: cosine, norm, normalize, zero-vector guard") {
    val df = Seq(
      ("a", Array(3.0f, 4.0f)),
      ("z", Array(0.0f, 0.0f))).toDF("id", "v")
    val out = df.select($"id",
      VF.l2Norm($"v").as("n"),
      VF.cosineSimilarity($"v", $"v").as("self"),
      VF.l2Norm(VF.normalize($"v")).as("unit"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toList
    val a = out.find(_._1 == "a").get
    assert(math.abs(a._2 - 5.0) < 1e-12 && math.abs(a._3 - 1.0) < 1e-12 && math.abs(a._4 - 1.0) < 1e-12)
    val z = out.find(_._1 == "z").get
    assert(z._2 == 0.0 && z._3 == 0.0 && z._4 == 0.0)
  }

  test("PII redaction: planted emails/SSNs/phones counted and scrubbed") {
    val df = Seq(
      (1L, "contact john.doe+spam@ex-ample.co.uk or 555-123-4567 today"),
      (2L, "ssn 123-45-6789 and backup ssn 987-65-4321"),
      (3L, "nothing sensitive here 12-34")).toDF("doc_id", "text")
    val out = df.select($"doc_id",
      TF.piiCount($"text", TF.piiPatterns.toMap.apply("email")).as("e"),
      TF.piiCount($"text", TF.piiPatterns.toMap.apply("ssn")).as("s"),
      TF.piiCount($"text", TF.piiPatterns.toMap.apply("phone")).as("p"),
      TF.redactPii($"text").as("red"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(out(1L)._1 == 1 && out(1L)._3 == 1)
    assert(out(1L)._4 == "contact <EMAIL> or <PHONE> today")
    assert(out(2L)._2 == 2 && out(2L)._4 == "ssn <SSN> and backup ssn <SSN>")
    assert(out(3L) == ((0, 0, 0, "nothing sensitive here 12-34")))
  }

  test("tokenChunks: sliding windows cover all tokens with overlap") {
    val text = (1 to 95).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text), (2L, "only three tokens"), (3L, "   ")).toDF("doc_id", "text")
    val out = df.select($"doc_id", TF.tokenChunks($"text", 50, 40).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
    // 95 tokens → starts 0, 40, 80 with sizes 50, 50, 15
    assert(out(1L).map(c => (c.getLong(0), c.getLong(1))) == Seq((0L, 50L), (40L, 50L), (80L, 15L)))
    assert(out(2L).map(c => (c.getLong(0), c.getLong(1))) == Seq((0L, 3L)))
    assert(out(3L).isEmpty) // whitespace-only doc: no chunks
  }

  test("quantizeInt8: max element hits ±127, zero vector yields zero codes") {
    val df = Seq(
      ("a", Array(2.54f, -1.27f, 0.0f)), // amax=2.54, scale=0.02
      ("z", Array(0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val out = df.select($"id", VF.quantizeInt8($"v").as("qz"))
      .select($"id", $"qz.scale", $"qz.q")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getSeq[Int](2)))).toMap
    val (aScale, aQ) = out("a")
    assert(math.abs(aScale - 2.54f.toDouble / 127.0) < 1e-12)
    assert(aQ == Seq(127, -64, 0)) // -63.5 rounds away from zero
    assert(out("z") == ((0.0, Seq(0, 0, 0))))
  }

  test("bruteForceTopK returns the true nearest neighbors") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),   // nearest to 0
      (2L, Array(0.0f, 1.0f)),   // orthogonal
      (3L, Array(-1.0f, 0.0f))). // opposite
      toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), "embedding", "vec_id", 2)
      .orderBy($"rank").collect().map(_.getLong(1)).toSeq
    assert(top == Seq(1L, 2L))
  }

  test("multimodal: metadata extraction and frame sampling never move blobs downstream") {
    val blobs = Seq(
      (1L, Array[Byte](2, 10, 20, 7, 1, 2, 3)), // "video", 8 frames max
      (2L, Array[Byte](0, 5, 5)),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "blob")
    val meta = Multimodal.withMediaMeta(blobs, "blob")
    assert(meta.select($"media.n_bytes").collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 3L, 7L))
    assert(meta.schema("media").dataType == Multimodal.mediaMetaSchema)

    val frames = Multimodal.sampleFrames(blobs, "blob", "doc_id", maxFrames = 3, dim = 4)
    assert(!frames.columns.contains("blob"))
    assert(frames.filter($"doc_id" === 3L).count() == 0) // null blob → no frames
    val f1 = frames.filter($"doc_id" === 1L).collect()
    assert(f1.nonEmpty && f1.forall(_.getSeq[Float](2).length == 4))
  }

  test("multimodal: frameSignatures binarizes at mid-scale; " +
      "hammingNearDupPairs equals brute force and never double-counts") {
    // hand-built feature frames: bit s set iff features(s) >= 0.5f
    val frames = Seq(
      (1L, 0, Seq(0.6f, 0.4f, 0.5f, 0.49f)), // bits 1,0,1,0 -> sig 5
      (2L, 0, Seq(0.0f, 0.0f, 0.0f, 0.0f)))  // sig 0
      .toDF("doc_id", "frame_idx", "features")
    val sigs = Multimodal.frameSignatures(frames, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sigs == Map(1L -> 5L, 2L -> 0L))

    // signature fixture: dist-0 twins, two dist-1 pairs, dist-2 excluded
    val fix = Seq((1L, 0L, 0L), (2L, 0L, 1L), (3L, 0L, 3L), (4L, 0L, 15L),
      (5L, 0L, 1L)) // 5 duplicates 2's signature
      .toDF("doc_id", "frame_idx", "sig")
    val got = Multimodal.hammingNearDupPairs(fix, "doc_id", width = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(4))).toMap
    assert(got == Map((1L, 2L) -> 1L, (1L, 5L) -> 1L, (2L, 3L) -> 1L,
      (3L, 5L) -> 1L, (2L, 5L) -> 0L), s"got $got")

    // random sigs: operator == brute-force all-pairs at dist <= 1
    val rnd = new scala.util.Random(31)
    val rs = (1 to 80).map(i => (i.toLong, 0L, rnd.nextInt(64).toLong))
    val brute = (for {
      a <- rs; b <- rs
      if a._1 < b._1 &&
        java.lang.Long.bitCount(a._3 ^ b._3) <= 1
    } yield ((a._1, b._1), java.lang.Long.bitCount(a._3 ^ b._3).toLong)).toMap
    val got2 = Multimodal.hammingNearDupPairs(
        rs.toDF("doc_id", "frame_idx", "sig"), "doc_id", width = 6)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(4))).toMap
    assert(got2 == brute)
  }

  test("multimodal: dedupFrames shares fingerprints across identical blobs " +
      "and keeps the lexicographic lowest (doc, frame)") {
    val payload = Array.tabulate[Byte](16)(i => (i * 7 + 3).toByte)
    val blobs = Seq(
      (4L, payload), (9L, payload.clone()), // identical media content
      (2L, Array.tabulate[Byte](16)(i => (i * 11 + 5).toByte)))
      .toDF("doc_id", "blob")
    val out = Multimodal.dedupFrames(blobs, "blob", "doc_id", maxFrames = 4)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    // doc 4 and doc 9 decode identical frames: every frame of 9 is a
    // duplicate of 4's, with n_copies 2
    val d4 = rows.keys.filter(_._1 == 4L)
    assert(d4.nonEmpty)
    d4.foreach { case (_, f) =>
      assert(rows((4L, f)) == ((4L, f, 2L, true)))
      assert(rows((9L, f)) == ((4L, f, 2L, false)))
    }
    // doc 2's frames are their own canonical group
    rows.keys.filter(_._1 == 2L).foreach { case (_, f) =>
      assert(rows((2L, f))._4)
    }
    // fingerprint string is engine-neutral: spot-check determinism
    val fp1 = Multimodal.StubCodec.frameFingerprint(payload, 0)
    assert(fp1 == Multimodal.StubCodec.frameFingerprint(payload.clone(), 0))
    assert(fp1 != Multimodal.StubCodec.frameFingerprint(payload, 1))
  }

  test("multimodal: dedupBlobs groups identical payloads, keep = lowest id") {
    val payload = Array[Byte](1, 2, 3, 4)
    val blobs = Seq(
      (5L, payload), (2L, payload.clone()), // identical content, different ids
      (3L, Array[Byte](9, 9)))
      .toDF("doc_id", "blob")
    val out = Multimodal.dedupBlobs(blobs, "blob", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out(2L) == ((2L, 2L, true)))   // lowest id of the pair keeps
    assert(out(5L) == ((2L, 2L, false)))  // higher id is the duplicate
    assert(out(3L) == ((3L, 1L, true)))

    // null blobs form one "no content" group and must not vanish from
    // the report (a plain equi-join would drop null fingerprints)
    val withNulls = Seq(
      (1L, Array[Byte](7)), (8L, null.asInstanceOf[Array[Byte]]),
      (9L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "blob")
    val nout = Multimodal.dedupBlobs(withNulls, "blob", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(nout.size == 3)
    assert(nout(8L) == ((8L, 2L, true)) && nout(9L) == ((8L, 2L, false)))
  }

  test("multimodal: resizeBlobs halves dims and contracts payload bytes") {
    val blobs = Seq(
      (1L, Array.tabulate[Byte](16)(_.toByte)), // w=16+10=26, h=16+2... bytes(1)=1 -> w=17
      (2L, Array[Byte](1, 100, 50, 3)),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "blob")
    val out = Multimodal.resizeBlobs(blobs, "blob", factor = 2)
      .select($"doc_id", $"out_w", $"out_h", $"resized").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2),
        Option(r.getAs[Array[Byte]](3)).map(_.length).getOrElse(-1)))).toMap
    // doc 1: bytes(1)=1 -> w=17/2=8; bytes(2)=2 -> h=18/2=9; 16 bytes -> keep 4
    assert(out(1L) == ((8, 9, 4)))
    // doc 2: w=(16+100)/2=58, h=(16+50)/2=33; 4 bytes -> ceil(4/4)=1
    assert(out(2L) == ((58, 33, 1)))
    // null blob -> empty bytes: dims (16+0)/2=8 via zero-padding? decodeMeta gives 0 dims
    assert(out(3L) == ((0, 0, 0)))
  }

  test("multimodal: audioWindows hand-computed features, ragged tail, null blob") {
    // samples = byte − 128: doc 1 = [-128, -27, 72, -8, 127] windowed
    // at 4 → window 0 = [-128, -27, 72, -8] (zcr: -→-→+→- = 2),
    // window 1 = [127] (no neighbor, zcr 0)
    val blobs = Seq(
      (1L, Array[Byte](0, 101, -56, 120, -1)), // unsigned 0,101,200,120,255
      (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "blob")
    val out = Multimodal.audioWindows(blobs, "blob", "doc_id", windowSize = 4)
      .orderBy($"doc_id", $"win_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 0L, 4L, 128L + 27 + 72 + 8,
        128L * 128 + 27 * 27 + 72 * 72 + 8 * 8, 2L),
      (1L, 1L, 1L, 127L, 127L * 127, 0L)))
  }

  test("multimodal: audioWindows equals a sequential reference on random blobs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def reference(bytes: Array[Byte], w: Int): Seq[(Long, Long, Long, Long, Long)] =
      bytes.map(b => (b & 0xff) - 128).grouped(w).zipWithIndex.map {
        case (win, idx) =>
          val zcr = win.sliding(2).count { pc =>
            pc.length == 2 && (pc(0) >= 0) != (pc(1) >= 0) }
          (idx.toLong, win.length.toLong, win.map(s => math.abs(s).toLong).sum,
            win.map(s => s.toLong * s).sum, zcr.toLong)
      }.toSeq
    val gen = for {
      n <- Gen.choose(0, 40)
      bytes <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
      w <- Gen.choose(1, 9)
    } yield (bytes.toArray, w)
    val prop = Prop.forAll(gen) { case (bytes, w) =>
      val df = Seq((7L, bytes)).toDF("doc_id", "blob").repartition(3)
      val got = Multimodal.audioWindows(df, "blob", "doc_id", w)
        .orderBy($"win_idx").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toSeq
      got == reference(bytes, w)
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
  }
}
