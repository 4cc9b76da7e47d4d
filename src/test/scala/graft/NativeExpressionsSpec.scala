package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{native, ShingleKernels}
import graft.operators.Dedup

/** The native kernels: edge cases + parity between interpreted eval and
  * codegen (both paths run the same static kernel, but exercise both
  * entry points through a real plan).
  */
class NativeExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("winnow_fingerprints matches a naive reference and keeps the overlap guarantee") {
    val n = 5
    val w = 4
    // naive winnow on already-normalized text (lowercase, single spaces)
    def naive(t: String): Seq[Long] = {
      val count = t.length - n + 1
      if (count <= 0) return Seq.empty
      val hs = (0 until count).map { i =>
        var h = -3750763034362895579L // FNV offset basis
        (0 until n).foreach(j => h = (h ^ t.charAt(i + j)) * 1099511628211L)
        h
      }
      val win = math.min(w, count)
      (0 to count - win).map { i0 =>
        // rightmost minimum by unsigned value
        (i0 until i0 + win).reduceLeft((a, b) =>
          if (java.lang.Long.compareUnsigned(hs(b), hs(a)) <= 0) b else a)
      }.map(hs).distinct.sorted
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "abababababababab", // periodic: repeated hashes exercise the tie rule
      "aaaaaaaaaaaa",     // all shingles identical
      "short", "tiny", "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select($"id", native.winnow_fingerprints($"text", n, w).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == naive(t), s"mismatch on '$t'")
    }
    // guarantee: docs sharing a >= n+w-1 char run share a fingerprint
    val shared = "zqxjkvwpqm" // 10 > n+w-1 = 8
    val a = s"prefix text $shared and more words"
    val b = s"totally different lead-in $shared closing remark"
    val g2 = Seq((0L, a), (1L, b)).toDF("id", "text")
      .select($"id", native.winnow_fingerprints($"text", n, w).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(g2(0L).intersect(g2(1L)).nonEmpty, "shared run produced no common fingerprint")
    // density: winnowing keeps far fewer than all shingles on long text
    assert(got(0L).size < texts.head.length - n + 1)
  }

  test("winnowCandidates pairs docs sharing a long verbatim run, not disjoint ones") {
    val boiler = "all rights reserved contact the site administrator for details"
    val docs = Seq(
      (1L, s"unique opening words alpha $boiler"),
      (2L, s"different beginning beta gamma $boiler trailing content"),
      (3L, "completely unrelated vocabulary zeta theta iota kappa lambda"),
      (4L, "another disjoint document mu nu xi omicron pi rho sigma")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowCandidates(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "shared boilerplate must pair")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("char_shingle_hashes: dedup, normalization, short-text edge cases") {
    val df = Seq(
      ("a", "Hello  World hello world"), // case+ws normalize to one form
      ("b", "hello world hello world"),  // same normalized shingle set
      ("c", "ab"),                        // shorter than n → empty
      ("d", "")                           // empty
    ).toDF("id", "text")
    val out = df.select($"id", native.char_shingle_hashes($"text", 5).as("h"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out("a") == out("b")) // same shingle set after normalization
    assert(out("a").nonEmpty && out("a").distinct == out("a"))
    assert(out("c").isEmpty && out("d").isEmpty)
  }

  test("token_hashes keeps duplicates; simhash of similar texts is Hamming-close") {
    val df = Seq(
      ("x", "the quick brown fox jumps over the lazy dog"),
      ("y", "the quick brown fox jumps over the lazy cat"),
      ("z", "completely different words entirely elsewhere")
    ).toDF("id", "text")
    val sigs = df.select($"id", native.simhash64(native.token_hashes($"text")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs("x"), sigs("y")) < hamming(sigs("x"), sigs("z")))

    val toks = df.filter($"id" === "x")
      .select(native.token_hashes($"text")).collect()(0).getSeq[Long](0)
    assert(toks.length == 9) // "the" twice — duplicates kept
  }

  test("minhashes: identical sets agree, estimate tracks Jaccard") {
    val df = Seq(
      ("a", "abcdefghij" * 10),
      ("b", "abcdefghij" * 10),
      ("c", "zyxwvutsrq" * 10)
    ).toDF("id", "text")
    val sigs = df.select($"id",
      native.minhashes(native.char_shingle_hashes($"text", 5), 16).as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sigs("a") == sigs("b"))
    assert(sigs("a") != sigs("c"))
    assert(sigs("a").length == 16)
  }

  test("kernels are deterministic across invocations") {
    val t = org.apache.spark.unsafe.types.UTF8String.fromString("some Text  here")
    val h1 = ShingleKernels.charShingleHashes(t, 4)
    val h2 = ShingleKernels.charShingleHashes(t, 4)
    assert(h1.toLongArray.toSeq == h2.toLongArray.toSeq)
    assert(ShingleKernels.simHash64(h1) == ShingleKernels.simHash64(h2))
  }

  test("minHashCandidates surfaces planted near-duplicates, not unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    val docs = (Seq(
      (1L, base),
      (2L, base + " again"),          // near-dup of 1
      (3L, base.replace("quick", "slow")), // near-dup of 1
      (4L, "entirely unrelated content about database systems and query planning optimizers")
    ) ++ (5L to 30L).map(i => (i, s"filler document number $i with its own distinct content payload")))
      .toDF("doc_id", "text")
    val cands = Dedup.minHashCandidates(docs, "text", "doc_id",
      shingleLen = 5, bands = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.contains((1L, 4L)))
  }

  test("minHashAdmit drops incoming dups of existing docs and within-batch dups, first-wins") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    val existing = (Seq((1L, base)) ++
      (2L to 20L).map(i => (i, s"existing corpus document $i with its own distinct content payload")))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (100L, base + " again"),                    // dup of existing 1 → dropped
      (101L, "fresh unseen material about stream processing and watermarks today"),
      (102L, "fresh unseen material about stream processing and watermarks today plus"),
      (103L, "completely novel standalone subject matter never seen before anywhere")
    ).toDF("doc_id", "text")
    val out = Dedup.minHashAdmit(existing, incoming, "text", "doc_id",
        shingleLen = 5, bands = 8, rowsPerBand = 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out.keySet == Set(100L, 101L, 102L, 103L)) // verdicts for incoming only
    assert(!out(100L), "dup of an existing doc must be dropped")
    assert(out(101L), "first of a within-batch dup pair is kept")
    assert(!out(102L), "second of a within-batch dup pair is dropped")
    assert(out(103L))
  }

  test("cdcChunkSpans: spans tile the normalized text exactly") {
    import graft.functions.{native, TextFunctions}
    val texts = Seq(
      "The quick brown fox jumps over the lazy dog again and again and again",
      "short",
      "  Weird   spacing\tand MIXED case  ",
      "x" * 500,
      "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rows = df.select(col("id"), TextFunctions.normalizeWs(col("text")).as("norm"),
        native.cdc_chunk_spans(col("text"), 8, 64).as("spans"))
      .collect()
    rows.foreach { r =>
      val norm = r.getString(1)
      val spans = r.getSeq[Long](2).map(p => ((p >> 32).toInt, (p & 0xFFFFFFFFL).toInt))
      if (norm.isEmpty) assert(spans.isEmpty)
      else {
        // spans are contiguous from 1, lengths positive, and their
        // substrings reassemble the exact normalized text
        assert(spans.head._1 == 1 && spans.forall(_._2 >= 1))
        spans.sliding(2).foreach {
          case Seq((s1, l1), (s2, _)) => assert(s1 + l1 == s2)
          case _ =>
        }
        val glued = spans.map { case (s, l) => norm.substring(s - 1, s - 1 + l) }.mkString
        assert(glued == norm, s"id=${r.getLong(0)}")
      }
    }
    // modulus=1 cuts at every interior window position
    val tiny = Seq((1L, "abcdefghijkl")).toDF("id", "text")
    val s1 = tiny.select(native.cdc_chunk_spans(col("text"), 8, 1))
      .collect()(0).getSeq[Long](0)
      .map(p => ((p >> 32).toInt, (p & 0xFFFFFFFFL).toInt))
    // 12 chars, 5 window positions, cuts at 2..5 → 4 unit chunks + tail
    assert(s1 == Seq((1, 1), (2, 1), (3, 1), (4, 1), (5, 8)))
  }

  test("simHashCandidates catches Hamming-near signatures") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val docs = (Seq(
      (1L, base),
      (2L, base + " omega")
    ) ++ (3L to 20L).map(i => (i, s"unrelated text block $i talking about other matters and topics")))
      .toDF("doc_id", "text")
    val cands = Dedup.simHashCandidates(docs, "text", "doc_id", bands = 4, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
  }

  test("levenshtein_within matches Spark's levenshtein(l, r, k) exactly, incl. multibyte") {
    // deterministic generator: random edits over a shared-affix base
    // (the blocked-join shape) plus unicode and pathological cases
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("abcdefg", "0123456789", "\u00e9\u00fc\u4e2d\u6587\ud83d\ude00ab")
    def randStr(alpha: String, len: Int): String = {
      val sb = new StringBuilder
      (0 until len).foreach(_ => sb.append(alpha.charAt(rnd.nextInt(alpha.length))))
      sb.toString
    }
    val cases = scala.collection.mutable.ArrayBuffer[(String, String)](
      ("", ""), ("", "abc"), ("abc", ""), ("same", "same"),
      ("Customer#000000001", "Customer#000000101"),
      ("Customer#000000001", "Customer#00000001"),
      ("caf\u00e9", "cafe"), ("\u4e2d\u6587ab", "\u4e2d\u6587ba"),
      ("\ud83d\ude00x\ud83d\ude00", "\ud83d\ude00y\ud83d\ude00"))
    for (_ <- 1 to 400; alpha <- alphabets) {
      val pre = randStr(alpha, rnd.nextInt(12))
      val suf = randStr(alpha, rnd.nextInt(12))
      val mid1 = randStr(alpha, rnd.nextInt(5))
      val mid2 = randStr(alpha, rnd.nextInt(5))
      cases += ((pre + mid1 + suf, pre + mid2 + suf))
    }
    for (k <- 0 to 3) {
      val df = cases.toSeq.toDF("a", "b")
      val got = df.select(
          native.levenshtein_within($"a", $"b", k).as("mine"),
          levenshtein($"a", $"b", k).as("spark"))
        .collect()
      got.zip(cases).foreach { case (r, (a, b)) =>
        assert(r.getInt(0) == r.getInt(1),
          s"k=$k a='$a' b='$b': mine=${r.getInt(0)} spark=${r.getInt(1)}")
      }
    }
  }
}
