package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Corpus

/** Corpus-level pipeline operators: contamination, stratified
  * sampling, shard stats.
  */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hexThreshold stays 8 hex digits at the 1.0 boundary") {
    // rates just under 1.0 used to round to 2^32 = "100000000" (NINE
    // digits), lexicographically below most md5 prefixes — keeping
    // ~1/16 of a stratum meant to keep ~all of it
    assert(Corpus.hexThreshold(1.0 - 1e-11) == "ffffffff")
    assert(Corpus.hexThreshold(1.0) == "zzzzzzzz")
    assert(Corpus.hexThreshold(0.0) == "00000000")
    assert(Corpus.hexThreshold(0.5) == "80000000")
    assert(Corpus.hexThreshold(1.0 - 1e-11).length == 8)
  }

  test("contamination: planted benchmark overlap is counted, clean docs score 0") {
    val bench = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (0L, bench), // benchmark doc (id % 50 == 0)
      (1L, s"prefix words $bench suffix"), // contains all bench 5-grams
      (2L, "totally unrelated words about something else entirely here"),
      (3L, "tiny doc") // < 5 tokens: zero grams
    ).toDF("doc_id", "text")
    val out = Corpus.contamination(df, $"doc_id" % 50 === 0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // benchmark doc excluded
    // bench has 2 distinct 5-grams; doc 1 (9 tokens -> 5 grams) contains both
    assert(out(1L)._2 == 2 && out(1L)._1 == 5)
    assert(out(2L)._2 == 0L && out(2L)._3 == 0.0)
    assert(out(3L) == ((0L, 0L, 0.0))) // gram-less doc still reported
  }

  test("stratifiedSample: deterministic subset, rate 0 drops all, rate 1 keeps all") {
    val df = (0L until 400L).map(i => (i, if (i % 4 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val kept = Corpus.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 0.0, "zh" -> 1.0), defaultRate = 0.5)
    val langs = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!langs.contains("en")) // rate 0: all dropped
    assert(langs("zh") == 300L) // rate 1: all kept
    // determinism: same input -> identical row set
    val ids1 = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Corpus.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 0.0, "zh" -> 1.0), 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // a fractional rate actually samples (not all, not none)
    val half = Corpus.stratifiedSample(df.filter($"lang" === "en"), "doc_id", "lang",
      Map.empty, defaultRate = 0.5).count()
    assert(half > 20 && half < 80) // 100 en docs at rate .5
  }

  test("repetitionStats: fractions match hand-computed 2-gram counts") {
    val df = Seq(
      (1L, "a b a b a"),        // grams: "a b","b a","a b","b a" -> 4 total, 2 distinct, top 2
      (2L, "x y z"),            // grams: "x y","y z" -> all distinct
      (3L, "solo"),             // < 2 tokens: zero grams
      (4L, "w w w w")           // grams: "w w" x3 -> fully repeated
    ).toDF("doc_id", "text")
    val out = Corpus.repetitionStats(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(1L) == ((4L, 2L, 2L, 0.5, 0.5)))
    assert(out(2L) == ((2L, 2L, 1L, 0.0, 0.5)))
    assert(out(3L) == ((0L, 0L, 0L, 0.0, 0.0)))
    assert(out(4L)._1 == 3L && out(4L)._2 == 1L && out(4L)._4 > 0.66 && out(4L)._5 == 1.0)
  }

  test("tokenRarity: rare tokens counted against corpus document frequency") {
    val df = Seq(
      (1L, "common words here unique1"),   // unique1 df=1 -> rare
      (2L, "common words here unique2"),
      (3L, "common words here"),           // no rare tokens (df=3 each)
      (4L, "")                             // empty doc
    ).toDF("doc_id", "text")
    val out = Corpus.tokenRarity(df, rareDf = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 1L, 0.25)))
    assert(out(2L) == ((4L, 1L, 0.25)))
    assert(out(3L) == ((3L, 0L, 0.0)))
    assert(out(4L) == ((0L, 0L, 0.0)))
  }

  test("noveltyScore: first-occurrence grams credit the earliest doc") {
    val df = Seq(
      (1L, "a b c d"),     // grams "a b c", "b c d" — both first here
      (2L, "a b c d e"),   // "a b c","b c d" seen in 1; "c d e" novel
      (3L, "x y"),         // < 3 tokens: 0 grams, NULL score
      (4L, "a b c d")      // exact re-crawl of 1: nothing novel
    ).toDF("doc_id", "text")
    val out = Corpus.noveltyScore(df, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(out(1L) == ((2L, 2L, Some(1.0))))
    assert(out(2L) == ((3L, 1L, Some(round6(1.0 / 3)))))
    assert(out(3L) == ((0L, 0L, None)))
    assert(out(4L) == ((2L, 0L, Some(0.0))))
  }

  test("qualityFilter: canonical/dup, token bounds, and language gate the keep bit") {
    val good = "the quick brown fox jumps over the lazy dog and runs on"
    val df = Seq(
      (1L, good),          // keep
      (2L, good),          // exact dup of 1 -> not canonical
      (3L, "a b"),         // too few tokens
      (4L, "der und ist nicht ein mit zu das die der und ist") // German
    ).toDF("doc_id", "text")
    val out = Corpus.qualityFilter(df, langs = Set("en"), minTokens = 5)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(out(1L) == ((true, true)))
    assert(out(2L) == ((false, false))) // dup loses canonicality
    assert(out(3L)._2 == false)
    assert(out(4L) == ((true, false))) // canonical but wrong language
  }

  test("temperatureMix: rarest source keeps all, dominant downsamples toward sqrt rate") {
    // 400 "web" docs vs 25 "books" docs: rate_books = 1.0, rate_web = sqrt(25/400) = 0.25
    val df = ((0L until 400L).map(i => (i, "web")) ++ (400L until 425L).map(i => (i, "books")))
      .toDF("doc_id", "source")
    val kept = Corpus.temperatureMix(df, "doc_id", "source")
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("books") == 25L) // rate 1.0: everything survives
    val web = bySrc("web")
    assert(web > 60 && web < 140, s"web kept $web of 400 at rate 0.25") // md5 coin ≈ binomial(400, .25)
    val rates = kept.select("source", "rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("books") == 1.0 && rates("web") == 0.25)
    // determinism: identical row set on re-run
    val ids1 = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Corpus.temperatureMix(df, "doc_id", "source")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("deterministicSplit: total partition, stable under reruns AND corpus growth") {
    val weights = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val small = (0L until 500L).toDF("doc_id")
    val out = Corpus.deterministicSplit(small, "doc_id", weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 500) // exactly one split per row
    val by = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(by("train") > 420 && by("train") < 480, s"train=${by("train")}")
    assert(by.getOrElse("val", 0) + by.getOrElse("test", 0) == 500 - by("train"))
    // growth stability: the first 500 docs keep their split when the
    // corpus doubles — the property randomSplit does NOT have
    val grown = Corpus.deterministicSplit((0L until 1000L).toDF("doc_id"), "doc_id", weights)
      .filter(col("doc_id") < 500)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(grown == out)
  }

  test("splitLeakage: emits exactly the straddling pairs, splits match assignment") {
    val weights = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val ids = (0L until 200L)
    val pairs = ids.flatMap(a => Seq((a, a + 7), (a, a + 13)))
      .filter(_._2 < 200L).toDF("id_a", "id_b")
    val out = Corpus.splitLeakage(pairs, "id_a", "id_b", weights)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    // every emitted pair straddles
    assert(out.forall { case (_, _, sa, sb) => sa != sb })
    // split names agree with deterministicSplit's assignment per id
    val assign = Corpus.deterministicSplit(ids.toDF("doc_id"), "doc_id", weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.forall { case (a, b, sa, sb) => assign(a) == sa && assign(b) == sb })
    // completeness: count straddlers directly from the assignment
    val expected = ids.flatMap(a => Seq((a, a + 7), (a, a + 13)))
      .filter(_._2 < 200L).count { case (a, b) => assign(a) != assign(b) }
    assert(out.length == expected && expected > 0)
  }

  test("selectUnderBudget equals the sequential greedy selection incl. the straddler") {
    // quality has 5 discrete levels; build docs whose quality differs
    // via word counts and check against a driver-side greedy fold
    val docs = (0L until 120L).map { i =>
      val words = (i % 7) + 1 // 1..7 words: crosses the n_words>=3 gate
      (i, Seq.fill(words.toInt)("w" + i).mkString(" "))
    }.toDF("doc_id", "text")
    val budget = 150L
    val got = graft.operators.Corpus
      .selectUnderBudget(docs, budget, bucketWidth = 16)
      .orderBy($"tokens_before")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // sequential reference: same (quality desc, id) order, same scorer
    val scored = docs.select($"doc_id",
      graft.functions.TextFunctions.qualityScore($"text").as("q"),
      graft.functions.TextFunctions.tokenCount($"text").cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, q, _) => (-q, id) }
    var acc = 0L
    val want = scored.flatMap { case (id, _, n) =>
      val before = acc; acc += n
      if (before < budget) Some((id, n, before)) else None
    }
    assert(got.toSeq == want.toSeq)
    // the straddler is admitted: last row's before < budget <= before + n
    val last = want.last
    assert(last._3 < budget && last._3 + last._2 >= budget)
  }

  test("selectUnderBudget property: equals the sequential fold for random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.choose(1, 80)
      words <- Gen.listOfN(n, Gen.choose(1, 9))
      budget <- Gen.choose(1L, 400L)
      bw <- Gen.oneOf(4L, 16L, 64L)
    } yield (words, budget, bw)
    val prop = Prop.forAll(gen) { case (words, budget, bw) =>
      val docs = words.zipWithIndex.map { case (w, i) =>
        (i.toLong, Seq.fill(w)("t" + i).mkString(" "))
      }.toDF("doc_id", "text").repartition(5)
      val got = graft.operators.Corpus
        .selectUnderBudget(docs, budget, bucketWidth = bw)
        .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq
      val scored = docs.select($"doc_id",
        graft.functions.TextFunctions.qualityScore($"text").as("q"),
        graft.functions.TextFunctions.tokenCount($"text").cast("long").as("n"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .sortBy { case (id, q, _) => (-q, id) }
      var acc = 0L
      val want = scored.flatMap { case (id, _, n) =>
        val before = acc; acc += n
        if (before < budget) Some((id, before)) else None
      }.sortBy(_._1).toSeq
      got == want
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(r.passed, r.status.toString)
  }

  test("upsample: factor 2.5 emits 2 or 3 deterministic copies, mean near 2.5") {
    val df = (0L until 400L).map(i => (i, if (i < 200) "zh" else "en"))
      .toDF("doc_id", "lang")
    val out = Corpus.upsample(df, "doc_id", "lang", Map("zh" -> 2.5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    // en: exactly one copy each, copy index 0
    (200L until 400L).foreach(i => assert(byDoc(i) == Seq(0L)))
    // zh: 2 or 3 contiguous copy indices; mean multiplicity ~ 2.5
    val zhCounts = (0L until 200L).map(i => byDoc(i).size)
    assert(zhCounts.forall(n => n == 2 || n == 3))
    (0L until 200L).foreach(i => assert(byDoc(i) == (0 until byDoc(i).size).map(_.toLong)))
    val mean = zhCounts.sum.toDouble / 200
    assert(mean > 2.3 && mean < 2.7, s"mean $mean")
    // determinism
    val again = Corpus.upsample(df, "doc_id", "lang", Map("zh" -> 2.5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("ngramCounts: occurrence and doc-frequency counts, deterministic cut at k") {
    val df = Seq(
      (1L, "a b a b a b"), // "a b" x3, "b a" x2
      (2L, "a b c"),       // "a b", "b c"
      (3L, "x y")          // "x y"
    ).toDF("doc_id", "text")
    val out = Corpus.ngramCounts(df, n = 2, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "a b": 4 occurrences over 2 docs; tie at the k=2 cut between
    // "b a"(2) and the 1-count grams resolves by count desc, gram asc
    assert(out.toSeq == Seq(("a b", 4L, 2L), ("b a", 2L, 1L)))
    val again = Corpus.ngramCounts(df, n = 2, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq)
  }

  test("invertedIndex: postings are distinct, sorted, and shard-partitioned") {
    val df = Seq(
      (0L, "alpha beta alpha"),   // dup token within doc -> one posting
      (1L, "beta  gamma"),        // multi-space
      (8L, "beta"),               // same shard as doc 0 (mod 8)
      (9L, "ALPHA")               // case-folds into alpha, shard 1
    ).toDF("doc_id", "text")
    val out = Corpus.invertedIndex(df, nShards = 8).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getSeq[Long](3))))
      .toMap
    assert(out(("alpha", 0L)) == ((1L, Seq(0L))))
    assert(out(("alpha", 1L)) == ((1L, Seq(9L))))
    assert(out(("beta", 0L)) == ((2L, Seq(0L, 8L)))) // sorted within shard
    assert(out(("beta", 1L)) == ((1L, Seq(1L))))
    assert(out(("gamma", 1L)) == ((1L, Seq(1L))))
    assert(out.size == 5)
    // df_shard always equals the posting-list length
    assert(out.values.forall { case (dfs, p) => dfs == p.size })
  }

  test("shardStats: counts partition the corpus and tokens sum up") {
    val df = (0L until 200L).map(i => (i, s"word$i tok tok")).toDF("doc_id", "text")
    val stats = Corpus.shardStats(df).collect()
    assert(stats.map(_.getString(0)).forall(s => s.length == 1 && "0123456789abcdef".contains(s)))
    assert(stats.map(_.getLong(1)).sum == 200L)
    assert(stats.map(_.getLong(2)).sum == 600L) // 3 tokens per doc
    assert(stats.forall(r => r.getString(3) <= r.getString(4))) // fp_min <= fp_max
  }

  test("bigramLmScore: add-one bigram probabilities, short docs score null") {
    val df = Seq(
      (1L, "a b a b"),   // bigrams: (a b), (b a), (a b)
      (2L, "a b"),       // bigram: (a b)
      (3L, "x"),         // no bigram
      (4L, "")           // no tokens
    ).toDF("doc_id", "text")
    val out = Corpus.bigramLmScore(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    // corpus: C(a b)=3, C(b a)=1; C1(a)=3, C1(b)=1; V={a,b,x}=3
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lpAB = r6(math.log(4.0 / 6.0)) // (3+1)/(3+3)
    val lpBA = r6(math.log(2.0 / 4.0)) // (1+1)/(1+3)
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2.get - r6((2 * lpAB + lpBA) / 3.0)) < 1e-9)
    assert(out(2L) == ((1L, Some(lpAB))))
    assert(out(3L) == ((0L, None)) && out(4L) == ((0L, None)))
  }

  test("importanceWeights: target-vocab docs weigh positive, raw-vocab negative") {
    // disjoint vocab: target docs all "good…", raw docs all "junk…"
    val df = (
      (0L until 10L).map(i => (i, s"good$i goodcommon", true)) ++
      (10L until 30L).map(i => (i, s"junk$i junkcommon junkmore", false)) ++
      Seq((99L, "", false))
    ).toDF("doc_id", "text", "is_tgt")
    val out = Corpus.importanceWeights(df, isTarget = col("is_tgt"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.size == 31)
    // deterministic across runs
    val again = Corpus.importanceWeights(df, isTarget = col("is_tgt"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out == again)
    assert(out(99L) == ((false, 0L, 0.0))) // empty doc: no tokens, weight 0
    // with disjoint vocabularies the mean target weight must exceed the
    // mean raw weight decisively (bucket collisions can blur single docs)
    val tgt = out.filter(x => x._2._1 && x._1 != 99L).values.map(_._3)
    val raw = out.filter(x => !x._2._1 && x._1 != 99L).values.map(_._3)
    assert(tgt.sum / tgt.size > raw.sum / raw.size + 1.0,
      s"target mean ${tgt.sum / tgt.size} vs raw mean ${raw.sum / raw.size}")
  }

  test("linearClassifierInfer: probabilities, empty-doc neutrality, determinism") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark shuffles partitions across the cluster executors"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Corpus.linearClassifierInfer(df)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out.size == 3)
    out.values.foreach { case (_, p, keep) =>
      assert(p > 0.0 && p < 1.0)
      assert(keep == (p >= 0.5))
    }
    assert(out(3L)._1 == 0L && out(3L)._2 == 0.5) // no tokens → σ(0)
    val again = Corpus.linearClassifierInfer(df)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out == again)
  }

  test("corpus_weighted_sample: min(k, |group|) winners per language, ranks contiguous") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val out = SparkEntry.queries("corpus_weighted_sample")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val sizes = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(_._1).toSet == sizes.keySet)
    out.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.length.toLong == math.min(40L, sizes(lang)),
        s"$lang: ${rows.length} winners for group of ${sizes(lang)}")
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length.toLong).toSeq)
    }
  }

  test("globalIds: contiguous 0..n-1 in key order across many partitions") {
    import spark.implicits._
    // skewed, non-contiguous keys in scrambled input order
    val keys = ((1L to 400L) ++ Seq(100000L, 5000L, 99999L)).reverse
    val df = keys.toDF("k").repartition(7)
    val out = Corpus.globalIds(df, "k", nParts = 5)
      .select("k", "global_id").as[(Long, Long)].collect().sortBy(_._1)
    val expect = keys.sorted.zipWithIndex.map { case (k, i) => (k, i.toLong) }
    assert(out.toSeq == expect)
  }

  test("globalIds is deterministic across runs") {
    import spark.implicits._
    val df = (1L to 300L).toDF("k").repartition(5)
    val a = Corpus.globalIds(df, "k", nParts = 4).select("k", "global_id")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = Corpus.globalIds(df, "k", nParts = 4).select("k", "global_id")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("spanCorruptionPlan: invariants, bounds, and cross-run determinism") {
    val docs = (1L to 60L).map(i => (i, Seq.fill((i % 17 + 1).toInt)("tok")
      .zipWithIndex.map { case (t, j) => s"$t$j" }.mkString(" ")))
      .toDF("doc_id", "text")
    def run() = Corpus.spanCorruptionPlan(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    val m = run()
    assert(m.size == 60) // every non-empty doc appears
    m.foreach { case (id, (n, spans, masked, ratio)) =>
      assert(n == id % 17 + 1, s"doc $id token count")
      assert(masked <= n, s"doc $id masked > tokens")
      assert((spans == 0) == (masked == 0), s"doc $id span/mask consistency")
      assert(masked >= spans, s"doc $id spans cover at least one token each")
      assert(ratio == BigDecimal(masked.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"doc $id ratio")
    }
    assert(m == run(), "mask plan must be deterministic across runs")
    // the corpus-level mask rate should sit near the T5 operating
    // point (1/20 starts x mean len 3 ~ 15%, minus clip/overlap)
    val totalMasked = m.values.map(_._3).sum.toDouble
    val totalToks = m.values.map(_._1).sum.toDouble
    assert(totalMasked / totalToks > 0.02 && totalMasked / totalToks < 0.40,
      s"corpus mask rate ${totalMasked / totalToks} out of plausible band")
  }

  test("zipfAlpha: exact Hill estimator on a constructed frequency mix, " +
      "tokens below fMin excluded") {
    // frequencies: t1=40, t2=20, t3=10, t4=5 (tail), t5=3, t6=1 (below)
    val toks = Seq.fill(40)("t1") ++ Seq.fill(20)("t2") ++
      Seq.fill(10)("t3") ++ Seq.fill(5)("t4") ++ Seq.fill(3)("t5") ++ Seq("t6")
    // spread across 4 docs so the token count is a genuine corpus agg
    val docs = toks.grouped(20).map(_.mkString(" ")).toSeq.toDF("text")
    val r = Corpus.zipfAlpha(docs, col("text"), fMin = 5).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((6L, 4L, 5L, 40L)))
    val lsum = Seq(40.0, 20.0, 10.0, 5.0)
      .map(f => BigDecimal(round6(math.log(f / 5.0)))).sum
    assert(r.getDouble(4) == round6(1.0 + 4.0 / lsum.toDouble))
  }

  test("zipfAlpha: a flat tail (every tail token exactly at fMin) gives " +
      "NULL alpha, not Infinity") {
    val docs = Seq.fill(5)("a b c").toDF("text")  // a,b,c each freq 5
    val r = Corpus.zipfAlpha(docs, col("text"), fMin = 5).collect()(0)
    assert(r.getLong(1) == 3L && r.isNullAt(4))
  }
}
