package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level training-data-pipeline operators: benchmark
  * contamination detection, deterministic stratified sampling (domain
  * mixing), and hash-sharding for training-data export. (The reference,
  * a CDC pipeline, has no corpus surface; these extend the
  * training-pipeline tier alongside [[Dedup]]/[[Similarity]].)
  *
  * All three are built on deterministic, engine-portable primitives
  * (md5, word shingles) so every one is DuckDB-oracle-checkable — no
  * `rand()` anywhere.
  */
object Corpus {

  /** Benchmark-contamination check: for every training document, how
    * many of its distinct word `n`-grams also occur in the benchmark
    * set (`isBenchmark` rows). The standard decontamination pass run
    * before a model ever sees the corpus.
    *
    * Scale shape: the benchmark n-gram set is broadcast (benchmark
    * suites are small by construction — that is the premise of the
    * check), so the corpus side is scan → project shingles →
    * explode_outer → broadcast left join → one groupBy(doc_id) with
    * map-side combine. Zero corpus-vs-corpus shuffles; `explode_outer`
    * keeps gram-less (short) documents in the report.
    */
  def contamination(docs: DataFrame, isBenchmark: Column, n: Int = 5,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // stage tokenization through a projected column: embedding the
    // tokenizer expression inside the shingle lambda would re-run the
    // regex split once per gram (O(tokens²) per doc, and a generated
    // method big enough to take seconds to JIT)
    val shingled = docs
      .select(col(idCol), isBenchmark.as("__bench"),
        TextFunctions.tokens(lower(col(textCol))).as("__toks"))
      .select(col(idCol), col("__bench"),
        TextFunctions.wordShinglesOf(col("__toks"), n).as("grams"))
    val bench = shingled.filter(col("__bench"))
      .select(explode(col("grams")).as("gram")).distinct()
      .withColumn("__hit", lit(1L))
    shingled.filter(!col("__bench"))
      .select(col(idCol), size(col("grams")).cast("long").as("n_grams"),
        explode_outer(col("grams")).as("gram"))
      .join(broadcast(bench), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(first(col("n_grams")).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_shared"))
      .select(col(idCol), col("n_grams"), col("n_shared"),
        when(col("n_grams") > 0,
          round(col("n_shared").cast("double") / col("n_grams"), 6))
          .otherwise(lit(0.0)).as("contamination"))
  }

  /** 32-bit md5 coin of a row id — long in [0, 2³²), THE deterministic
    * sampling primitive every split/mix/upsample operator shares. Must
    * stay byte-for-byte in sync with the oracle form
    * `CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8) AS BIGINT)`
    * and the 2³² threshold-scaling convention — one definition so a
    * drift cannot hit a single operator silently.
    */
  def md5Coin(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** Uniform-in-[0,1) deterministic coin for a row id: the first 8 hex
    * chars of `md5(id)` compared as a STRING against a precomputed hex
    * threshold — engine-portable (md5 hex is lowercase in both Spark
    * and DuckDB, and hex strings order lexicographically like their
    * values), reproducible across runs, and a pure projection.
    */
  def hashKeep(id: Column, rate: Double): Column =
    substring(md5(id.cast("string")), 1, 8) < lit(hexThreshold(rate))

  /** 8-hex-digit threshold for `rate`; rates ≥ 1.0 use a sentinel above
    * every hex digit so the comparison keeps everything.
    */
  def hexThreshold(rate: Double): String = {
    require(rate >= 0.0, s"sampling rate must be >= 0, got $rate")
    if (rate >= 1.0) "zzzzzzzz"
    else {
      // clamp: rates just under 1.0 round to 2^32, which would render
      // as NINE hex digits — lexicographically below every prefix
      // starting ≥ '2', silently keeping ~1/16 instead of ~all
      val t = math.min(math.round(rate * 4294967296.0), 4294967295L)
      f"$t%08x"
    }
  }

  /** Deterministic stratified sampling — the domain/language mixing
    * step of a training-data pipeline (downsample the dominant stratum,
    * keep the low-resource ones). Each row keeps or drops on its own
    * [[hashKeep]] coin at its stratum's rate: a pure filter projection,
    * no shuffle, no state, exactly reproducible at any scale.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit(hexThreshold(rate))).otherwise(acc)
    }
    df.filter(substring(md5(col(idCol).cast("string")), 1, 8) < threshold)
  }

  /** Deterministic train/val/test assignment — the split step every
    * training-data pipeline runs last: each row lands in exactly one
    * named split by comparing its 32-bit md5 coin against the
    * cumulative-weight thresholds. Hash-based (not `randomSplit`) so
    * the assignment is stable under reruns, re-partitioning, and
    * engine changes — a document keeps its split forever, which is
    * what makes held-out sets trustworthy as the corpus grows. A pure
    * projection: no shuffle, no state, embarrassingly parallel at any
    * scale.
    *
    * @param splits ordered (name, weight) pairs; weights sum to ~1.
    *               Boundaries are exact longs (`round(cum · 2³²)`), so
    *               both engines make identical assignments.
    */
  def deterministicSplit(df: DataFrame, idCol: String,
                         splits: Seq[(String, Double)]): DataFrame =
    df.select(col(idCol), splitColumn(col(idCol), splits).as("split"))

  /** The split-name expression behind [[deterministicSplit]], exposed
    * as a Column so callers can assign splits to ANY id column (e.g.
    * both endpoints of a near-dup pair in [[splitLeakage]]) without a
    * join — split assignment is a pure projection of the id.
    */
  def splitColumn(id: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0))
    val bounds = splitBounds(splits)
    val coin = md5Coin(id)
    bounds.init.foldRight(lit(bounds.last._1): Column) {
      case ((name, hi), acc) => when(coin < hi, name).otherwise(acc)
    }
  }

  /** Split-leakage audit: near-duplicate candidate pairs whose two
    * documents land in DIFFERENT splits — the train/test contamination
    * every held-out evaluation silently suffers when dedup runs after
    * (or never meets) the split. Input is any (id_a, id_b, score)
    * candidate relation (MinHash-LSH pairs here); output is the
    * straddling pairs with both split names (unordered — sort on the
    * score column if presenting a top list).
    *
    * Scale shape: split assignment is a pure projection of each id
    * column (no join, no shuffle — the md5 coin computes inside
    * codegen), so the whole audit is a filter over the candidate
    * relation: it inherits LSH's bucket-capped bound and adds zero
    * exchanges at any corpus size.
    */
  def splitLeakage(pairs: DataFrame, idA: String, idB: String,
                   splits: Seq[(String, Double)]): DataFrame =
    pairs
      .withColumn("split_a", splitColumn(col(idA), splits))
      .withColumn("split_b", splitColumn(col(idB), splits))
      .filter(col("split_a") =!= col("split_b"))

  /** (name, exclusive upper coin bound) per split — cumulative weights
    * scaled to 2³² and rounded once, shared with the oracle so the
    * literal boundaries are identical on both engines.
    */
  def splitBounds(splits: Seq[(String, Double)]): Seq[(String, Long)] = {
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    splits.map(_._1).zip(cum.map(c => math.round(c * 4294967296.0)))
  }

  /** Deterministic fractional upsampling — the complement of
    * downsample mixing: a low-resource stratum with factor f appears
    * ⌊f⌋ times plus one more when the row's md5 coin clears frac(f),
    * so the EXPECTED multiplicity is exactly f while every run emits
    * the identical row set (no RNG state, no `sample` nondeterminism).
    * Pure projection + generator: `array_repeat`/`posexplode`, no
    * shuffle at any scale; `copy` disambiguates the clones for
    * downstream shuffling/packing.
    */
  def upsample(df: DataFrame, idCol: String, stratumCol: String,
               factors: Map[String, Double], defaultFactor: Double = 1.0): DataFrame = {
    require((factors.values ++ Seq(defaultFactor)).forall(_ >= 0))
    val coin = md5Coin(col(idCol))
    def copies(f: Double): Column = {
      val whole = math.floor(f).toLong
      val fracBound = math.round((f - whole) * 4294967296.0)
      (lit(whole) + when(coin < lit(fracBound), 1L).otherwise(0L)).cast("int")
    }
    val n = factors.foldLeft(copies(defaultFactor)) { case (acc, (stratum, f)) =>
      when(col(stratumCol) === stratum, copies(f)).otherwise(acc)
    }
    df.select(col(idCol), col(stratumCol), array_repeat(lit(1), n).as("__r"))
      .select(col(idCol), col(stratumCol),
        posexplode(col("__r")).as(Seq("copy", "__one")))
      .select(col(idCol), col(stratumCol), col("copy").cast("long").as("copy"))
  }

  /** Corpus-wide n-gram statistics — the language-model counting pass
    * (LM smoothing tables, boilerplate mining, contamination lookups):
    * each token n-gram's total occurrence count and document
    * frequency, cut to the top `k` grams (count desc, gram asc —
    * deterministic at the boundary).
    *
    * Scale shape: project grams (no shuffle) → explode → one
    * (doc, gram) count agg → one gram-keyed agg, all map-side
    * combined; the final top-k is a distributed TakeOrdered moving k
    * rows, never a global sort of the gram vocabulary.
    */
  def ngramCounts(docs: DataFrame, n: Int = 2, k: Int = 100,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = docs
      .select(col(idCol),
        TextFunctions.nonEmptyTokens(lower(col(textCol))).as("__toks"))
      .select(col(idCol),
        explode(TextFunctions.wordShinglesAllOf(col("__toks"), n)).as("gram"))
    grams.groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col("gram"))
      .agg(sum(col("c")).as("n_occurrences"), count(lit(1)).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("gram"))
      .limit(k)
  }

  /** Sharded inverted index — term → sorted posting list, the
    * retrieval/contamination-lookup infrastructure export. Posting
    * lists are built PER SHARD (`doc_id mod nShards`): at 100 TB a
    * stop-word's corpus-wide posting list cannot sit in one
    * aggregation buffer, so the index is materialized the way it
    * would be stored and served — one bounded list per (term, shard),
    * each ≤ the shard's doc count, a term's full list recovered by
    * reading its shard rows. Plan: explode → distinct (term, doc) →
    * ONE grouped aggregation keyed (term, shard); raising nShards is
    * the knob that keeps every buffer bounded as the corpus grows.
    */
  def invertedIndex(df: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", nShards: Int = 8): DataFrame = {
    require(nShards >= 1)
    df.select(col(idCol).cast("long").as("doc_id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
      .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
      .groupBy(col("term"), col("shard"))
      .agg(count(lit(1)).as("df_shard"),
        sort_array(collect_list(col("doc_id"))).as("postings"))
  }

  /** Gopher-style repetition metrics per document (Rae et al. 2021,
    * "Scaling Language Models" §A1.1 quality rules, adapted to token
    * n-grams): how much of a document is the same n-gram over and over.
    * High duplicate-gram or top-gram fractions flag boilerplate, SEO
    * spam, and degenerate generations — the standard repetition filter
    * that runs next to [[graft.functions.TextFunctions.qualityScore]].
    *
    * Output per doc: `n_grams` (n-gram occurrences), `n_distinct`,
    * `top_count` (occurrences of the most frequent gram),
    * `dup_gram_frac` = (n_grams − n_distinct)/n_grams,
    * `top_gram_frac` = top_count/n_grams (6 dp).
    *
    * Scale shape: project grams (no shuffle) → explode → two-level
    * groupBy((doc, gram) then doc), both hash aggregates with map-side
    * combine keyed by doc id — so the shuffle volume is one row per
    * distinct (doc, gram), bounded by corpus token count, and there is
    * no window/sort anywhere. Docs with fewer than `n` tokens surface
    * with zero counts via the left join (they trivially pass a
    * repetition filter).
    */
  def repetitionStats(docs: DataFrame, n: Int = 2, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val grams = docs
      .select(col(idCol),
        TextFunctions.nonEmptyTokens(lower(col(textCol))).as("__toks"))
      .select(col(idCol),
        explode(TextFunctions.wordShinglesAllOf(col("__toks"), n)).as("gram"))
    val perDoc = grams
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_grams"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_count"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("top_count"), lit(0L)).as("top_count"))
      .withColumn("dup_gram_frac",
        when(col("n_grams") > 0,
          round((col("n_grams") - col("n_distinct")).cast("double") / col("n_grams"), 6))
          .otherwise(lit(0.0)))
      .withColumn("top_gram_frac",
        when(col("n_grams") > 0,
          round(col("top_count").cast("double") / col("n_grams"), 6))
          .otherwise(lit(0.0)))
  }

  /** Token-rarity score — an integer-exact stand-in for the LM-perplexity
    * quality signal (a doc made of corpus-rare tokens is "surprising"):
    * for each document, the count of distinct tokens, how many of them
    * are corpus-rare (document frequency ≤ `rareDf`), and the rare
    * fraction. All arithmetic is integer counts + one final rounded
    * division, so it is exactly engine-portable where a log-prob mean
    * (whose float sum order and `ln` bit-patterns differ across
    * engines) would not be.
    *
    * Scale shape: distinct (doc, token) explode → one groupBy(token)
    * for the document-frequency table (map-side combined) → shuffle
    * join back on token → groupBy(doc). Both shuffles are keyed by
    * token/doc and pre-combined; nothing is ever corpus × corpus.
    */
  def tokenRarity(docs: DataFrame, rareDf: Long = 2, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    // docTok feeds BOTH the document-frequency table and the join back
    // — checkpoint so the scan+tokenize+explode runs once, not twice
    val docTok = docs
      .select(col(idCol),
        explode(array_distinct(TextFunctions.nonEmptyTokens(lower(col(textCol)))))
          .as("tok"))
      .localCheckpoint()
    val dfTable = docTok.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
    docs.select(col(idCol))
      .join(
        docTok.join(dfTable, "tok")
          .groupBy(col(idCol))
          .agg(count(lit(1)).as("n_tokens_distinct"),
            sum(when(col("df") <= rareDf, 1L).otherwise(0L)).as("n_rare")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens_distinct"), lit(0L)).as("n_tokens_distinct"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"))
      .withColumn("rare_frac",
        when(col("n_tokens_distinct") > 0,
          round(col("n_rare").cast("double") / col("n_tokens_distinct"), 6))
          .otherwise(lit(0.0)))
  }

  /** Per-document n-gram NOVELTY: the fraction of a document's distinct
    * word n-grams whose corpus-FIRST occurrence (minimum `idCol` over
    * all docs containing the gram) is this document. Curation pipelines
    * use it to rank what a crawl increment actually adds — boilerplate
    * and recombined spam score near 0, genuinely new text near 1. The
    * id order stands in for arrival order (deterministic in both
    * engines).
    *
    * Scale shape: mirrors [[tokenRarity]] — distinct (doc, gram)
    * explode with the gram carried as its md5 fingerprint (32-byte
    * shuffle keys, never gram text), ONE map-side-combined
    * groupBy(fp) for the first-occurrence table, equi-join back, ONE
    * groupBy(doc). Docs with fewer than `n` tokens surface with 0
    * grams and a NULL score.
    */
  def noveltyScore(docs: DataFrame, n: Int = 3, idCol: String = "doc_id",
                   textCol: String = "text", nParts: Int = 32): DataFrame = {
    require(n >= 1, "shingle length must be >= 1")
    // spread the shingle+md5 work across tasks BEFORE the explode (a
    // small parquet arrives as one input split, which would serialize
    // the per-row n-gram/byte work on a single core), and persist the
    // exploded relation — it feeds both the first-occurrence aggregate
    // and the join back
    val grams = docs.repartition(nParts, col(idCol))
      // stage the token array through a projection (the one-shot
      // wordShingles form re-runs the split regex once per output gram
      // — the O(tokens²) trap charShinglesOf's doc warns about)
      .select(col(idCol),
        TextFunctions.tokens(lower(col(textCol))).as("__toks"))
      .select(col(idCol),
        explode(TextFunctions.wordShinglesOf(col("__toks"), n)).as("g"))
      .select(col(idCol), md5(col("g")).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val firsts = grams.groupBy(col("fp")).agg(min(col(idCol)).as("first_doc"))
    val out = docs.select(col(idCol))
      .join(
        grams.join(firsts, "fp")
          .groupBy(col(idCol))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("first_doc") === col(idCol), 1L).otherwise(0L)).as("n_novel")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(col("n_grams") > 0,
          round(col("n_novel").cast("double") / col("n_grams"), 6)).as("novelty"))
    // pin the per-doc result, release the grams-sized intermediate —
    // repeated calls must not accumulate corpus-sized cached relations
    Eval.pinAndRelease(out, grams)
  }

  /** Composite corpus filter — the keep/drop decision a training-data
    * export actually runs, folding the individual signals
    * ([[graft.functions.TextFunctions.qualityScore]], language ID,
    * token budget, exact-dup rank) into one row per document with the
    * reasons spelled out. Pure projections plus one window over the
    * content fingerprint (the exact-dup group), so the only shuffle is
    * the dedup key.
    */
  def qualityFilter(docs: DataFrame, langs: Set[String],
                    minTokens: Int = 5, maxTokens: Int = 100000,
                    minQuality: Double = 0.5,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__fp")).orderBy(col(idCol))
    docs
      .select(col(idCol),
        TextFunctions.contentFingerprint(col(textCol)).as("__fp"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        round(TextFunctions.qualityScore(col(textCol)), 6).as("quality"),
        TextFunctions.langId(col(textCol)).as("lang_pred"))
      .withColumn("is_canonical", row_number().over(w) === 1)
      .select(col(idCol), col("n_tokens"), col("quality"), col("lang_pred"),
        col("is_canonical"),
        (col("is_canonical") &&
          col("n_tokens").between(minTokens, maxTokens) &&
          col("quality") >= minQuality &&
          col("lang_pred").isInCollection(langs)).as("keep"))
  }

  /** Deterministic hash-sharding stats for training-data export: shard
    * by the first hex digit of `md5(id)` (16 shards) and report per
    * shard the doc count, total whitespace tokens, and min/max content
    * fingerprints (an order-independent integrity check a downstream
    * loader can re-verify per shard).
    *
    * One 16-group aggregation with map-side partial agg — the shard
    * assignment itself is a projection, so at 100 TB this is a single
    * scan plus a trivial shuffle of 16 rows per task.
    */
  def shardStats(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(substring(md5(col(idCol).cast("string")), 1, 1).as("shard"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_toks"),
      md5(col(textCol)).as("fp"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
        min(col("fp")).as("fp_min"), max(col("fp")).as("fp_max"))

  /** Per-domain document cap — the "no single source dominates the
    * mix" rule of corpus assembly: keep at most `k` documents per
    * stratum, chosen by a deterministic md5 coin (so the sample is
    * reproducible and uniform within the stratum, not
    * insertion-order-biased).
    *
    * Selection is [[TopK.topKPerGroup]]'s bounded min-heap aggregate —
    * map-side partial aggregation with O(k) state per stratum — never a
    * stratum-wide sort/window. The coin (first 8 md5 hex digits as an
    * integer) is exact in a double, so ranking is engine-portable.
    */
  def capPerStratum(docs: DataFrame, k: Int, strataCol: String = "source",
                    idCol: String = "doc_id"): DataFrame = {
    val scored = docs.select(col(strataCol), col(idCol),
      md5Coin(col(idCol)).cast("double").as("coin"))
    TopK.topKPerGroup(scored, Seq(strataCol), "coin", idCol, k)
  }

  /** Temperature-flattened source mixing — the data-mixing step of LLM
    * corpus assembly (cf. multilingual sampling in Conneau & Lample
    * 2019 §3.1): sample each source at rate `(min_count/count)^0.5` so
    * dominant sources are downsampled toward the rarest one instead of
    * a hard cap. The exponent is fixed at 0.5 (sqrt) because IEEE sqrt
    * and division are correctly rounded in every engine — a general
    * `pow(x, α)` is not, and would break oracle portability.
    *
    * Keep/drop per row is the [[hashKeep]] md5 coin against
    * `round(rate · 2³²)` — deterministic, reproducible, a pure filter.
    * Scale shape: one tiny per-source count aggregate (map-side
    * combined), a 1-row min broadcast back over it, then a broadcast
    * join of the rate table onto the corpus scan. No corpus-sized
    * shuffle at any size.
    */
  def temperatureMix(df: DataFrame, idCol: String = "doc_id",
                     stratumCol: String = "source"): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__c"))
    val mn = counts.agg(min(col("__c")).as("__m"))
    val rates = counts.crossJoin(broadcast(mn))
      .select(col(stratumCol),
        sqrt(col("__m").cast("double") / col("__c").cast("double")).as("__rate"))
    val coin = md5Coin(col(idCol))
    df.select(col(idCol), col(stratumCol))
      .join(broadcast(rates), stratumCol)
      .filter(coin < round(col("__rate") * lit(4294967296.0)).cast("long"))
      .select(col(idCol), col(stratumCol), round(col("__rate"), 6).as("rate"))
  }

  /** BM25 keyword relevance over the corpus for a fixed query-term set
    * — the retrieval scoring behind corpus search / quality probes
    * (Robertson idf, Lucene parameterization: k1 term-frequency
    * saturation, b length normalization).
    *
    * Scale shape: per-term tf is `size(filter(tokens, = term))` — a
    * pure projection inside codegen, no explode→groupBy round trip —
    * and the corpus statistics (N, total length, per-term df) reduce to
    * ONE scalar row broadcast back, so the whole query is a scan, a
    * single one-row aggregate, and a second scan-side projection. No
    * corpus-sized shuffle at any size.
    *
    * Float discipline: the score sums per-term contributions in the
    * FIXED order of `terms` (one projection expression, not a SUM
    * aggregate), so addition order — and therefore the 6-dp-rounded
    * result — is engine-portable.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty)
    def tfCol(t: String): Column =
      size(filter(TextFunctions.tokens(lower(trim(col(textCol)))),
        x => x === lit(t))).cast("long")
    // internal columns are addressed by term INDEX, not term text — a
    // term containing '.' would make col("__tf_u.s.") parse as a nested
    // field path, and duplicate terms would alias-collide
    val idx = terms.indices
    val base = docs.select(
      col(idCol) +:
        TextFunctions.tokenCount(col(textCol)).cast("long").as("dl") +:
        idx.map(i => tfCol(terms(i)).as(s"__tf_$i")): _*)
    val statAggs = count(lit(1)).cast("double").as("__n") +:
      sum(col("dl")).cast("double").as("__total_dl") +:
      idx.map(i =>
        sum(when(col(s"__tf_$i") > 0, 1L).otherwise(0L)).cast("double").as(s"__df_$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val avgdl = col("__total_dl") / col("__n")
    def contrib(i: Int): Column = {
      val tf = col(s"__tf_$i").cast("double")
      val df = col(s"__df_$i")
      val idf = log(lit(1.0) + (col("__n") - df + lit(0.5)) / (df + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))
    }
    base.crossJoin(broadcast(stats))
      .select(col(idCol), col("dl"),
        idx.map(i => (col(s"__tf_$i") > 0).cast("long").as(s"hit_$i")).reduce(_ + _).as("n_hit"),
        round(idx.map(contrib).reduce(_ + _), 6).as("bm25"))
  }

  /** Bigram language-model quality score — the count-LM document filter
    * of CCNet (Wenzek et al. 2020) with the pretrained KenLM replaced by
    * an add-one-smoothed bigram model trained on the corpus itself:
    * every document scores the mean natural-log probability of its
    * bigrams, P(w₂|w₁) = (C(w₁ w₂)+1) / (C(w₁ ·)+V). Low scores flag
    * gibberish and ultra-rare constructions, anomalously high ones
    * boilerplate — the statistical quality axis that runs next to the
    * heuristic [[graft.functions.TextFunctions.qualityScore]].
    *
    * Parity: each bigram's log-prob is rounded to 6 dp, per-doc sums go
    * through exact DECIMAL accumulation (order-independent), the mean is
    * re-rounded; docs with < 2 tokens surface with 0 bigrams and a NULL
    * score.
    *
    * Scale shape: the model is two map-side-combined count aggregates;
    * scoring joins the bigram stream to them on the bigram/prefix key
    * (N:1 equi-joins — co-partitioned shuffles, no row fan-out) and the
    * vocabulary size is a single broadcast row. No windows, no driver
    * state. At 100 TB the count tables shard across the cluster like
    * any aggregate — nothing requires them to fit anywhere whole.
    */
  def bigramLmScore(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      TextFunctions.nonEmptyTokens(lower(col(textCol))).as("__toks"))
      .localCheckpoint() // feeds pairs AND the vocab count — one tokenize
    // pairs feeds the bigram counts, the unigram counts, AND the score
    // join — checkpoint so the explode runs once, not three times
    val pairs = toks.select(col(idCol),
      explode(TextFunctions.wordShinglesAllOf(col("__toks"), 2)).as("bg"))
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
      .localCheckpoint()
    val c2 = pairs.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    val c1 = pairs.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = toks.select(explode(col("__toks")).as("t"))
      .agg(count_distinct(col("t")).as("v"))
    val lp = pairs
      .join(c2, "bg").join(c1, "w1").crossJoin(broadcast(vocab))
      .withColumn("lp", round(log((col("c2") + 1).cast("double") /
        (col("c1") + col("v")).cast("double")), 6))
    val agg = lp.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_bigrams"),
      round(sum(col("lp").cast("decimal(25,12)")).cast("double") / count(lit(1)), 6)
        .as("avg_logp"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("avg_logp"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): how target-like
    * is every document, estimated with hashed-unigram bag-of-words
    * models. Tokens hash into `nBuckets` features (the same md5
    * bucketing as [[graft.functions.VectorFunctions.hashEmbed]]); the
    * `isTarget` rows and the rest each fit an add-one-smoothed unigram
    * distribution over the buckets, and a document's weight is
    * Σ_tokens round₆(ln p̂_target(b) − ln p̂_raw(b)). Resampling by
    * weight tilts a raw crawl toward the target domain — the data-
    * selection step before pretraining-mix assembly.
    *
    * Scale shape: the two feature distributions end in ≤ nBuckets rows
    * from ONE map-side-combined aggregate; the log-ratio table is
    * broadcast back, so scoring is projection → broadcast join → one
    * per-doc decimal-sum aggregate. The only corpus-keyed shuffle is
    * the doc-id aggregation; driver state is the bucket table alone.
    */
  def importanceWeights(docs: DataFrame, isTarget: Column, nBuckets: Int = 64,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(nBuckets >= 1)
    // Collapse the exploded token stream to per-(doc, bucket) counts
    // FIRST and checkpoint that: the raw token relation feeds both the
    // model fit (bucket counts) and the scoring join, and as two
    // uncached subtrees of one plan the tokenize + per-token md5 pass
    // ran TWICE (measured round 12: the two scans were the query's
    // dominant cost). The histogram is ≤ nBuckets rows per doc — far
    // smaller than the token stream — so the broadcast-join + per-doc
    // aggregate now move bucket counts, not tokens (guide §2.3:
    // aggregate before you shuffle).
    val hist = docs.select(col(idCol), isTarget.cast("boolean").as("__t"),
        explode(TextFunctions.nonEmptyTokens(lower(col(textCol)))).as("tok"))
      .withColumn("b", pmod(conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"),
        lit(nBuckets.toLong)))
      .groupBy(col(idCol), col("__t"), col("b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val counts = hist.groupBy(col("b"))
      .agg(sum(when(col("__t"), col("n")).otherwise(0L)).as("ct"),
        sum(when(col("__t"), 0L).otherwise(col("n"))).as("cr"))
    val totals = counts.agg(sum("ct").as("nt"), sum("cr").as("nr"))
    val ratios = counts.crossJoin(broadcast(totals))
      .select(col("b"),
        round(log((col("ct") + 1).cast("double") / (col("nt") + nBuckets).cast("double"))
          - log((col("cr") + 1).cast("double") / (col("nr") + nBuckets).cast("double")), 6)
          .as("lr"))
    // n identical 6-dp decimals sum to exactly n × the decimal (scale-12
    // multiplication by an integer is exact), so the per-bucket product
    // replays the old per-token decimal sum bit-for-bit.
    val agg = hist.join(broadcast(ratios), "b")
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_tokens"),
        round(sum(col("lr").cast("decimal(25,12)") * col("n")).cast("double"), 6)
          .as("weight"))
    docs.select(col(idCol), isTarget.cast("boolean").as("is_target"))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol), col("is_target"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("weight"), lit(0.0)).as("weight"))
  }

  /** Hashed bag-of-words linear classifier INFERENCE (the fastText
    * shape: hash tokens into `nBuckets` features, dot a broadcast
    * weight vector, sigmoid) — the quality-classifier scoring pass a
    * pipeline runs with a PRE-TRAINED model over the whole crawl. The
    * weights here are a deterministic md5-derived stand-in for a
    * trained vector (the sandbox trains nothing), which is exactly
    * what makes the inference replayable in the oracle; swapping in
    * real weights changes one 64-row broadcast table, not the plan.
    *
    * Scale shape identical to [[importanceWeights]]: explode → bucket
    * → broadcast join the ≤ nBuckets weight rows → ONE map-side-
    * combined per-doc aggregate. The per-token weight is rounded to
    * 6 dp and summed in exact decimal, so the score is independent of
    * partial-aggregation order. `p = σ(scale · Σw / n_tokens)`.
    */
  def linearClassifierInfer(docs: DataFrame, nBuckets: Int = 64,
                            scale: Double = 4.0, idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    require(nBuckets >= 1)
    val spark = docs.sparkSession
    val weights = spark.range(nBuckets).select(col("id").as("b"),
      round(conv(substring(md5(concat(lit("w:"), col("id").cast("string"))), 1, 13),
        16, 10).cast("long").cast("double") / lit(4503599627370496.0) - lit(0.5), 6)
        .as("w"))
    val toks = docs.select(col(idCol),
        explode(TextFunctions.nonEmptyTokens(lower(col(textCol)))).as("tok"))
      .withColumn("b", pmod(conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"),
        lit(nBuckets.toLong)))
    val agg = toks.join(broadcast(weights), "b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("w").cast("decimal(25,12)")).as("sw"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("sw").cast("double"), lit(0.0)).as("sw"))
      .select(col(idCol), col("n_tokens"),
        round(lit(1.0) / (lit(1.0) + exp(-(lit(scale) * col("sw") /
          greatest(col("n_tokens"), lit(1L)).cast("double")))), 6).as("p_keep"))
      .withColumn("keep", col("p_keep") >= 0.5)
  }

  /** Contiguous token-budget shard packing — the sample-prep step that
    * cuts an id-ordered corpus into shards of ≈`budget` tokens each
    * (per stratum), preserving document order so a shard is a
    * contiguous id range. `shard_id = floor(tokens-before-doc / budget)`
    * — a document straddling a boundary goes to the earlier shard, so
    * shards overshoot by at most one document.
    *
    * The running token count is a DISTRIBUTED two-level prefix sum, not
    * one stratum-wide ordered window (which would sort a whole stratum
    * in a single task — the classic 100 TB cliff):
    *
    *  1. coarse order-preserving buckets (`id div bucketWidth`) are
    *     summed with an ordinary map-side-combined aggregate;
    *  2. the bucket-level running offsets — |corpus|/bucketWidth rows —
    *     are a window over that tiny frame and broadcast back;
    *  3. within each bucket, a window bounded by `bucketWidth` rows
    *     adds the local prefix.
    *
    * Every shuffle is either tiny (bucket frame) or bounded-group
    * (within-bucket sort), so the plan survives any corpus size.
    */
  def packShards(docs: DataFrame, budget: Long, bucketWidth: Long = 1 << 16,
                 strataCol: String = "source", idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    require(budget > 0 && bucketWidth > 0)
    val bucketed = docs.select(col(idCol), col(strataCol),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      floor(col(idCol) / bucketWidth).as("__bucket"))
    withTokensBefore(bucketed,
      joinKeys = Seq(strataCol, "__bucket"),
      offsetPartition = Seq(col(strataCol)),
      bucketOrder = Seq(col("__bucket")),
      rowOrder = Seq(col(idCol)))
      .select(col(idCol), col(strataCol), col("n_tokens"),
        (col("tokens_before") / lit(budget)).cast("long").as("shard_id"))
  }

  /** The two-level distributed prefix-sum core shared by [[packShards]]
    * and [[selectUnderBudget]]: appends `tokens_before` = Σ `n_tokens`
    * over all rows strictly before this one in (`bucketOrder`,
    * `rowOrder`) within each `offsetPartition` group. `scored` must
    * carry `n_tokens` and the `joinKeys` columns (the order-aligned
    * coarse bucket key). Bucket totals aggregate map-side; the
    * bucket-level running offsets are a window over that tiny frame
    * (above the Aggregate, so the global-window guard licenses an
    * empty `offsetPartition`) broadcast back; the within-bucket window
    * is bounded by the bucket's row count. No corpus-wide ordered
    * window at any scale.
    */
  private def withTokensBefore(scored: DataFrame, joinKeys: Seq[String],
                               offsetPartition: Seq[Column],
                               bucketOrder: Seq[Column],
                               rowOrder: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val overBuckets = Window.partitionBy(offsetPartition: _*)
      .orderBy(bucketOrder: _*).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = scored
      .groupBy(joinKeys.map(col): _*)
      .agg(sum(col("n_tokens")).as("__btok"))
      .withColumn("__boff", coalesce(sum(col("__btok")).over(overBuckets), lit(0L)))
      .select(joinKeys.map(k => col(k).as(s"__k_$k")) :+ col("__boff"): _*)
    val withinBucket = Window.partitionBy(joinKeys.map(col): _*)
      .orderBy(rowOrder: _*).rowsBetween(Window.unboundedPreceding, -1)
    scored
      .join(broadcast(offsets),
        joinKeys.map(k => col(k) === col(s"__k_$k")).reduce(_ && _))
      .withColumn("__woff", coalesce(sum(col("n_tokens")).over(withinBucket), lit(0L)))
      .withColumn("tokens_before", col("__boff") + col("__woff"))
      .drop(joinKeys.map(k => s"__k_$k") ++ Seq("__boff", "__woff"): _*)
  }

  /** Quality-ordered data selection under a token budget — "take the
    * best documents until we have B training tokens", the curation
    * decision every scaling-law run makes. Documents are ranked by
    * (quality desc, id asc) and admitted while the running token count
    * before them is < `budget` (a straddling document is admitted, so
    * the selection overshoots by at most one document — the
    * [[packShards]] boundary contract).
    *
    * The running count is the same DISTRIBUTED two-level prefix sum as
    * [[packShards]], transposed to quality order: quality scores are
    * few discrete levels, so (quality, id-bucket) is an order-aligned
    * coarse key — bucket totals aggregate map-side, the bucket-level
    * running offsets are a window over that tiny frame (above an
    * Aggregate, so the global-window guard licenses it) broadcast
    * back, and the within-bucket window is bounded by `bucketWidth`
    * rows. No corpus-wide ordered window at any scale.
    */
  def selectUnderBudget(docs: DataFrame, budget: Long,
                        bucketWidth: Long = 1 << 16,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    require(budget > 0 && bucketWidth > 0)
    val scored = docs.select(col(idCol),
      TextFunctions.qualityScore(col(textCol)).as("quality"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      floor(col(idCol) / bucketWidth).as("__bucket"))
    // (quality desc, bucket asc) is the bucket-level image of the row
    // order (quality desc, id asc): __bucket is monotone in id
    withTokensBefore(scored,
      joinKeys = Seq("quality", "__bucket"),
      offsetPartition = Seq.empty,
      bucketOrder = Seq(col("quality").desc, col("__bucket")),
      rowOrder = Seq(col(idCol)))
      .filter(col("tokens_before") < budget)
      .select(col(idCol), col("quality"), col("n_tokens"), col("tokens_before"))
  }

  /** Contiguous global row ids (0..n−1 in `orderCol` order) WITHOUT a
    * single-partition global sort — the scalable zipWithIndex, pure
    * DataFrame: range-partition on the (unique) order column, count
    * rows per partition (a tiny nParts-row relation), prefix-sum those
    * counts into per-partition offsets, broadcast them back, and add
    * each row's within-partition rank. Range partitioning guarantees
    * partition i's keys all precede partition i+1's, so offset + local
    * rank IS the global row number. The only whole-partition operation
    * is the within-partition rank — the same memory shape as the sort
    * any id assignment needs; nothing corpus-sized ever reaches fewer
    * than nParts tasks, and driver state is one count per partition.
    *
    * The range exchange is persisted before fan-out: the offsets pass
    * and the rank pass must see the SAME partitioning decision (range
    * bounds come from sampling), so the exchange result is pinned
    * rather than recomputed per downstream job.
    */
  def globalIds(df: DataFrame, orderCol: String, nParts: Int = 32): DataFrame =
    globalIds(df, Seq(orderCol), nParts)

  /** Multi-column form: the order key is `orderCols` lexicographic,
    * which must be UNIQUE across rows (append a tiebreaker id column
    * if it isn't — a non-unique key would make ids nondeterministic).
    */
  def globalIds(df: DataFrame, orderCols: Seq[String], nParts: Int): DataFrame =
    globalIdsPinned(df, orderCols, nParts)._1

  /** [[globalIds]] plus its internally pinned range-partitioned frame,
    * for callers that materialize a SMALL final projection and can then
    * release the corpus-sized pin (the [[Eval.pinAndRelease]] hygiene).
    * Callers that hand the ranked relation itself downstream must keep
    * the pin — releasing it re-samples the range bounds on recompute
    * and the ids go nondeterministic (see the persist note below).
    */
  def globalIdsPinned(df: DataFrame, orderCols: Seq[String],
                      nParts: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    require(orderCols.nonEmpty, "globalIds needs at least one order column")
    val oc = orderCols.map(col)
    // The persist is a CORRECTNESS device, not a perf cache (measured:
    // dropping it flipped q_lift_table red at sf0.01): the offsets
    // branch and the ranked main branch must see the SAME partition
    // bounds, and repartitionByRange determines them by sampling — two
    // independent materializations can sample different bounds, making
    // __pid inconsistent between the branches. Persisting pins one
    // materialization that both branches read.
    val parted = df.repartitionByRange(nParts, oc: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val overPids = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(overPids), lit(0L)))
      .select(col("__pid"), col("__off"))
    val out = parted
      .withColumn("__rank", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(oc: _*)))
      .join(broadcast(offsets), "__pid")
      .withColumn("global_id", col("__off") + col("__rank") - 1)
      .drop("__pid", "__rank", "__off")
    (out, parted)
  }

  /** T5-style span-corruption mask plan, fully deterministic and
    * replayable: a span STARTS at token i when an md5 coin on
    * (doc id, i) hits 1-in-`startOdds`; it runs `1 + coin₂ % maxLen`
    * tokens (mean (maxLen+1)/2), clipped to the document; overlapping
    * spans union. Defaults ≈ the T5 recipe (≈15% of tokens masked,
    * mean span 3). Per doc: token count, span count, masked-token
    * count, mask ratio — all integers until the single final division,
    * so any engine replays it bit-for-bit (this is the property that
    * makes the masking auditable ACROSS the training stack: the same
    * doc gets the same spans in Spark, in the trainer, anywhere).
    *
    * Scale: one linear per-token explode that aggregates immediately
    * (no corpus-wide state), one per-span explode bounded by maxLen.
    */
  def spanCorruptionPlan(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text", startOdds: Int = 20,
                         maxLen: Int = 5): DataFrame = {
    require(startOdds >= 1 && maxLen >= 1, "startOdds and maxLen must be >= 1")
    val toks = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), size(split(trim(col(textCol)), "\\s+"))
        .cast("long").as("n"))
    val coin = md5(concat(col(idCol).cast("string"), lit(":"),
      col("i").cast("string")))
    val pos = toks
      .select(col(idCol), col("n"),
        explode(sequence(lit(0L), col("n") - 1)).as("i"))
      .select(col(idCol), col("n"), col("i"),
        conv(substring(coin, 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring(coin, 9, 4), 16, 10).cast("long").as("h2"))
    val starts = pos.filter(col("h1") % startOdds === 0)
      .select(col(idCol), col("n"), col("i"),
        (lit(1L) + col("h2") % maxLen).as("len"))
    val masked = starts
      .select(col(idCol), explode(sequence(col("i"),
        least(col("i") + col("len") - 1, col("n") - 1))).as("j"))
      .distinct()
    val spanAgg = starts.groupBy(col(idCol)).agg(count(lit(1)).as("n_spans"))
    val maskAgg = masked.groupBy(col(idCol)).agg(count(lit(1)).as("n_masked"))
    toks.join(spanAgg, Seq(idCol), "left").join(maskAgg, Seq(idCol), "left")
      .select(col(idCol), col("n").as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        round(coalesce(col("n_masked"), lit(0L)).cast("double") / col("n"), 6)
          .as("mask_ratio"))
  }

  /** Zipf tail exponent of the corpus token-frequency distribution —
    * the Hill maximum-likelihood estimator
    * `α = 1 + n_tail / Σ ln(f_i / f_min)` over distinct tokens with
    * frequency ≥ `fMin`, the vocabulary twin of the graph-side
    * hub-explosion readout (`Graph.powerLawTail`, same estimator on
    * degrees): a healthy natural-language corpus sits near α ≈ 2;
    * boilerplate-flooded or template-spam shards drift visibly.
    *
    * Scale shape: ONE corpus shuffle (token → frequency), then the
    * estimator reduces over the distinct-frequency histogram —
    * `Σ n_f · ln(f/f_min)` — whose row count is bounded by the max
    * token frequency's divisor structure (≪ vocabulary size), so the
    * log arithmetic never touches a vocabulary-sized relation twice.
    * Per-frequency log terms are 6-dp rounded and summed as
    * DECIMAL(25,12) (the [[Graph.powerLawTail]] parity discipline).
    *
    * Returns one row `(n_vocab, n_tail, f_min, f_max, alpha)`;
    * α NULL when the tail is flat (every tail token at exactly f_min).
    */
  def zipfAlpha(docs: DataFrame, textCol: Column, fMin: Int = 5): DataFrame = {
    require(fMin >= 1, s"fMin must be >= 1: $fMin")
    val freq = docs.select(explode(split(textCol, " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
    val hist = freq.groupBy(col("f")).agg(count(lit(1)).as("n_toks"))
    hist.agg(
        sum(col("n_toks")).as("n_vocab"),
        sum(when(col("f") >= fMin, col("n_toks"))).as("n_tail"),
        max(when(col("f") >= fMin, col("f"))).as("f_max"),
        sum(when(col("f") >= fMin,
          round(col("n_toks").cast("double") *
            log(col("f").cast("double") / lit(fMin.toDouble)), 6)
            .cast("decimal(25,12)"))).as("lsum"))
      .select(col("n_vocab"),
        coalesce(col("n_tail"), lit(0L)).as("n_tail"),
        lit(fMin.toLong).as("f_min"), col("f_max"),
        when(col("lsum") > 0,
          round(lit(1.0) + coalesce(col("n_tail"), lit(0L)).cast("double") /
            col("lsum").cast("double"), 6)).as("alpha"))
  }
}
