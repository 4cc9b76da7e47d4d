package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Corpus deduplication operators for training-data pipelines, each
  * designed around its 100 TB shuffle shape:
  *
  *  - exact: one hash-groupBy on an 8-byte fingerprint (minimum shuffle);
  *  - MinHash+LSH: shingle → k minhashes → band buckets → self-join
  *    *within buckets only* (candidate pairs, not O(n²));
  *  - SimHash: 64-bit signature, bucket by band for Hamming-near dups;
  *  - embedding near-dup: hyperplane-LSH buckets → in-bucket cosine.
  *
  * Everything is built-in expressions (hash/xxhash64/explode/groupBy) —
  * no UDFs — so signatures compute inside whole-stage codegen and the
  * only shuffles are the groupBys/joins listed above.
  */
object Dedup {

  /** Exact dedup: keep one representative (min of `idCol`) per distinct
    * normalized text. Representative choice is deterministic. The
    * groupBy key is the md5 fingerprint, not the text itself, so the
    * shuffle moves 32-byte keys rather than whole documents.
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(contentFingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** MinHash signature: k independent minimum hashes over the shingle
    * set. hash_i(s) = xxhash64(s, saltᵢ) — Spark's codegen'd 64-bit
    * hash with a per-row salt column, min-aggregated per document via
    * `transform` + `array_min` without exploding.
    */
  def minHashSignature(shingles: Column, k: Int): Column =
    struct((0 until k).map { i =>
      coalesce(
        array_min(transform(shingles, s => xxhash64(lit(i), s))),
        lit(Long.MaxValue)).as(s"mh$i")
    }: _*)

  /** MinHash + LSH near-dup candidate pairs: documents sharing at least
    * one LSH band. `bands × rowsPerBand = k`. Returns (id_a, id_b,
    * jaccard_est) with id_a < id_b, jaccard_est = fraction of equal
    * minhashes.
    *
    * Plan shape: shingle+sign (no shuffle) → explode bands (×bands) →
    * shuffle on band hash (the ONLY big shuffle) → in-bucket pairs →
    * distinct. Bucket sizes are bounded in practice; a skewed bucket
    * (e.g. empty-doc signature) is capped by `maxBucket`.
    */
  def minHashCandidates(docs: DataFrame, textCol: String, idCol: String,
                        shingleLen: Int = 5, bands: Int = 4, rowsPerBand: Int = 4,
                        maxBucket: Int = 1000): DataFrame = {
    val k = bands * rowsPerBand
    val signed = docs
      .select(col(idCol).as("id"),
        minHashSignature(charShingles(col(textCol), shingleLen), k).as("sig"))
    val banded = signed.select(
      col("id"), col("sig"),
      posexplode(array((0 until bands).map { b =>
        hash((b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => col(s"sig.mh$i")): _*)
      }: _*)).as(Seq("band", "bucket")))
    // cap pathological buckets so a degenerate key can't go quadratic
    val capped = banded
      .withColumn("__bn", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")
    val a = capped.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = capped.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        ((0 until k).map(i =>
          when(col(s"sig_a.mh$i") === col(s"sig_b.mh$i"), 1).otherwise(0))
          .reduce(_ + _).cast("double") / k).as("jaccard_est"))
      .distinct()
  }

  /** SimHash 64-bit signature over whitespace tokens: bit j of the
    * signature = sign of Σ_tokens (±1 depending on bit j of
    * xxhash64(token)). Expressed as 64 fold sums via `aggregate` —
    * single pass, no explode, no shuffle.
    */
  def simHash64(textCol: Column): Column = {
    val hashes = transform(tokens(lower(textCol)), t => xxhash64(t))
    val bits: Seq[Column] = (0 until 64).map { j =>
      val s = aggregate(hashes, lit(0),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << j)) =!= 0L, 1).otherwise(-1))
      when(s > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** SimHash near-dup candidates: split the 64-bit signature into
    * `bands` chunks; docs sharing any chunk are candidates (guarantees
    * catching Hamming distance < bands). Returns pairs with their
    * Hamming distance ≤ `maxHamming`.
    */
  def simHashCandidates(docs: DataFrame, textCol: String, idCol: String,
                        bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    val chunk = 64 / bands
    val signed = docs.select(col(idCol).as("id"), simHash64(col(textCol)).as("sig"))
    val banded = signed.select(col("id"), col("sig"),
      posexplode(array((0 until bands).map { b =>
        shiftrightunsigned(col("sig"), b * chunk)
          .bitwiseAND(lit((1L << chunk) - 1))
      }: _*)).as(Seq("band", "chunk")))
    val a = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** N-gram Jaccard near-dup pairs within LSH candidate buckets — the
    * exact-verify stage after [[minHashCandidates]]: re-checks candidate
    * pairs against true shingle Jaccard.
    */
  def jaccardVerify(candidates: DataFrame, docs: DataFrame,
                    textCol: String, idCol: String,
                    shingleLen: Int = 5, threshold: Double = 0.7): DataFrame = {
    val sh = docs.select(col(idCol).as("__jid"),
      charShingles(col(textCol), shingleLen).as("__sh"))
    candidates
      .join(sh.withColumnRenamed("__jid", "id_a").withColumnRenamed("__sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("__jid", "id_b").withColumnRenamed("__sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding-cosine near-dup pairs: hyperplane-LSH bucket join, then
    * exact cosine within buckets. At 100 TB the bucket count is tuned so
    * the in-bucket cross product stays small; multi-probe = union over
    * several seeds.
    */
  def embeddingNearDup(embs: DataFrame, vecCol: String, idCol: String,
                       dim: Int, bits: Int = 12, threshold: Double = 0.95): DataFrame = {
    val bucketed = embs.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.hyperplaneBucket(col(vecCol), dim, bits).as("bucket"))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }
}
