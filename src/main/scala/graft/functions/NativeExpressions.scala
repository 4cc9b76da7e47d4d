package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass kernels for the text-dedup hot path.
  *
  * The composable `functions._` forms (shingle via `sequence` +
  * `transform`, simhash via 64 `aggregate` folds) evaluate their lambdas
  * in interpreted mode — ~1000 Expression.eval calls per row. These
  * expressions do the same work in one JVM loop per row and participate
  * in whole-stage codegen (`doGenCode` emits a single static call), so a
  * 100 TB document scan stays codegen'd end to end.
  *
  * Hash/normalization choices are internal to the dedup operators (no
  * oracle parity needed): FNV-1a 64 over chars, ASCII lowercase,
  * whitespace collapse.
  */
object ShingleKernels {

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** Normalize: trim, ASCII-lowercase, collapse whitespace runs to one
    * space. Returns a fresh char array of the normalized text.
    */
  private def normalize(s: String): Array[Char] = {
    val out = new Array[Char](s.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { if (n > 0) pendingSpace = true }
      else {
        if (pendingSpace) { out(n) = ' '; n += 1; pendingSpace = false }
        out(n) = Character.toLowerCase(c); n += 1
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, n)
  }

  private def dedupSorted(a: Array[Long], len: Int): Array[Long] = {
    if (len == 0) return Array.emptyLongArray
    val arr = java.util.Arrays.copyOf(a, len)
    java.util.Arrays.sort(arr)
    var w = 1
    var i = 1
    while (i < arr.length) {
      if (arr(i) != arr(w - 1)) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(arr, w)
  }

  /** Distinct FNV-1a 64 hashes of every n-char shingle of the
    * normalized text. One pass, zero per-shingle allocation.
    */
  def charShingleHashes(text: UTF8String, n: Int): ArrayData = {
    val chars = normalize(text.toString)
    val count = chars.length - n + 1
    if (count <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val hashes = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = FnvOffset
      var j = 0
      while (j < n) { h = (h ^ chars(i + j)) * FnvPrime; j += 1 }
      hashes(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(dedupSorted(hashes, count))
  }

  /** FNV-1a 64 hash of each whitespace token of the text (duplicates
    * kept — simhash weights repeated tokens).
    */
  def tokenHashes(text: UTF8String, lowercase: Boolean): ArrayData = {
    val s = text.toString
    val out = new Array[Long](s.length / 2 + 1)
    var n = 0
    var h = FnvOffset
    var inTok = false
    var i = 0
    while (i < s.length) {
      val c0 = s.charAt(i)
      if (Character.isWhitespace(c0)) {
        if (inTok) { out(n) = h; n += 1; h = FnvOffset; inTok = false }
      } else {
        inTok = true
        h = (h ^ (if (lowercase) Character.toLowerCase(c0) else c0)) * FnvPrime
      }
      i += 1
    }
    if (inTok) { out(n) = h; n += 1 }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, n))
  }

  /** SimHash: bit j of the result = sign of Σ_hashes (±1 by bit j). */
  def simHash64(hashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val m = hashes.numElements()
    var i = 0
    while (i < m) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** MinHash signature: mins(i) = min over hashes of
    * rotl(h, rᵢ) ^ saltᵢ — k bijective integer mixes of one base hash.
    */
  def minHashes(hashes: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val m = hashes.numElements()
    var i = 0
    while (i < m) {
      val h = hashes.getLong(i)
      var s = 0
      while (s < k) {
        val r = (s * 23 + 17) % 63 + 1
        val mixed = (java.lang.Long.rotateLeft(h, r)) ^ salt(s)
        if (mixed < out(s)) out(s) = mixed
        s += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Winnowing fingerprints (Schleimer et al. 2003, the MOSS
    * algorithm): positional FNV-1a hashes of every n-char shingle of
    * the normalized text; each w-wide window selects its minimal hash
    * (UNSIGNED compare, rightmost minimum — the robust-winnowing tie
    * rule); output = the distinct selected hashes, sorted signed. Any
    * verbatim match of length ≥ n+w−1 chars between two documents is
    * guaranteed to share a fingerprint. Texts with fewer than w
    * shingles winnow their single short window (≥ 1 fingerprint
    * whenever ≥ 1 shingle exists). One pass via a monotonic deque —
    * O(shingles), not O(shingles·w).
    */
  def winnowFingerprints(text: UTF8String, n: Int, w: Int): ArrayData = {
    val chars = normalize(text.toString)
    val count = chars.length - n + 1
    if (count <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val hashes = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = FnvOffset
      var j = 0
      while (j < n) { h = (h ^ chars(i + j)) * FnvPrime; j += 1 }
      hashes(i) = h
      i += 1
    }
    val win = math.min(w, count)
    val sel = new Array[Long](count)
    var nSel = 0
    val deque = new Array[Int](count) // indices, increasing unsigned hash
    var head = 0
    var tail = 0
    i = 0
    while (i < count) {
      // evict ties too: a later equal hash replaces an earlier one
      while (tail > head &&
        java.lang.Long.compareUnsigned(hashes(deque(tail - 1)), hashes(i)) >= 0) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - win) head += 1
      if (i >= win - 1) { sel(nSel) = hashes(deque(head)); nSel += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(dedupSorted(sel, nSel))
  }

  /** Content-defined chunk spans (LBFS/rsync-style CDC): a cut falls
    * BEFORE every 1-based position i > 1 of the normalized text whose
    * n-char window hash satisfies `h mod modulus == 0` (unsigned FNV-1a
    * — with a power-of-two modulus this is a bit mask, expected chunk
    * length ≈ modulus chars). Chunks are the segments between
    * consecutive cuts; the head runs from 1 to the first cut, the tail
    * through the last character (so positions past the last full
    * window fold into the final chunk). Cut decisions are PER-POSITION
    * (no post-cut window skip), so the oracle replays them with a
    * plain predicate + window instead of a sequential recursion.
    * Returns packed `(start << 32) | length` spans over the normalized
    * text; empty normalized text → empty array.
    */
  def cdcChunkSpans(text: UTF8String, n: Int, modulus: Int): ArrayData = {
    val chars = normalize(text.toString)
    val len = chars.length
    if (len == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val count = len - n + 1
    val spans = new Array[Long](math.max(count, 0) + 1)
    var m = 0
    var start = 1
    var i = 2 // cuts only strictly inside the text
    while (i <= count) {
      var h = FnvOffset
      var j = 0
      while (j < n) { h = (h ^ chars(i - 1 + j)) * FnvPrime; j += 1 }
      if (java.lang.Long.remainderUnsigned(h, modulus.toLong) == 0L) {
        spans(m) = (start.toLong << 32) | (i - start).toLong; m += 1
        start = i
      }
      i += 1
    }
    spans(m) = (start.toLong << 32) | (len - start + 1).toLong; m += 1
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(spans, m))
  }

  /** The kernel's normalization, exposed as a string: the md5 source
    * for [[cdcChunkSpans]] substrings MUST come from this exact
    * function — a regex-based normalizer can disagree on non-ASCII
    * whitespace (U+0085) or length-changing case mappings, silently
    * misaligning span offsets (round-6 advice).
    */
  def normalizeText(text: UTF8String): UTF8String =
    UTF8String.fromString(new String(normalize(text.toString)))

  /** Threshold-bounded Levenshtein with common-affix trimming —
    * bit-identical to Spark's `levenshtein(l, r, threshold)` (actual
    * distance when ≤ threshold, -1 above it), measured faster on the
    * entity-resolution verify path: edit distance is invariant under
    * removing a shared prefix and a shared suffix (any optimal
    * alignment matches identical affixes), and blocked candidates
    * share long affixes BY CONSTRUCTION (the blocking key is a
    * substring of the name), so the banded DP runs on the few bytes
    * that can actually differ instead of the whole string. Trims land
    * on codepoint boundaries (a continuation byte is never a cut
    * point), so multibyte text is handled exactly; the remainders
    * delegate to `UTF8String.levenshteinDistance` zero-copy.
    */
  private def isCont(b: Byte): Boolean = (b & 0xC0) == 0x80

  def boundedLevenshtein(a: UTF8String, b: UTF8String, k: Int): Int = {
    val na = a.numBytes; val nb = b.numBytes
    val n = math.min(na, nb)
    var i = 0
    while (i < n && a.getByte(i) == b.getByte(i)) i += 1
    // back off to a codepoint boundary: the kept remainder must START
    // a character on both sides (bytes below i are shared, so the two
    // checks see the same bytes whenever both are in range)
    while (i > 0 && ((i < na && isCont(a.getByte(i))) ||
                     (i < nb && isCont(b.getByte(i))))) i -= 1
    var j = 0
    val maxJ = n - i // never overlap the kept prefix
    while (j < maxJ && a.getByte(na - 1 - j) == b.getByte(nb - 1 - j)) j += 1
    // the trimmed common suffix must itself start on a char boundary
    while (j > 0 && (isCont(a.getByte(na - j)) || isCont(b.getByte(nb - j)))) j -= 1
    if (na - i - j == 0 && nb - i - j == 0) 0
    else {
      val ra = UTF8String.fromAddress(a.getBaseObject, a.getBaseOffset + i, na - i - j)
      val rb = UTF8String.fromAddress(b.getBaseObject, b.getBaseOffset + i, nb - i - j)
      ra.levenshteinDistance(rb, k)
    }
  }

  /** splitmix64 of the index — deterministic per-salt constant. */
  def salt(i: Int): Long = {
    var z = i.toLong + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

/** array<bigint> of distinct n-char-shingle hashes of a string column. */
case class CharShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "shingle length must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.charShingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.charShingleHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): CharShingleHashes = copy(child = c)
}

/** array<bigint> of whitespace-token hashes of a string column. */
case class TokenHashes(child: Expression, lowercase: Boolean = true) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.tokenHashes(input.asInstanceOf[UTF8String], lowercase)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.tokenHashes($c, $lowercase)")
  override protected def withNewChildInternal(c: Expression): TokenHashes = copy(child = c)
}

/** array<bigint> winnowing fingerprints of a string column. */
case class WinnowFingerprints(child: Expression, n: Int, w: Int) extends UnaryExpression {
  require(n > 0 && w > 0, "shingle length and window must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.winnowFingerprints(input.asInstanceOf[UTF8String], n, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.winnowFingerprints($c, $n, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowFingerprints = copy(child = c)
}

/** array<bigint> of packed (start<<32 | len) content-defined chunk
  * spans of a string column.
  */
case class CdcChunkSpans(child: Expression, n: Int, modulus: Int)
    extends UnaryExpression {
  // fail at construction, not as a per-row ArithmeticException (mod 0)
  // or constant-hash garbage (n <= 0) deep inside a job
  require(n >= 1, s"CdcChunkSpans window length must be >= 1, got $n")
  require(modulus >= 1, s"CdcChunkSpans modulus must be >= 1, got $modulus")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.cdcChunkSpans(input.asInstanceOf[UTF8String], n, modulus)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleKernels.cdcChunkSpans($c, $n, $modulus)")
  override protected def withNewChildInternal(c: Expression): CdcChunkSpans =
    copy(child = c)
}

/** The shingle kernels' own normalization (trim, per-char lowercase,
  * whitespace-run collapse) as a string column — the only correct
  * substring source for [[CdcChunkSpans]] offsets.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.normalizeText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.normalizeText($c)")
  override protected def withNewChildInternal(c: Expression): NormalizeText =
    copy(child = c)
}

/** 64-bit SimHash of an array<bigint> hash column. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.simHash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.simHash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** array<bigint> of k minhashes of an array<bigint> hash column. */
case class MinHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "k must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.minHashes(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.minHashes($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashes = copy(child = c)
}

/** int edit distance of two string columns when ≤ k, -1 above —
  * Spark's `levenshtein(l, r, k)` contract, computed by the
  * affix-trimming kernel ([[ShingleKernels.boundedLevenshtein]]).
  */
case class LevenshteinWithin(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 0, s"threshold must be >= 0, got $k")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any =
    ShingleKernels.boundedLevenshtein(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ShingleKernels.boundedLevenshtein($a, $b, $k)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): LevenshteinWithin = copy(left = l, right = r)
}

/** Column-API wrappers for the native expressions. */
object native {
  def levenshtein_within(a: Column, b: Column, k: Int): Column =
    Bridge.column(LevenshteinWithin(Bridge.expression(a), Bridge.expression(b), k))
  def char_shingle_hashes(c: Column, n: Int): Column =
    Bridge.column(CharShingleHashes(Bridge.expression(c), n))
  def token_hashes(c: Column): Column =
    Bridge.column(TokenHashes(Bridge.expression(c)))
  def simhash64(hashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(hashes)))
  def winnow_fingerprints(c: Column, n: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(c), n, w))
  def cdc_chunk_spans(c: Column, n: Int, modulus: Int): Column =
    Bridge.column(CdcChunkSpans(Bridge.expression(c), n, modulus))
  def normalize_text(c: Column): Column =
    Bridge.column(NormalizeText(Bridge.expression(c)))
  def minhashes(hashes: Column, k: Int): Column =
    Bridge.column(MinHashes(Bridge.expression(hashes), k))
}
