package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnExpr
import org.apache.spark.sql.types._

/** Native (whole-stage-codegen) kernels for the similarity/dedup hot
  * paths. The round-1 implementations expressed these with Catalyst
  * higher-order functions (`aggregate(zip_with(...))`), which are
  * interpreted lambdas allocating an intermediate array per row — at
  * 2M candidate pairs that dominated the benchmark. These expressions
  * fuse the loops and compile into the surrounding codegen stage.
  *
  * Reference has no vector ops at all (extension surface, SURVEY §7.1
  * step 10); the design follows the prompt's preference order: native
  * `Expression` with `doGenCode` over UDFs.
  */
/** Deterministic pseudo-random hyperplane components for sign LSH,
  * derived from MD5 so any SQL engine reproduces them: the integer
  * seed for plane p, dimension i is the first 4 bytes (big-endian,
  * unsigned) of md5("p_i") mod 1000, and the component is
  * (seed - 500) / 1000.0 ∈ [-0.5, 0.5). The component VALUES are
  * emitted as literals into the generated oracle SQL, so the oracle
  * needs only identical-order double arithmetic, not md5. */
object LshPlanes {
  @volatile private var grid: Array[Array[Double]] = Array.empty

  def seedInt(p: Int, i: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${p}_${i}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
      ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
    (v % 1000L).toInt
  }

  def coef(p: Int, i: Int): Double = (seedInt(p, i) - 500) / 1000.0

  /** Grow the memoized grid to cover [0,planes) × [0,dim). */
  def ensure(planes: Int, dim: Int): Unit = {
    val g = grid
    if (g.length >= planes && (planes == 0 || g(0).length >= dim)) return
    synchronized {
      val cur = grid
      if (cur.length >= planes && (planes == 0 || cur(0).length >= dim))
        return
      val np = math.max(planes, cur.length)
      val nd = math.max(dim, if (cur.isEmpty) 0 else cur(0).length)
      grid = Array.tabulate(np, nd)(coef)
    }
  }

  /** Row for plane p; call [[ensure]] first. */
  def row(p: Int): Array[Double] = grid(p)
}

object VectorKernels {

  /** Fused cosine kernel: one pass accumulating x·y, ‖x‖², ‖y‖² in
    * ascending index order — bit-identical to the unfused
    * dot/(√(x·x)·√(y·y)) with the same accumulation order. */
  def cosine(x: ArrayData, y: ArrayData, lf: Boolean, rf: Boolean): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(x: ArrayData, y: ArrayData, lf: Boolean, rf: Boolean): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi; i += 1
    }
    acc
  }

  /** Double-hashing MinHash (Kirsch–Mitzenmacher): perm_i(t) =
    * h1(t) + i·h2(t), so each shingle is hashed twice instead of
    * `numPerm` times. One pass over the shingle array, no allocation
    * beyond the signature itself. */
  /** MinHash signature by double hashing: component k is the minimum
    * (signed compare) of h1 + k*h2 over the shingles, h1/h2 MD5-derived
    * ([[md5Hash64]]/[[md5Hash64Salted]]) so external SQL regenerates
    * the exact signature with 128-bit modular arithmetic. */
  def minhashSig(shingles: ArrayData, numPerm: Int): ArrayData = {
    val sig = Array.fill(numPerm)(Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      if (!shingles.isNullAt(j)) {
        val s = shingles.getUTF8String(j)
        val h1 = md5Hash64(s)
        val h2 = md5Hash64Salted(s) | 1L
        var v = h1; var i = 0
        while (i < numPerm) {
          if (v < sig(i)) sig(i) = v
          v += h2; i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Random-hyperplane LSH bucket: bit p is the sign of the projection
    * of the vector onto pseudo-random plane p. One fused pass, no
    * per-plane array allocation. Plane components are MD5-derived
    * ([[LshPlanes]]) so an external SQL engine can regenerate the
    * exact projection arithmetic and hash-check bucket assignments —
    * the summation is i-ascending left-associated double adds, the
    * order the generated oracle SQL spells out. */
  def lshBucket(x: ArrayData, nPlanes: Int, lf: Boolean): Long = {
    val n = x.numElements()
    LshPlanes.ensure(nPlanes, n)
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      val row = LshPlanes.row(p)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        acc += xi * row(i)
        i += 1
      }
      if (acc > 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Distinct word hashes INCLUDING empty words — the hash image of
    * `array_distinct(split(text, ' '))` (xxhash64 per distinct word,
    * first-occurrence order): set sizes and intersections over these
    * equal the string-set ones short of a 64-bit collision. */
  def distinctWordHashes(text: org.apache.spark.unsafe.types.UTF8String)
      : ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val Seed = 42L
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var start = 0
    var p = 0
    while (p <= len) {
      if (p == len ||
          org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20) {
        seen.add(XXH64.hashUnsafeBytes(base, off + start, p - start, Seed))
        start = p + 1
      }
      p += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Distinct hashes of every ≤maxDel-character-deletion variant of
    * `text` — the FastSS/SymSpell blocking neighborhood, WITHOUT
    * building any variant string: prefix polynomial rolling hashes
    * make each variant's hash an O(1) segment combine, so the whole
    * ≤2-deletion neighborhood of an n-char string costs O(n²) longs
    * and zero allocations beyond the output (the HOF formulation that
    * materialized every variant string measured 20× slower). CHAR
    * level (not bytes), so multi-byte text blocks exactly the pairs a
    * char-based levenshtein verify expects. Hash equality of equal
    * variants is exact; a wraparound collision only ADDS a candidate,
    * which the exact verify then rejects. */
  def deletionVariantHashes(text: org.apache.spark.unsafe.types.UTF8String,
      maxDel: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    val B = 1099511628211L // FNV-64 prime as polynomial base (mod 2^64)
    // pre(i) = hash of s[0,i); pow(i) = B^i — Long wraparound arithmetic
    val pre = new Array[Long](n + 1)
    val pow = new Array[Long](n + 1)
    pow(0) = 1L
    var i = 0
    while (i < n) {
      pre(i + 1) = pre(i) * B + s.charAt(i).toLong
      pow(i + 1) = pow(i) * B
      i += 1
    }
    // hash of s[a,b): pre(b) - pre(a)*B^(b-a)
    @inline def seg(a: Int, b: Int): Long = pre(b) - pre(a) * pow(b - a)
    val seen = new java.util.HashSet[java.lang.Long]()
    seen.add(pre(n)) // 0 deletions
    if (maxDel >= 1) {
      i = 0
      while (i < n) { // delete i
        seen.add(seg(0, i) * pow(n - 1 - i) + seg(i + 1, n))
        i += 1
      }
    }
    if (maxDel >= 2) {
      require(maxDel == 2, "deletion_variant_hashes supports t <= 2")
      i = 0
      while (i < n - 1) {
        val h1 = seg(0, i)
        var j = i + 1
        while (j < n) { // delete i and j
          val mid = seg(i + 1, j)
          seen.add((h1 * pow(j - i - 1) + mid) * pow(n - 1 - j) +
            seg(j + 1, n))
          j += 1
        }
        i += 1
      }
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Per-document term frequencies in one pass — the struct-array
    * image of `explode(split(text,' ')) … GROUP BY doc, word` computed
    * map-side, so the (doc, word) aggregation exchange disappears from
    * tf-idf-shaped pipelines and only DISTINCT words per document are
    * ever exploded (tokens stay in the kernel). Empty words (leading /
    * trailing / doubled spaces) are skipped, matching the SQL chains'
    * `w <> ''` filter. Keys are defensive copies: the scan's UTF8String
    * buffer is reused across rows, so returned structs must not alias
    * it. */
  def wordTfPairs(text: org.apache.spark.unsafe.types.UTF8String)
      : ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Int]]()
    var start = 0
    var p = 0
    while (p <= len) {
      if (p == len ||
          org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20) {
        if (p > start) {
          val w = UTF8String.fromAddress(base, off + start, p - start)
          val c = counts.get(w)
          if (c != null) c(0) += 1
          else counts.put(w.copy(), Array(1))
        }
        start = p + 1
      }
      p += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct character-k-gram hashes — the hash image of
    * `array_distinct(transform(sequence(1, greatest(len-k+1, 1)),
    * i -> substring(text, i, k)))` including the short-text fallback
    * (text shorter than k chars yields its whole self as the one
    * gram). Character offsets are found by UTF-8 lead bytes, so the
    * hashed byte spans equal the SQL substring's bytes on any text. */
  def distinctGramHashes(text: org.apache.spark.unsafe.types.UTF8String,
      k: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val Seed = 42L
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    // char start byte offsets (UTF-8 continuation bytes are 10xxxxxx)
    val charOff = new Array[Int](text.numChars() + 1)
    var nc = 0
    var p = 0
    while (p < len) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + p)
      if ((b & 0xC0) != 0x80) { charOff(nc) = p; nc += 1 }
      p += 1
    }
    charOff(nc) = len
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (nc < k) {
      seen.add(XXH64.hashUnsafeBytes(base, off, len, Seed))
    } else {
      var i = 0
      while (i <= nc - k) {
        seen.add(XXH64.hashUnsafeBytes(base, off + charOff(i),
          charOff(i + k) - charOff(i), Seed))
        i += 1
      }
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** |a ∩ b| for two LONG arrays that are already sets — the
    * size(array_intersect(…)) of the verify joins without the
    * interpreted per-element walk. */
  def sharedCount(a: ArrayData, b: ArrayData): Int = {
    val (small, big) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = small.numElements()
    if (ns == 0) return 0
    // Open-addressed long[] probe table (linear probing, 0 = empty,
    // load <= 0.5) instead of HashSet<java.lang.Long>: this kernel
    // runs once per CANDIDATE PAIR in the screen/jaccard verify
    // stages — the boxing (one Long per word per pair) and HashSet
    // node churn were the verify stages' dominant allocation (r13;
    // visible as 0.5-2.5 s jvmGCTime per pass). Same contract as the
    // HashSet form: count of big-side ELEMENTS (duplicates included)
    // whose value occurs in the small side.
    var cap = 4
    while (cap < ns * 2) cap <<= 1
    val table = new Array[Long](cap)
    val mask = cap - 1
    var hasZero = false
    def slot(v: Long): Int = {
      // 64->32 bit finalizer (splitmix64 tail) so adjacent hashes
      // spread across the table
      var h = v * -7046029254386353131L
      h ^= (h >>> 32)
      h.toInt & mask
    }
    var i = 0
    while (i < ns) {
      val v = small.getLong(i)
      if (v == 0L) hasZero = true
      else {
        var idx = slot(v)
        while (table(idx) != 0L && table(idx) != v) idx = (idx + 1) & mask
        table(idx) = v
      }
      i += 1
    }
    var cnt = 0
    val nb = big.numElements()
    i = 0
    while (i < nb) {
      val v = big.getLong(i)
      if (v == 0L) { if (hasZero) cnt += 1 }
      else {
        var idx = slot(v)
        while (table(idx) != 0L && table(idx) != v) idx = (idx + 1) & mask
        if (table(idx) == v) cnt += 1
      }
      i += 1
    }
    cnt
  }

  /** Winnowing key array (Schleimer et al. 2003): for every k-gram of
    * `norm` (normalized text — pure ASCII after the [a-z0-9] strip, so
    * byte offsets ARE character offsets), key = h·2²⁰ − pos with h the
    * first 5 md5 bytes (≡ `('0x'||substr(md5(g),1,10))::BIGINT` in
    * external SQL); the result is the DISTINCT rightmost-min of every
    * w-window, in position order. One JVM loop per document replacing
    * the interpreted higher-order-function chain (HOF lambdas walk the
    * expression tree per gram; this fuses ~n·k byte work + n md5 calls
    * behind one codegen'd call). Keys are pairwise DISTINCT (position
    * is encoded), and for distinct values the sliding-window argmin is
    * monotone in the window start, so a selected key's windows form one
    * contiguous run — the `last`-only dedup is exact. */
  /** 3-word shingle fingerprints; see [[Shingle3Hashes]] for the exact
    * SQL equivalence contract. Word boundaries are single 0x20 bytes
    * (Spark's `split(text, ' ')` with its default limit=-1: N
    * separators yield N+1 words, empties included) — safe on the byte
    * level because 0x20 never occurs inside a UTF-8 multi-byte
    * sequence. */
  def shingle3Hashes(text: org.apache.spark.unsafe.types.UTF8String)
      : ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val Seed = 42L
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    // word hashes in one pass over the bytes
    var nWords = 1
    var p = 0
    while (p < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20)
        nWords += 1
      p += 1
    }
    val wh = new Array[Long](nWords)
    var wi = 0
    var start = 0
    p = 0
    while (p <= len) {
      if (p == len ||
          org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20) {
        wh(wi) = XXH64.hashUnsafeBytes(base, off + start, p - start, Seed)
        wi += 1
        start = p + 1
      }
      p += 1
    }
    if (nWords >= 3) {
      val out = new Array[Long](nWords - 2)
      var j = 0
      while (j < nWords - 2) {
        var h = XXH64.hashLong(wh(j), Seed)
        h = XXH64.hashLong(wh(j + 1), h)
        h = XXH64.hashLong(wh(j + 2), h)
        out(j) = h
        j += 1
      }
      new GenericArrayData(out)
    } else {
      var h = Seed
      var j = 0
      while (j < nWords) { h = XXH64.hashLong(wh(j), h); j += 1 }
      new GenericArrayData(Array(h))
    }
  }

  /** Word-window fingerprints for substring dedup, byte-identical to
    * `transform(sequence(0, size(ws)-w), j -> xxhash64(concat_ws(' ',
    * slice(ws, j+1, w))))` over `ws = split(text, ' ')`: because every
    * separator is a single 0x20 and empty words stand in for the gaps,
    * each rejoined window IS a contiguous byte span of the original
    * text — so the kernel hashes original-buffer slices with zero
    * copies and zero string allocation. Returns empty when the text
    * has fewer than `w` words (callers filter on that anyway). */
  def wordWindowHashes(text: org.apache.spark.unsafe.types.UTF8String,
      w: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val Seed = 42L
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    // word start offsets (starts(i) = byte index of word i's first byte)
    var nWords = 1
    var p = 0
    while (p < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20)
        nWords += 1
      p += 1
    }
    if (nWords < w) return new GenericArrayData(Array.empty[Long])
    val starts = new Array[Int](nWords + 1)
    starts(0) = 0
    var wi = 1
    p = 0
    while (p < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20) {
        starts(wi) = p + 1; wi += 1
      }
      p += 1
    }
    starts(nWords) = len + 1 // sentinel: "separator" past the end
    val out = new Array[Long](nWords - w + 1)
    var j = 0
    while (j <= nWords - w) {
      val s = starts(j)
      val e = starts(j + w) - 1 // end of word j+w-1 (before its separator)
      out(j) = XXH64.hashUnsafeBytes(base, off + s, e - s, Seed)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Non-empty-word hashes, byte-identical to
    * `transform(filter(split(text, ' '), w -> w <> ''), x -> xxhash64(x))`. */
  def wordHashes(text: org.apache.spark.unsafe.types.UTF8String)
      : ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val Seed = 42L
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    val out = new Array[Long](len / 2 + 1)
    var cnt = 0
    var start = 0
    var p = 0
    while (p <= len) {
      if (p == len ||
          org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20) {
        if (p > start) {
          out(cnt) = XXH64.hashUnsafeBytes(base, off + start, p - start, Seed)
          cnt += 1
        }
        start = p + 1
      }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }

  /** One-pass text gate statistics over `split(text, ' ')` semantics
    * (empty words included, exactly like the SQL `ws` array):
    * (n_words, n_stop, n_distinct_words, n_distinct_bigrams), where a
    * bigram is `concat(ws[j-1], ' ', ws[j])` — a contiguous byte span
    * of the original text, so distinctness is span-content equality
    * and the sets hold zero-copy UTF8String views. Replaces four
    * interpreted HOF chains (stopword filter, array_distinct of words,
    * bigram transform+distinct) with one JVM loop per document. */
  def textStats(text: org.apache.spark.unsafe.types.UTF8String,
      stops: Array[org.apache.spark.unsafe.types.UTF8String])
      : org.apache.spark.sql.catalyst.InternalRow = {
    import org.apache.spark.unsafe.types.UTF8String
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    var nWords = 1
    var p = 0
    while (p < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20)
        nWords += 1
      p += 1
    }
    val starts = new Array[Int](nWords + 1)
    starts(0) = 0
    var wi = 1
    p = 0
    while (p < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20) {
        starts(wi) = p + 1; wi += 1
      }
      p += 1
    }
    starts(nWords) = len + 1
    def span(s: Int, e: Int): UTF8String =
      UTF8String.fromAddress(base, off + s, e - s)
    var nStop = 0
    val words = new java.util.HashSet[UTF8String](nWords * 2)
    val bigrams = new java.util.HashSet[UTF8String](nWords * 2)
    var j = 0
    while (j < nWords) {
      val w = span(starts(j), starts(j + 1) - 1)
      words.add(w)
      var si = 0
      while (si < stops.length) {
        if (stops(si).equals(w)) { nStop += 1; si = stops.length }
        else si += 1
      }
      if (j >= 1) bigrams.add(span(starts(j - 1), starts(j + 1) - 1))
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nWords, nStop, words.size(), bigrams.size()))
  }

  def winnowKeys(norm: org.apache.spark.unsafe.types.UTF8String,
      k: Int, w: Int): ArrayData = {
    val M = 1048576L
    val bytes = norm.getBytes
    val n = bytes.length - k + 1
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val md = md5Local.get()
    val keys = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(bytes, i, k)
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) |
        ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
      keys(i) = h * M - (i + 1)
      i += 1
    }
    val out = new Array[Long](n - w + 1)
    var cnt = 0
    var last = Long.MinValue
    var s = 0
    while (s <= n - w) {
      var m = keys(s); var j = 1
      while (j < w) { val v = keys(s + j); if (v < m) m = v; j += 1 }
      if (m != last) { out(cnt) = m; cnt += 1; last = m }
      s += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }

  /** First 8 bytes (big-endian) of md5(token's UTF-8 bytes) as a long —
    * the same value `('0x' || substr(md5(t), 1, 16))::UBIGINT` yields
    * in external SQL, making SimHash oracle-reproducible. MD5 costs
    * ~10x an xxhash but the pass stays map-side and codegen'd; the
    * determinism across engines is what buys the hash-checked gate. */
  def md5Hash64(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    bigEndianLong(md.digest(s.getBytes))
  }

  private val Hash2Salt =
    "#2".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** md5Hash64 of (s ++ "#2") — the independent second hash for the
    * MinHash double-hash scheme, reproducible in SQL as
    * `md5(s || '#2')`. */
  def md5Hash64Salted(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(s.getBytes)
    md.update(Hash2Salt)
    bigEndianLong(md.digest())
  }

  private def bigEndianLong(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)

  /** 64-bit SimHash over token hashes: majority vote per bit using a
    * count array, one pass over the tokens. Token hash is MD5-derived
    * ([[md5Hash64]]) so the whole SimHash is recomputable in SQL. */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) {
        val h = md5Hash64(tokens.getUTF8String(j))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L; var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

private object VecTypes {
  def isVec(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  def checkVec(name: String, es: Expression*): TypeCheckResult =
    if (es.forall(isVec)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects ARRAY<FLOAT|DOUBLE> arguments, got " +
        es.map(_.dataType.simpleString).mkString(", "))
  def checkStrArray(name: String, e: Expression): TypeCheckResult =
    e.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$name expects ARRAY<STRING>, got ${t.simpleString}")
    }
}

/** cosine(a, b) over ARRAY<FLOAT|DOUBLE> — codegen'd fused loop. */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypes.checkVec(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      VecTypes.isFloat(left), VecTypes.isFloat(right))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xi = if (VecTypes.isFloat(left)) s"(double) $a.getFloat(i)"
               else s"$a.getDouble(i)"
      val yi = if (VecTypes.isFloat(right)) s"(double) $b.getFloat(i)"
               else s"$b.getDouble(i)"
      val (n, dot, na, nb, i) = (ctx.freshName("n"), ctx.freshName("dot"),
        ctx.freshName("na"), ctx.freshName("nb"), ctx.freshName("i"))
      val (x, y) = (ctx.freshName("x"), ctx.freshName("y"))
      val xiI = xi.replace("(i)", s"($i)"); val yiI = yi.replace("(i)", s"($i)")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $xiI; double $y = $yiI;
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

/** dot(a, b) over ARRAY<FLOAT|DOUBLE> — codegen'd loop. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypes.checkVec(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      VecTypes.isFloat(left), VecTypes.isFloat(right))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xi = if (VecTypes.isFloat(left)) s"(double) $a.getFloat(i)"
               else s"$a.getDouble(i)"
      val yi = if (VecTypes.isFloat(right)) s"(double) $b.getFloat(i)"
               else s"$b.getDouble(i)"
      val (n, acc, i) = (ctx.freshName("n"), ctx.freshName("acc"),
        ctx.freshName("i"))
      val xiI = xi.replace("(i)", s"($i)"); val yiI = yi.replace("(i)", s"($i)")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $acc += ($xiI) * ($yiI); }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** dot(a, b) over ARRAY<BIGINT> in EXACT integer arithmetic — the
  * decision kernel for threshold similarity joins: `cos(a,b) >= τ`
  * evaluated as `dot > 0 AND d²·dot² >= n²·‖a‖²·‖b‖²` (τ = n/d) never
  * depends on float rounding, so two engines computing it agree on
  * every boundary pair by construction (a float cosine at 0.89999999…
  * vs 0.90000000… would flip between engines that sum in different
  * orders). Caller contract: values sized so the dot and its square
  * fit a long — hashed-TF document vectors (|v| ≤ doc word count,
  * dot ≤ ~10⁶) leave 6 orders of headroom. */
case class VecDotLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L; var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, acc, i) = (ctx.freshName("n"), ctx.freshName("acc"),
        ctx.freshName("i"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotLong =
    copy(left = newLeft, right = newRight)
}

/** lsh_bucket(vec, nPlanes) → BIGINT random-hyperplane bucket key. */
case class LshBucket(child: Expression, nPlanes: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypes.checkVec(prettyName, child)
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override def nullSafeEval(in: Any): Any =
    VectorKernels.lshBucket(in.asInstanceOf[ArrayData], nPlanes,
      VecTypes.isFloat(child))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorKernels.lshBucket(" +
        s"$a, $nPlanes, ${VecTypes.isFloat(child)});")

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

/** minhash_sig(shingles, numPerm) → ARRAY<BIGINT> signature. */
case class MinHashSig(child: Expression, numPerm: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypes.checkStrArray(prettyName, child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(in: Any): Any =
    VectorKernels.minhashSig(in.asInstanceOf[ArrayData], numPerm)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorKernels.minhashSig($a, $numPerm);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** simhash64(tokens) → BIGINT SimHash. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypes.checkStrArray(prettyName, child)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(in: Any): Any =
    VectorKernels.simhash64(in.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorKernels.simhash64($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** shingle3_hashes(text) → ARRAY<BIGINT>: the 3-word shingle
  * fingerprints of `text`, byte-identical to the SQL chain
  * `transform(sequence(1, size(wh)-2), j -> xxhash64(wh[j-1], wh[j],
  * wh[j+1]))` over `wh = transform(split(text, ' '), x -> xxhash64(x))`
  * — including the <3-word fallback `array(xxhash64(wh))` and Spark's
  * `split` limit=-1 semantics (consecutive separators yield empty
  * words, hashed like any other). One JVM loop per document instead of
  * interpreted higher-order lambdas per word and per shingle; the
  * xxhash64 composition (seed 42, per-value `XXH64.hashLong` /
  * `hashUnsafeBytes` chaining in child order) is exactly the
  * interpreted expression's. */
case class Shingle3Hashes(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle3_hashes"

  override def nullSafeEval(in: Any): Any =
    VectorKernels.shingle3Hashes(
      in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorKernels.shingle3Hashes($a);")

  override protected def withNewChildInternal(newChild: Expression)
      : Shingle3Hashes = copy(child = newChild)
}

/** word_window_hashes(text, w) → ARRAY<BIGINT>; see
  * [[VectorKernels.wordWindowHashes]]. */
case class WordWindowHashes(child: Expression, w: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_window_hashes"

  override def nullSafeEval(in: Any): Any =
    VectorKernels.wordWindowHashes(
      in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorKernels.wordWindowHashes($a, $w);")

  override protected def withNewChildInternal(newChild: Expression)
      : WordWindowHashes = copy(child = newChild)
}

/** word_hashes(text) → ARRAY<BIGINT>; see [[VectorKernels.wordHashes]]. */
case class WordHashes(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_hashes"

  override def nullSafeEval(in: Any): Any =
    VectorKernels.wordHashes(
      in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorKernels.wordHashes($a);")

  override protected def withNewChildInternal(newChild: Expression)
      : WordHashes = copy(child = newChild)
}

/** distinct_word_hashes(text) → ARRAY<BIGINT>; see
  * [[VectorKernels.distinctWordHashes]]. */
case class DistinctWordHashes(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "distinct_word_hashes"

  override def nullSafeEval(in: Any): Any =
    VectorKernels.distinctWordHashes(
      in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorKernels.distinctWordHashes($a);")

  override protected def withNewChildInternal(newChild: Expression)
      : DistinctWordHashes = copy(child = newChild)
}

/** word_tf_pairs(text) → ARRAY<STRUCT<w STRING, tf INT>>; see
  * [[VectorKernels.wordTfPairs]]. */
case class WordTfPairs(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w", StringType, nullable = false),
    StructField("tf", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "word_tf_pairs"

  override def nullSafeEval(in: Any): Any =
    VectorKernels.wordTfPairs(
      in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorKernels.wordTfPairs($a);")

  override protected def withNewChildInternal(newChild: Expression)
      : WordTfPairs = copy(child = newChild)
}

/** distinct_gram_hashes(text, k) → ARRAY<BIGINT>; see
  * [[VectorKernels.distinctGramHashes]]. */
case class DistinctGramHashes(child: Expression, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "distinct_gram_hashes"

  override def nullSafeEval(in: Any): Any =
    VectorKernels.distinctGramHashes(
      in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorKernels.distinctGramHashes($a, $k);")

  override protected def withNewChildInternal(newChild: Expression)
      : DistinctGramHashes = copy(child = newChild)
}

/** deletion_variant_hashes(text, t) → ARRAY<LONG>: distinct hashes of
  * every variant of `text` with up to `t` characters deleted (the
  * FastSS / SymSpell neighborhood) — see
  * [[VectorKernels.deletionVariantHashes]]. */
case class DeletionVariantHashes(child: Expression, maxDel: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "deletion_variant_hashes"

  override def nullSafeEval(in: Any): Any =
    VectorKernels.deletionVariantHashes(
      in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], maxDel)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = " +
        s"graft.functions.VectorKernels.deletionVariantHashes($a, $maxDel);")

  override protected def withNewChildInternal(newChild: Expression)
      : DeletionVariantHashes = copy(child = newChild)
}

/** shared_count(a, b) → INT, |a ∩ b| over LONG sets. */
case class SharedCount(left: Expression, right: Expression)
    extends BinaryExpression {
  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two ARRAY<BIGINT> inputs")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "shared_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.sharedCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.sharedCount($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SharedCount =
    copy(left = newLeft, right = newRight)
}

/** text_stats(text, stopwords) → STRUCT<n_words INT, n_stop INT,
  * n_distinct_words INT, n_distinct_bigrams INT>; see
  * [[VectorKernels.textStats]]. */
case class TextStats(child: Expression, stopWords: Seq[String])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_distinct_words", IntegerType, nullable = false),
    StructField("n_distinct_bigrams", IntegerType, nullable = false)))
  override def prettyName: String = "text_stats"

  @transient private lazy val stopArr =
    stopWords.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray

  override def nullSafeEval(in: Any): Any =
    VectorKernels.textStats(
      in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], stopArr)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stops", stopArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorKernels.textStats($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : TextStats = copy(child = newChild)
}

/** winnow_keys(norm, k, w) → ARRAY<BIGINT> of selected winnowing keys
  * (h·2²⁰ − pos; see [[VectorKernels.winnowKeys]]). */
case class WinnowKeys(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_keys"

  override def nullSafeEval(in: Any): Any =
    VectorKernels.winnowKeys(
      in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorKernels.winnowKeys($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowKeys =
    copy(child = newChild)
}

/** Column API + SQL registration for the vector kernels. */
object VectorOps {
  def cosine(a: Column, b: Column): Column =
    ColumnExpr.column(VecCosine(ColumnExpr.expr(a), ColumnExpr.expr(b)))
  def dot(a: Column, b: Column): Column =
    ColumnExpr.column(VecDot(ColumnExpr.expr(a), ColumnExpr.expr(b)))
  def dotLong(a: Column, b: Column): Column =
    ColumnExpr.column(VecDotLong(ColumnExpr.expr(a), ColumnExpr.expr(b)))
  def minhashSig(shingles: Column, numPerm: Int): Column =
    ColumnExpr.column(MinHashSig(ColumnExpr.expr(shingles), numPerm))
  def lshBucket(vec: Column, nPlanes: Int): Column =
    ColumnExpr.column(LshBucket(ColumnExpr.expr(vec), nPlanes))
  def simhash64(tokens: Column): Column =
    ColumnExpr.column(SimHash64(ColumnExpr.expr(tokens)))
  def winnowKeys(norm: Column, k: Int, w: Int): Column =
    ColumnExpr.column(WinnowKeys(ColumnExpr.expr(norm), k, w))
  def shingle3Hashes(text: Column): Column =
    ColumnExpr.column(Shingle3Hashes(ColumnExpr.expr(text)))
  def wordWindowHashes(text: Column, w: Int): Column =
    ColumnExpr.column(WordWindowHashes(ColumnExpr.expr(text), w))
  def wordHashes(text: Column): Column =
    ColumnExpr.column(WordHashes(ColumnExpr.expr(text)))
  def textStats(text: Column, stopWords: Seq[String]): Column =
    ColumnExpr.column(TextStats(ColumnExpr.expr(text), stopWords))
  def distinctWordHashes(text: Column): Column =
    ColumnExpr.column(DistinctWordHashes(ColumnExpr.expr(text)))
  def sharedCount(a: Column, b: Column): Column =
    ColumnExpr.column(SharedCount(ColumnExpr.expr(a), ColumnExpr.expr(b)))
  def distinctGramHashes(text: Column, k: Int): Column =
    ColumnExpr.column(DistinctGramHashes(ColumnExpr.expr(text), k))
  def deletionVariantHashes(text: Column, maxDel: Int): Column =
    ColumnExpr.column(DeletionVariantHashes(ColumnExpr.expr(text), maxDel))
  def wordTfPairs(text: Column): Column =
    ColumnExpr.column(WordTfPairs(ColumnExpr.expr(text)))

  /** Register as SQL functions (vec_cosine, vec_dot, minhash_sig,
    * simhash64) on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_cosine",
      { args => VecCosine(args(0), args(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("vec_dot",
      { args => VecDot(args(0), args(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      { args =>
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, IntegerType) =>
            v.asInstanceOf[Int]
          case _ => 64
        }
        MinHashSig(args(0), n)
      }, "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      { args => SimHash64(args(0)) }, "scala_udf")
    def intLit(e: Expression, dflt: Int): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, IntegerType) =>
        v.asInstanceOf[Int]
      case _ => dflt
    }
    reg.createOrReplaceTempFunction("winnow_keys",
      { args => WinnowKeys(args(0), intLit(args(1), 8), intLit(args(2), 4)) },
      "scala_udf")
    reg.createOrReplaceTempFunction("shingle3_hashes",
      { args => Shingle3Hashes(args(0)) }, "scala_udf")
    reg.createOrReplaceTempFunction("word_hashes",
      { args => WordHashes(args(0)) }, "scala_udf")
    reg.createOrReplaceTempFunction("word_window_hashes",
      { args => WordWindowHashes(args(0), intLit(args(1), 15)) },
      "scala_udf")
    reg.createOrReplaceTempFunction("distinct_word_hashes",
      { args => DistinctWordHashes(args(0)) }, "scala_udf")
    reg.createOrReplaceTempFunction("distinct_gram_hashes",
      { args => DistinctGramHashes(args(0), intLit(args(1), 3)) },
      "scala_udf")
    reg.createOrReplaceTempFunction("shared_count",
      { args => SharedCount(args(0), args(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("word_tf_pairs",
      { args => WordTfPairs(args(0)) }, "scala_udf")
    reg.createOrReplaceTempFunction("deletion_variant_hashes",
      { args => DeletionVariantHashes(args(0), intLit(args(1), 2)) },
      "scala_udf")
  }
}
