package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Locale
import java.util.regex.Pattern

/** Compiled (plain-JVM) twins of the md5-based column hashes in
  * [[TextFunctions]], for the per-document signature passes of
  * [[graft.operators.Dedup]].
  *
  * Why these exist: higher-order-function column expressions
  * (`transform`/`aggregate`) are interpreted, not codegen'd, and projection
  * collapse re-inlines their subtrees — a k-position MinHash expressed that
  * way re-evaluates the shingle pipeline k×bands times per row. A single
  * compiled pass per document is linear and runs at memory bandwidth, which
  * is the shape a 100 TB corpus needs (the per-doc work distributes with the
  * scan; nothing here shuffles).
  *
  * Determinism contract: every hash bottoms out in md5 over UTF-8 bytes plus
  * integer arithmetic kept inside int64 (no overflow, no platform variance),
  * so an external engine (the DuckDB oracle) can recompute byte-identical
  * signatures from the same SQL-expressible formulas.
  */
object TextHash {

  /** Token split must match TextFunctions.tokens / the DuckDB oracle:
    * lowercase, split on runs of non-[a-z0-9], drop empties.
    *
    * Lowercasing parity note: this uses Locale.ROOT. Spark's `lower()`
    * takes a locale-independent fast path for all-ASCII strings but its
    * non-ASCII slow path lowercases with the JVM DEFAULT locale — so on a
    * tr/az-default-locale JVM a document containing both 'I' and any
    * non-ASCII character can tokenize differently here ('I'→'i', kept)
    * than in the column twin ('I'→dotless 'ı', dropped by [a-z0-9]).
    * Parity holds for ASCII corpora on any locale and for all corpora on
    * non-Turkic locales; pin the executor locale (-Duser.language=en) when
    * feeding mixed-script text through both paths.
    */
  private val TokenPattern: Pattern = Pattern.compile("[^a-z0-9]+")

  def tokens(text: String): Array[String] =
    if (text == null) Array.empty[String]
    else TokenPattern.split(text.toLowerCase(Locale.ROOT), -1).filter(_.nonEmpty)

  /** First 15 hex chars of md5(UTF-8) as a long — the compiled twin of
    * [[TextFunctions.md5Hash60]] (= top 60 bits of the first 8 digest bytes).
    */
  def md5Hash60(md: MessageDigest, s: String): Long =
    ByteBuffer.wrap(md.digest(s.getBytes(UTF_8)), 0, 8).getLong >>> 4

  def md5Hash60(s: String): Long = md5Hash60(MessageDigest.getInstance("MD5"), s)

  // One digest instance per thread: the codegen kernel below runs per row,
  // and MessageDigest.getInstance per call would dominate the hash itself.
  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** The per-row kernel behind the native `graft_md5h60` expression
    * ([[org.apache.spark.sql.graft.Md5Hash60]]): identical value to the
    * `conv(substring(md5(c), 1, 15), 16, 10)` column chain (first 15 hex
    * chars = top 60 bits of the first 8 digest bytes), without
    * materializing the 32-char hex string per row. Called from generated
    * code — keep the signature (byte[]) → long and the name stable.
    */
  def md5Hash60Bytes(bytes: Array[Byte]): Long = {
    val md = localMd.get()
    md.reset()
    ByteBuffer.wrap(md.digest(bytes), 0, 8).getLong >>> 4
  }

  /** Word k-shingles; documents with fewer than k tokens contribute their
    * whole token sequence as one shingle (so every doc has ≥1 shingle, the
    * empty doc's being ""). Matches the DuckDB oracle's list_transform form.
    */
  def shingles(toks: Array[String], k: Int = 3): Array[String] =
    if (toks.length >= k)
      Array.tabulate(toks.length - k + 1)(j => toks.slice(j, j + k).mkString(" "))
    else Array(toks.mkString(" "))

  /** Largest prime below 2^30. Shingle hashes are reduced mod this so the
    * affine permutations below stay inside int64: a < P, h < P ⇒ a·h+b < 2^60.
    */
  val MinhashPrime: Long = 1073741789L

  /** Modulus of the band-key fold; 2^40 keeps acc·31+sig < 2^46. */
  val BandFoldMod: Long = 1L << 40

  /** Deterministic affine coefficients for the k MinHash permutations,
    * derived from md5 so the oracle can rebuild them in SQL:
    * a_i = md5Hash60("a:i") mod (P-1) + 1 (nonzero), b_i = md5Hash60("b:i") mod P.
    */
  def minhashCoeffs(k: Int): (Array[Long], Array[Long]) = {
    val md = MessageDigest.getInstance("MD5")
    val a = Array.tabulate(k)(i => md5Hash60(md, s"a:$i") % (MinhashPrime - 1) + 1)
    val b = Array.tabulate(k)(i => md5Hash60(md, s"b:$i") % MinhashPrime)
    (a, b)
  }

  /** Distinct hashed shingles of a token sequence: md5Hash60 mod P per
    * shingle, deduped and sorted. Dedup happens AFTER hashing (two shingles
    * colliding mod P count once) so the DuckDB oracle's
    * `list_distinct(list_transform(sh, md5…))` computes the identical set —
    * Jaccard verification runs over these longs, never over the strings.
    */
  def hashedShingles(toks: Array[String], md: MessageDigest, k: Int = 3): Array[Long] =
    shingles(toks, k).map(s => md5Hash60(md, s) % MinhashPrime).distinct.sorted

  /** MinHash signature over pre-hashed shingles — O(|hs|·k) integer ops,
    * zero digests. sig_i = min over hs of (a_i · h + b_i) mod P.
    */
  def minhashFromHashes(hs: Array[Long], a: Array[Long], b: Array[Long]): Array[Long] = {
    val k = a.length
    val sig = Array.fill(k)(Long.MaxValue)
    var s = 0
    while (s < hs.length) {
      val h = hs(s)
      var i = 0
      while (i < k) {
        val v = (a(i) * h + b(i)) % MinhashPrime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      s += 1
    }
    sig
  }

  /** MinHash signature of a shingle set: one md5 per shingle, then k affine
    * permutations — O(|sh|·k) integer ops, not O(|sh|·k) digests.
    * sig_i = min over shingles of (a_i · (md5Hash60(s) mod P) + b_i) mod P.
    */
  def minhashSignature(sh: Array[String], a: Array[Long], b: Array[Long],
      md: MessageDigest): Array[Long] =
    minhashFromHashes(sh.map(s => md5Hash60(md, s) % MinhashPrime), a, b)

  /** LSH band keys: fold each r-wide signature slice (seeded with the band
    * index) as acc = (acc·31 + sig_p) mod 2^40 — since the fold fits int64,
    * this equals the polynomial (band·31^r + Σ sig_p·31^(r-1-p)) mod 2^40 the
    * oracle writes as a grouped sum.
    */
  def bandKeys(sig: Array[Long], bands: Int): Array[Long] = {
    require(bands > 0 && sig.length % bands == 0,
      s"bands=$bands must evenly divide signature width ${sig.length}")
    val r = sig.length / bands
    Array.tabulate(bands) { bnd =>
      var acc = bnd.toLong
      var p = bnd * r
      val end = p + r
      while (p < end) { acc = (acc * 31 + sig(p)) % BandFoldMod; p += 1 }
      acc
    }
  }

  /** 60-bit SimHash over tokens (duplicates counted): bit i is set iff the
    * sum of ±1 votes from bit i of each token's md5Hash60 is positive.
    * Returns None for token-less documents.
    */
  def simhash60(md: MessageDigest, text: String): Option[Long] = {
    val toks = tokens(text)
    if (toks.isEmpty) None
    else {
      val votes = new Array[Int](60)
      var t = 0
      while (t < toks.length) {
        val h = md5Hash60(md, toks(t))
        var i = 0
        while (i < 60) {
          votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
        t += 1
      }
      var fp = 0L
      var i = 0
      while (i < 60) { if (votes(i) > 0) fp |= (1L << i); i += 1 }
      Some(fp)
    }
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * hash every POSITIONAL k-gram (order preserved, duplicates kept — unlike
    * [[hashedShingles]]' set), slide a w-window over the hash sequence and
    * keep each window's minimum; the document fingerprint is the distinct
    * sorted set of picks. The winnowing guarantee: every run of w
    * consecutive k-grams contributes ≥1 pick, so two documents sharing any
    * token run of length ≥ w+k−1 always share a fingerprint — the
    * density/recall trade-off is tunable and the selection is
    * position-robust (unlike every-nth sampling). Documents shorter than k
    * tokens contribute their whole token join as one gram, mirroring
    * [[shingles]].
    */
  def winnow(toks: Array[String], md: MessageDigest, k: Int = 3, w: Int = 4): Array[Long] = {
    // gram construction IS shingles(toks, k) — one definition, not a copy
    val grams: Array[Long] = shingles(toks, k).map(md5Hash60(md, _))
    val nw = math.max(grams.length - w + 1, 1)
    val picks = Array.tabulate(nw) { j =>
      var m = Long.MaxValue
      var i = j
      val end = math.min(j + w, grams.length)
      while (i < end) { if (grams(i) < m) m = grams(i); i += 1 }
      m
    }
    picks.distinct.sorted
  }
}
