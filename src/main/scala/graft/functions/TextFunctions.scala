package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for LLM-data pipelines (SURVEY.md §2.10):
  * tokenization, shingling, quality scoring, language-ID heuristic,
  * fingerprinting. All pure Column expressions (codegen-friendly, no UDFs)
  * so they stay inside whole-stage codegen at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokens (matches DuckDB `string_split(text, ' ')`). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex token count: word runs, digit runs, or single
    * non-space punctuation — the standard pre-tokenizer shape. */
  val bpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def regexTokenCount(text: Column): Column = regexp_count(text, lit(bpeishPattern))

  /** Fixed-size token windows — the "line" unit for corpora without real
    * line structure (line-level dedup, span attribution). Chunk i holds
    * tokens [i·n, (i+1)·n); the last chunk may be short; empty text yields
    * one empty chunk (split("") is [""], same as the oracle's
    * string_split). Mirrors DuckDB `w[i*n+1 : i*n+n]` slicing. */
  def tokenChunks(text: Column, n: Int): Column = {
    val w = tokens(text)
    val nChunks = ceil(size(w).cast("double") / n).cast("int")
    transform(sequence(lit(0), nChunks - 1),
      i => concat_ws(" ", slice(w, i * n + 1, lit(n))))
  }

  /** Overlapping sliding token windows — the retrieval/pretraining chunking
    * step: window of `window` tokens advancing by `stride` (< window ⇒
    * consecutive chunks share `window - stride` tokens of context). Chunk i
    * holds tokens [i·stride, i·stride + window); chunk count is
    * 1 + ceil(max(n − window, 0) / stride), so the final chunk always
    * reaches the last token and no start position ≥ n is emitted. Empty
    * text yields one empty chunk (split("") is [""]). Identity with
    * [[tokenChunks]] when stride == window. Pure Column expression — the
    * fan-out happens in the caller's posexplode, so chunking a 100 TB
    * corpus is a narrow codegen'd projection with no shuffle. */
  def slidingTokenChunks(text: Column, window: Int, stride: Int): Column = {
    require(window > 0 && stride > 0 && stride <= window,
      s"slidingTokenChunks needs 0 < stride <= window, got window=$window stride=$stride")
    val w = tokens(text)
    val extra = ceil((size(w) - window).cast("double") / stride).cast("int")
    transform(sequence(lit(0), greatest(extra, lit(0))),
      i => concat_ws(" ", slice(w, i * stride + 1, lit(window))))
  }

  /** Non-distinct word n-grams over an ALREADY-TOKENIZED array; empty array
    * when fewer than n tokens (guards `sequence`'s descending-range behavior
    * on negative spans). The single gram builder — shingles (distinct, for
    * Jaccard) and repetition stats (with multiplicity) both derive from it,
    * so the construction can't silently desynchronize between them. */
  def ngramsOfTokens(w: Column, n: Int): Column = {
    val make = transform(
      sequence(lit(0), size(w) - n),
      i => concat_ws(" ", (1 to n).map(o => element_at(w, i + o)): _*))
    when(size(w) >= n, make).otherwise(array().cast("array<string>"))
  }

  /** Distinct word n-gram shingles of `text` tokens. */
  def shingles(text: Column, n: Int): Column =
    array_distinct(ngramsOfTokens(tokens(text), n))

  /** Exact word-shingle Jaccard similarity between two shingle arrays
    * (double division, mirrored by the DuckDB oracle). */
  def jaccard(a: Column, b: Column): Column =
    // Native specialized expression — same value as
    // size(array_intersect)/size(array_union) on distinct-element inputs,
    // ~10× cheaper per pair than the generic interpreted set machinery
    // (this is the entire cost of the O(n²) verify loops).
    TextExpressions.jaccardSim(a, b)

  /** Karp–Rabin rolling hash parameters: polynomial base and a Mersenne
    * modulus small enough that acc·B + h never overflows a long on either
    * engine (acc < 2³¹, B ≈ 2²⁰, h < 2³²). Token base hash = first 8 md5
    * hex digits, so DuckDB reproduces it via ('0x'||substr(md5,1,8))::BIGINT. */
  val rollB = 1000003L
  val rollM = 2147483647L

  /** Rolling k-gram hashes: H(i) = fold of the k token hashes at i with
    * acc → (acc·B + h) mod M. Folding from init 0 is congruent to DuckDB's
    * init-from-first-element `list_reduce` — both end on a mod-M value.
    * Documents with fewer than k tokens yield an empty array. */
  def rollingKgramHashes(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val bh = transform(toks, t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => aggregate(slice(bh, i, lit(k)), lit(0L),
          (acc, h) => pmod(acc * lit(rollB) + h, lit(rollM)))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Winnowing (Schleimer, Wilkerson & Aiken 2003, "Winnowing: Local
    * Algorithms for Document Fingerprinting" — public): the distinct minima
    * of every w-window of k-gram hashes — guarantees any shared run of
    * w + k − 1 tokens shares a fingerprint, with ~2/(w+1) selection density.
    * Fewer than w hashes → one global-min fingerprint; NO hashes → empty
    * (array_min of an empty array is NULL, and a [null] fingerprint set
    * would make every sub-k-token doc "share" a fingerprint with every
    * other — array_intersect matches null elements). */
  def winnowedFingerprints(kgramHashes: Column, w: Int): Column =
    when(size(kgramHashes) >= w,
      array_distinct(transform(sequence(lit(1), size(kgramHashes) - (w - 1)),
        j => array_min(slice(kgramHashes, j, lit(w))))))
      .when(size(kgramHashes) > 0, array(array_min(kgramHashes)))
      .otherwise(array().cast("array<bigint>"))

  /** Content fingerprint: minimum md5 over 3-gram shingles (1-permutation
    * MinHash / winnowing-lite). Identical and near-identical prefixed docs
    * collide; cross-engine checkable because md5 is common. */
  def fingerprint(text: Column): Column = {
    val sh = shingles(text, 3)
    when(size(sh) > 0, array_min(transform(sh, s => md5(s)))).otherwise(md5(text))
  }

  /** Stopword hit count: tokens ∈ `words` (with multiplicity). */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit): _*)))

  /** Quality score in [0,1]: blend of length band, mean token length band,
    * and stopword ratio — the standard heuristic pre-filter shape for
    * training-data pipelines. Pure arithmetic; mirrored in the oracle. */
  def qualityScore(text: Column, nChars: Column, stopwords: Seq[String]): Column = {
    val nTok = size(tokens(text)).cast("double")
    val meanLen = (nChars.cast("double") - (nTok - 1)) / nTok // chars sans separators
    val stopRatio = stopwordHits(text, stopwords).cast("double") / nTok
    val lenOk = when(nTok.between(20, 2000), 1.0).otherwise(0.0)
    val meanOk = when(meanLen.between(2.0, 12.0), 1.0).otherwise(0.0)
    (lenOk * lit(0.4)) + (meanOk * lit(0.3)) + (stopRatio * lit(0.3))
  }

  /** PII scrubbing for training corpora: replace email addresses, long digit
    * runs (phone/account numbers), and IPv4 addresses with typed tags.
    * Same RE2/Java-compatible patterns run in the oracle. */
  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val longDigitPattern = "[0-9][0-9 ()+.-]{6,}[0-9]"
  val ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, emailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, ipv4Pattern, "<IP>")
    regexp_replace(noIp, longDigitPattern, "<NUMBER>")
  }

  /** Deflate-compressed length of the text's UTF-8 encoding (raw deflate,
    * level 6, no zlib header) — the building block of the compression-
    * ratio quality signal. NULL in → NULL out. A Scala UDF by necessity
    * (Spark has no built-in compressor); the work is a stateless per-row
    * deflate, so it pipelines inside the scan stage like any projection
    * and shuffles nothing. Deterministic for a given JRE's zlib; NOT
    * bit-reproducible across engines, so oracle coverage is the
    * accuracy-gate twin (l42) plus TextStatsSpec. */
  val deflateLength: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else {
        val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d = new java.util.zip.Deflater(6, true)
        d.setInput(bytes); d.finish()
        val buf = new Array[Byte](8192)
        var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        d.end()
        java.lang.Long.valueOf(n)
      }
    }

  /** Compression-ratio quality signal (CCNet/Gopher-style): deflated
    * bytes / raw UTF-8 bytes. Natural prose lands roughly 0.3–0.6,
    * repeated boilerplate far lower, random junk near (or, for short
    * strings, slightly above) 1 — so both tails are filter candidates.
    * NULL or empty text → NULL. */
  def compressionRatio(text: Column): Column =
    when(octet_length(text) > 0,
      deflateLength(text).cast("double") / octet_length(text).cast("double"))

  /** Deterministic hash-bucket assignment in [0, buckets): stable across
    * runs and cluster layouts (content-derived, never rand()). md5-based so
    * the DuckDB oracle reproduces it: bucket = first 4 hex digits mod n.
    * NULL keys get a deterministic bucket too (md5(NULL) is NULL, and a
    * NULL bucket fails every sampling predicate — rows with null ids would
    * silently vanish from BOTH halves of a split, breaking the exhaustive-
    * partition contract of [[graft.operators.Sampling]]). The sentinel is
    * "graft-null-key" prefixed with code point U+0000 (written as the
    * `\u0000` escape below), which no real key's string form can contain;
    * an oracle SQL bucketing a NULLABLE key must coalesce NULLs to the
    * same sentinel string before hashing — current oracled keys (doc_id)
    * are non-null, so oracles omit the coalesce. */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(coalesce(key.cast("string"), lit("\u0000graft-null-key"))), 1, 4), 16, 10)
      .cast("long"), lit(buckets))

  /** Language-ID heuristic: argmax of per-language marker-word hit counts,
    * ties broken by language code order. 'und' when nothing matches. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that"),
    "es" -> Seq("el", "la", "de", "y", "es", "que", "en", "un"),
    "fr" -> Seq("le", "la", "de", "et", "est", "que", "dans", "un"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "zai4", "you3", "he2", "wo3"))

  def langGuess(text: Column): Column = {
    val scored = langMarkers.map { case (code, words) => (lit(code), stopwordHits(text, words)) }
    // strictly-greater comparison on a fixed scan order = argmax with ties
    // broken by language-code order; the oracle mirrors the CASE chain.
    val (bestCode, _) = scored.reduceLeft[(Column, Column)] { case ((bc, bs), (c, sc)) =>
      (when(sc > bs, c).otherwise(bc), when(sc > bs, sc).otherwise(bs))
    }
    val anyHit = scored.map(_._2).reduce(_ + _) > 0
    when(anyHit, bestCode).otherwise(lit("und"))
  }

  /** HTML/markup → clean text (the C4/CCNet web-extraction step): drop
    * <script>/<style> blocks WITH their contents, drop comments, strip all
    * remaining tags, decode the common entities, collapse whitespace. Pure
    * regexp_replace chain — codegen'd, no UDF, so extraction runs inside
    * the scan stage of a 100 TB WARC-derived table. Entity decode is one
    * level (sequential replace with &amp; LAST, the conventional order:
    * "&amp;lt;" → "&lt;", never "<"). Java-regex backreference \1 keeps
    * script/style matching symmetric; nothing here needs the oracle to
    * regex (queries build expected text by construction instead). */
  def extractHtmlText(html: Column): Column = {
    val noBlock = regexp_replace(html, "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>", " ")
    val noComment = regexp_replace(noBlock, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]+>", " ")
    val entities = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
