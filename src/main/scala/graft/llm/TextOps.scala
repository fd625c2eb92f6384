package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._


/** Text-analysis operators for training-data pipelines (north-star
  * extension; the reference's only text op is embedding-text assembly,
  * run_incremental_batch.py:77). All stat/score/langid columns are pure
  * codegen'd expressions — no UDF on the hot path except the rolling-hash
  * fingerprint.
  */
object TextOps {

  /** Explicit whitespace characters used by every regex that has a DuckDB
    * oracle twin: Java's `\s` matches vertical tab, RE2's does not — an
    * explicit class pins both engines to the same behavior. */
  val WsChars = " \\t\\n\\x0B\\f\\r"

  /** `\s+` replacement built from [[WsChars]]. */
  val WsClass = s"[$WsChars]+"

  /** Non-alphanumeric-non-whitespace ("punctuation") class from
    * [[WsChars]]. */
  val PunctClass = s"[^A-Za-z0-9$WsChars]"

  /** Small per-language function-word lexicons (public knowledge). */
  val lexicons: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "es" -> Seq("el", "de", "los", "las", "y", "que", "en", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht", "mit"))

  def tokens(text: Column): Column = split(text, " ")

  /** Unicode-whitespace-aware tokenizer: splits on RUNS of every
    * [[WsChars]] kind and drops empty tokens — the robust option for
    * real corpora where tabs/newlines/double spaces otherwise glue
    * punctuation into tokens and silently skew token budgets and
    * k-gram decontamination. Threaded as the optional `tok` parameter
    * of the token operators ([[graft.llm.Corpus.kGrams]]/`shingles`/
    * `decontaminate`/`chunkLongDocuments`, [[withTokenCounts]]);
    * [[tokens]] (single-space split, empties kept) stays the default —
    * the historical oracle contract of q93/q94/q95/q97/q104. DuckDB
    * twin: `list_filter(string_split_regex(text, '[ \t\n\v\f\r]+'),
    * x -> x != '')` (q107 hash-checks the pairing; Embed
    * .denseSqlVectors/q65 established it). */
  def regexTokens(text: Column): Column =
    filter(split(text, WsClass), t => t =!= "")

  /** Whitespace token count + BPE-ish subword count (letter runs, digit
    * runs, single punctuation — the GPT-2 pre-tokenizer shape). */
  def withTokenCounts(df: DataFrame, textCol: String,
      tok: Column => Column = tokens): DataFrame =
    df.withColumn("n_tokens", size(tok(col(textCol))))
      .withColumn("n_bpe_pieces",
        size(regexp_extract_all(col(textCol),
          lit(s"[A-Za-z]+|[0-9]|$PunctClass"), lit(0))))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Quality-score features and composite (length, lexical diversity,
    * punctuation load, stopword signal) — deterministic arithmetic. */
  def withQualityScore(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("double")
    val distinctRatio = size(array_distinct(toks)).cast("double") /
      greatest(nTok, lit(1.0))
    val punct = size(regexp_extract_all(col(textCol),
      lit(PunctClass), lit(0))).cast("double")
    val punctRatio = punct / greatest(length(col(textCol)).cast("double"),
      lit(1.0))
    val stopRatio = countIn(toks, lexicons("en")).cast("double") /
      greatest(nTok, lit(1.0))
    df.withColumn("n_tokens", nTok.cast("long"))
      .withColumn("distinct_ratio", round(distinctRatio, 6))
      .withColumn("punct_ratio", round(punctRatio, 6))
      .withColumn("stopword_ratio", round(stopRatio, 6))
      .withColumn("quality_score", round(
        least(nTok / lit(50.0), lit(1.0)) * lit(0.25) +
          distinctRatio * lit(0.25) +
          (lit(1.0) - least(punctRatio * lit(5.0), lit(1.0))) * lit(0.25) +
          least(stopRatio * lit(5.0), lit(1.0)) * lit(0.25), 6))
  }

  /** N-gram-heuristic language ID: count function-word hits per language,
    * argmax with fixed precedence (en > fr > es > de), 'und' if no hits. */
  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val scores = Seq("en", "fr", "es", "de")
      .map(l => l -> countIn(toks, lexicons(l)))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und"): Column) { case ((l, sc), acc) =>
      when(sc === best && best > 0, lit(l)).otherwise(acc)
    }
    // foldRight gives later languages as the fallback of earlier `when`s,
    // so ties resolve to the first language in precedence order
    val withScores = scores.foldLeft(df) { case (acc, (l, sc)) =>
      acc.withColumn(s"score_$l", sc)
    }
    withScores.withColumn("lang_pred", pick)
  }

  /** Stable document fingerprint: md5 of whitespace-normalized lowercase
    * text (SQL-expressible; the oracle mirrors it). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), WsClass, " "))

  /** Conservative shared-syntax email pattern: character classes, `+`,
    * `{2,}` only — constructs Java regex (Spark) and RE2 (DuckDB)
    * evaluate identically, so redaction is oracle-checkable. Anything
    * fancier (lookaround, backrefs) is Java-only and would silently
    * diverge. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** URL pattern restricted to an explicit charset (no lazy
    * quantifiers, no \\S) for the same cross-engine reason. The class
    * includes the query/fragment/port characters `? = & % : # ~ + !`
    * — all literal inside a character class in BOTH engines — so
    * `...?token=secret` or `:8080/x` tails are scrubbed with the URL
    * rather than left dangling after the placeholder. */
  val UrlRe = "https?://[A-Za-z0-9./_?=&%:#~+!-]+"

  /** Hashed linear text classifier — the SERVING shape of the
    * fastText-style quality gate every public pretraining pipeline
    * runs (LLaMA/RedPajama's "looks like a Wikipedia reference"
    * filter, CCNet's head/middle/tail buckets): tokens hash into a
    * FIXED bucket space (the hashing trick — model size is bounded at
    * any vocabulary, the reason fastText scales), each bucket carries
    * a weight, the document score is the tf-weighted sum, the label is
    * a threshold. Weights here are a deterministic stand-in —
    * `(bucket · 2654435761) mod 2003 − 1001`, the q92 multiplicative-
    * scramble convention — because no trained model ships with this
    * repo (the [[graft.llm.Multimodal]] stub discipline): swapping in
    * trained weights means replacing one scalar function with a
    * broadcast array lookup; every other part of the path is the real
    * thing. All-integer arithmetic (60-bit md5 digests, exact long
    * sums), so scores and labels hash-replay in any engine.
    *
    * Scale shape: ONE `aggregate` HOF fold over the token array — a
    * map-only projection, no explode, no shuffle, and the classifier
    * runs as a streaming ingest gate unchanged. */
  def hashedClassifierScore(toks: Column, nBuckets: Int = 4096): Column =
    aggregate(toks, lit(0L), (acc, t) =>
      acc + ((conv(substring(md5(t), 1, 15), 16, 10).cast("long")
        % nBuckets) * lit(2654435761L) % 2003L - 1001L))

  /** PII scrubbing — the standard pretraining cleaning stage the
    * quality gates don't cover: replace emails then URLs with stable
    * placeholder tokens. Emails first: a URL userinfo part could
    * otherwise leave a dangling match. Pure `regexp_replace`, so the
    * whole scrub is one codegen projection — map-only at any scale. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      UrlRe, "<URL>")

  /** C4-style line filtering (Raffel et al. 2020 §2.2): drop lines with
    * fewer than `minWords` whitespace WORDS — counted with
    * [[regexTokens]], so runs of spaces/tabs don't inflate the count
    * (an all-whitespace line is 0 words, a tab-separated sentence
    * counts every word) — and rejoin the survivors: the boilerplate
    * gate (nav menus, cookie banners, footers are short lines). Pure
    * builtins (`split` → `filter` HOF → `array_join`), one codegen
    * projection, map-only at any scale. A text whose every line fails
    * becomes the empty string — callers gate on that downstream (the
    * q58 clean-stage convention). */
  def c4LineFilter(text: Column, minWords: Int = 3): Column =
    array_join(
      filter(split(text, "\n"),
        l => size(regexTokens(l)) >= minWords),
      "\n")

  /** Plain-Scala twin of `Corpus.shingles(·, k, regexTokens)` — the
    * SCALAR PASS for k-gram derivation over regex tokens (the q106
    * lesson applied to shingling: lambda-bearing HOF chains are
    * excluded from whole-stage codegen AND subexpression elimination,
    * so tokenize→slice→join→distinct re-evaluates per element
    * interpreted; one JIT-compiled function per row replaces all of
    * it). Parity by construction: Scala `split` keeps leading empties
    * exactly like Spark's `split` with the same [[WsClass]] pattern
    * (both drop to nothing under the nonEmpty filter), `sliding(k).
    * mkString(" ")` ≡ `array_join(slice(toks, i, k), " ")`, and
    * `.distinct` preserves first-occurrence order like
    * `array_distinct`. Texts with fewer than k tokens yield NO
    * shingles (the kGrams guard), matching the Column path and the
    * DuckDB `greatest(len(tk) - (k-2), 1)` twin. */
  def regexShingleSet(text: String, k: Int): Array[String] = {
    // NULL text ⇒ no shingles, matching the Column path (shingles(null)
    // is null and explode(null) emits no rows; an unguarded UDF would
    // instead NPE and fail the whole job on one bad row)
    if (text == null) return Array.empty
    val toks = text.split(WsClass).filter(_.nonEmpty)
    if (toks.length < k) Array.empty
    else toks.sliding(k).map(_.mkString(" ")).toArray.distinct
  }

  /** Corpus-frequency token-rarity profile — the unigram-LM quality
    * proxy of the CCNet/Wenzek et al. 2020 perplexity-filter family,
    * kept INTEGER-exact so the gate is a hash match, not a float
    * tolerance: build the corpus vocabulary (global occurrence count
    * per whitespace token, kept where count ≥ `minCount`), then per
    * document emit `n_tokens`, `n_oov` (occurrences of below-threshold
    * tokens — gibberish, encoding damage and boilerplate junk
    * concentrate here), `sum_freq` (Σ occurrences × that token's
    * corpus count — divide by n_tokens for mean familiarity; low means
    * rare-heavy) and `min_freq` (the rarest in-vocab token, 0 if every
    * token is OOV). The caller ranks/filters on the ratios; keeping
    * the outputs as counts is what lets DuckDB replay them bit-for-bit.
    *
    * Scale shape: ONE corpus scan. Tokens collapse to per-(doc, token)
    * occurrence counts FIRST — partial aggregation eats the per-doc
    * repeats of "the" map-side — and that distinct-bounded frame
    * ([[https://en.wikipedia.org/wiki/Heaps%27_law Heaps' law]]: it
    * grows far slower than the corpus) is localCheckpointed once and
    * feeds BOTH the vocabulary aggregate and the join back, so the
    * frequency join's build side is vocabulary-sized and its probe
    * side carries no within-doc duplicate keys: the classic hot-key
    * skew of a per-occurrence token join ("the" at 100 TB) is designed
    * out before the shuffle instead of salted after it. */
  def tokenRarity(df: DataFrame, idCol: String, textCol: String,
      minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val docTok = df
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("occ"))
      .localCheckpoint(false)
    val vocab = docTok.groupBy(col("token"))
      .agg(sum(col("occ")).as("freq"))
      .filter(col("freq") >= minCount)
    docTok.join(vocab, Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("occ")).as("n_tokens"),
        sum(when(col("freq").isNull, col("occ")).otherwise(lit(0L)))
          .as("n_oov"),
        coalesce(sum(col("occ") * col("freq")), lit(0L)).as("sum_freq"),
        coalesce(min(col("freq")), lit(0L)).as("min_freq"))
  }

  /** BPE vocabulary-induction statistics: the adjacent-pair frequency
    * table the FIRST merge step of byte-pair encoding (Sennrich et al.
    * 2016) ranks on — over lowercase letter-run pieces (the same piece
    * shape [[withTokenCounts]]'s `n_bpe_pieces` counts), every
    * adjacent character pair weighted by how often its piece occurs in
    * the corpus. A tokenizer team runs exactly this query to inspect
    * candidate merges / vocabulary fit on a new corpus.
    *
    * Scale shape: pieces collapse to (piece, count) FIRST — the pair
    * explosion then runs over the Heaps-bounded distinct-piece table,
    * not the corpus, and the final pair aggregate is over ≤ |vocab| ×
    * piece-length rows. Top-k is deterministic: (count DESC, pair). */
  def bpePairCounts(df: DataFrame, textCol: String,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val pieces = df.select(
        explode(regexp_extract_all(lower(col(textCol)),
          lit("[a-z]+"), lit(0))).as("piece"))
      .groupBy(col("piece")).agg(count(lit(1)).as("n"))
      .filter(length(col("piece")) >= 2)
    pieces
      .select(explode(transform(
          sequence(lit(1), length(col("piece")) - 1),
          i => col("piece").substr(i, lit(2)))).as("pair"),
        col("n"))
      .groupBy(col("pair")).agg(sum(col("n")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(topK)
  }

  /** Winnowing base/shape constants shared by the driver-side reference
    * [[winnow]] and the codegen column [[winnowFingerprints]]. Base 131
    * over [a-z0-9] code points keeps the k=8 polynomial under 7.6e16 —
    * exact in an Int64 on BOTH engines with NO modulus, which is what
    * makes a rolling-hash fingerprint oracle-checkable at all. */
  val WinnowBase = 131L
  val WinnowK = 8
  val WinnowWindow = 4

  /** Winnowing fingerprint set (Schleimer et al. 2003 §4): normalize to
    * the [a-z0-9] character stream, hash every k-gram with a base-131
    * polynomial, keep the minimum of each w-wide hash window, dedupe.
    * Robust to local edits (an edit perturbs only the k+w−1 nearby
    * windows) where md5-of-document flips entirely. Driver-side
    * REFERENCE implementation — queries use [[winnowFingerprints]],
    * which computes the identical set per row in codegen; LlmSpec pins
    * the two equal. Shorter than k after normalization → empty set. */
  def winnow(text: String, k: Int = WinnowK,
      window: Int = WinnowWindow): Array[Long] = {
    val s = text.toLowerCase
      .filter(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z'))
    if (s.length < k) return Array.empty
    val grams = (0 to s.length - k).map { i =>
      var h = 0L
      var j = i; while (j < i + k) { h = h * WinnowBase + s.charAt(j); j += 1 }
      h
    }
    val starts = 0 to math.max(0, grams.length - window)
    starts.map(t => grams.slice(t, t + window).min).distinct.toArray
  }

  /** [[winnow]] as ONE projection (array of Long per row): the k-gram
    * polynomial via a `transform`+`aggregate` HOF chain, window minima
    * via `slice`+`array_min`, dedup via `array_distinct`. No UDF, no
    * row fan-out — the corpus-chars-sized work stays inside the scan's
    * projection; only the ~len/w distinct fingerprints ever explode
    * downstream (q227). For multi-megabyte documents chunk first
    * ([[graft.llm.Corpus.chunkLongDocuments]]) — per-row array size is
    * the standard HOF trade.
    *
    * The intermediates are BOUND as lambda variables (the one-element
    * `transform(array(x), …)` idiom), not inlined Column trees: a
    * Column is a tree, so a naive `val s = regexp_replace(…)` used at
    * every gram position re-evaluates the regex per character — O(n²k)
    * regex scans per document (measured: a single sf0.01 doc batch ran
    * minutes instead of milliseconds). Binding evaluates the
    * normalization once and the gram array once per row. Guards the
    * sequence-descends pitfall: < k normalized chars → empty array,
    * and the window-start count clamps at 1 so n_grams < w yields the
    * single all-gram min. */
  def winnowFingerprints(textCol: Column, k: Int = WinnowK,
      window: Int = WinnowWindow): Column = {
    require(k >= 2 && window >= 1, s"bad winnow shape k=$k w=$window")
    val norm = regexp_replace(lower(textCol), lit("[^a-z0-9]"), lit(""))
    element_at(transform(array(norm), s => {
      // char codes once per row (not k× per gram position via substr)
      val codeArr = transform(sequence(lit(1), length(s)),
        p => ascii(s.substr(p, lit(1))).cast("long"))
      val fps = element_at(transform(array(codeArr), cs => {
        val gramArr = transform(sequence(lit(1), size(cs) - k + 1),
          i => aggregate(sequence(lit(0), lit(k - 1)), lit(0L),
            (acc, j) => acc * WinnowBase + element_at(cs, i + j)))
        element_at(transform(array(gramArr), grams =>
          array_distinct(transform(
            sequence(lit(1), greatest(size(grams) - window + 1, lit(1))),
            t => array_min(slice(grams, t, lit(window)))))), 1)
      }), 1)
      when(length(s) >= k, fps).otherwise(array().cast("array<bigint>"))
    }), 1)
  }

  /** Adjacent token pairs as space-joined bigram strings — the shared
    * feature of [[bigramFamiliarity]] (conditional-LM scoring) and
    * [[graft.llm.Corpus.dsirSelect]] (hashed importance features).
    * Guarded like [[graft.llm.Corpus.kGrams]]: Spark's `sequence(1, 0)`
    * DESCENDS, so <2-element arrays must short-circuit to empty. */
  def adjacentBigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Bigram-LM familiarity scoring — the CCNet/KenLM perplexity-filter
    * stage (Wenzek et al. 2020 §4.3; the reference has no LM-quality
    * gate — north-star extension) made hash-exact: train a count LM on
    * the corpus itself, score each document by how "expected" its
    * bigrams are under that LM. For bigram (w1,w2) the conditional
    * probability is c(w1,w2)/c(w1·) with c(w1·) = Σ_w2 c(w1,w2) — the
    * proper denominator (occurrences of w1 AS A CONTEXT), derivable
    * from the bigram table itself — kept in integer basis points
    * `fam_bp = (10000·c12) DIV c1` (exact; ≤ 10000 since c12 ≤ c1).
    * Per document: `lm_sum = Σ occ·fam_bp`, `avg_bp = lm_sum DIV
    * n_bigrams`, plus the head/middle/tail bucket CCNet cuts on — by
    * FIXED thresholds, not corpus terciles: a global ntile would be a
    * single-partition sort of every doc row at 100 TB, while
    * thresholds are map-only (calibrating them from a sampled quantile
    * is a separate tiny job).
    *
    * Scale shape: same as [[tokenRarity]] — per-(doc, bigram) collapse
    * FIRST (partial aggregation eats within-doc repeats of "of the"
    * map-side), and that Heaps-bounded distinct frame is
    * localCheckpointed once and feeds BOTH the LM build and the score
    * join, whose build side is bigram-vocabulary-sized. Docs with <2
    * tokens surface with n_bigrams = 0, not dropped. */
  def bigramFamiliarity(df: DataFrame, idCol: String, textCol: String,
      headBp: Long = 2000L, tailBp: Long = 500L): DataFrame = {
    require(headBp >= tailBp, s"headBp $headBp must be >= tailBp $tailBp")
    // fanOutSmall: tokenize + bigram explode + the (doc, bigram) partial
    // aggregation is the whole corpus's token stream — measured 2.5 s in
    // ONE task at sf0.1 (round-15 profiling) when it rides a 1-split scan
    val docBg = graft.util.Par.fanOutSmall(df)
      .select(col(idCol).as("doc_id"),
        explode(adjacentBigrams(tokens(col(textCol)))).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("occ"))
      .localCheckpoint(false)
    val bg = docBg.groupBy(col("bigram")).agg(sum(col("occ")).as("c12"))
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
    val lm = bg
      .join(bg.groupBy(col("w1")).agg(sum(col("c12")).as("c1")), "w1")
      .select(col("bigram"), expr("(10000 * c12) DIV c1").as("fam_bp"))
    val perDoc = docBg.join(lm, "bigram")
      .groupBy(col("doc_id"))
      .agg(sum(col("occ")).as("n_bigrams"),
        sum(col("occ") * col("fam_bp")).as("lm_sum"))
    df.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("lm_sum", coalesce(col("lm_sum"), lit(0L)))
      .withColumn("avg_bp",
        when(col("n_bigrams") > 0, expr("lm_sum DIV n_bigrams"))
          .otherwise(lit(0L)))
      .withColumn("bucket",
        when(col("avg_bp") >= headBp, lit("head"))
          .when(col("avg_bp") >= tailBp, lit("middle"))
          .otherwise(lit("tail")))
  }

  /** Phrase mining by discounted pointwise association (the word2vec
    * phrase pass, Mikolov et al. 2013 §4: `(c12 − δ)·N / (c1·c2)`) —
    * the preprocessing step that finds collocations worth fusing into
    * single tokens before training. Kept integer-exact: the score is
    * `(1000·(c12 − δ)·N) DIV (c1·c2)` (PMI's log is monotone in this
    * ratio, so the RANKING is identical and no transcendental enters
    * the oracle). The discount δ kills rare-cooccurrence noise; pairs
    * with c12 ≤ δ are dropped outright. Numeric bound: needs
    * `1000·c12·N < 2^63`, i.e. corpora under ~3·10^9 tokens per
    * partition of analysis — shard the count tables beyond that.
    *
    * Scale shape: [[tokenRarity]]'s skeleton — everything flows from
    * vocabulary-sized count tables (unigram + Heaps-bounded bigram);
    * the only corpus-sized work is the two counting aggregates. */
  def phraseScores(df: DataFrame, textCol: String, discount: Long = 5L,
      topK: Int = 20): DataFrame = {
    require(discount >= 0, s"discount must be >= 0, got $discount")
    require(topK >= 1, s"topK must be positive, got $topK")
    // fanOutSmall once, both explodes ride it (unigram + bigram passes)
    val src = graft.util.Par.fanOutSmall(df)
    val tok = src.select(explode(tokens(col(textCol))).as("w"))
    val uni = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val n = uni.agg(sum(col("c"))).head.getLong(0)
    val bg = src
      .select(explode(adjacentBigrams(tokens(col(textCol)))).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") > discount)
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
    bg.join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .withColumn("score_fp",
        expr(s"(1000 * (c12 - $discount) * ${n}L) DIV (c1 * c2)"))
      .select(col("bigram"), col("c12"), col("c1"), col("c2"),
        col("score_fp"))
      .orderBy(col("score_fp").desc, col("bigram"))
      .limit(topK)
  }

  /** Greedy BPE merge APPLICATION (Sennrich et al. 2016 §3.2 — the
    * step after [[bpePairCounts]]'s ranking): run `rounds` merge
    * iterations over the corpus vocabulary and emit each distinct
    * word's final piece sequence. Per round: (1) adjacent-pair counts
    * over the CURRENT pieces weighted by word frequency; (2) the
    * argmax pair, tie-broken (count DESC, pair ASC); (3) left-to-right
    * non-overlapping replacement of that pair in every word. Step (3)
    * is pure string arithmetic any engine replays: double every piece
    * boundary (' '→'  '), pad, replace ' x  y '→' xy ' — doubled
    * boundaries mean adjacent occurrences never share a delimiter, so
    * ONE global leftmost pass IS the greedy merge — then collapse
    * doubles and trim.
    *
    * Scale shape: BPE training is inherently sequential in the number
    * of MERGES (every public implementation iterates), but each
    * iteration here is distributed over the VOCABULARY, not the
    * corpus: word frequencies aggregate once (the only corpus scan,
    * checkpointed), and each round is one vocabulary-sized aggregate
    * plus a 1-row argmax collect — bounded driver action by contract,
    * like the IVF centroid pulls. A pair-less vocabulary (all 1-char
    * words) passes through unchanged. */
  def bpeApply(df: DataFrame, textCol: String, rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"rounds must be in [1, 16], got $rounds")
    var vocab = df.select(
        explode(regexp_extract_all(lower(col(textCol)),
          lit("[a-z]+"), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .withColumn("pieces", trim(regexp_replace(col("word"), "(.)", "$1 ")))
      .localCheckpoint(false)
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val top = vocab
        .select(col("n"), split(col("pieces"), " ").as("pk"))
        .select(col("n"), explode(adjacentBigrams(col("pk"))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(1)
        .take(1)
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        // pieces are lowercase letter runs: the literals below are
        // regex-safe by construction (letters + spaces only)
        vocab = vocab.withColumn("pieces",
          trim(regexp_replace(
            regexp_replace(
              concat(lit(" "),
                regexp_replace(col("pieces"), " ", "  "), lit(" ")),
              " " + pair.replace(" ", "  ") + " ",
              " " + pair.replace(" ", "") + " "),
            "  ", " ")))
        r += 1
      }
    }
    vocab.withColumn("n_pieces",
      size(split(col("pieces"), " ")).cast("long"))
  }

  /** Tokenizer-fertility audit per source — the efficiency report that
    * decides whether a tokenizer fits a corpus: per source, the word
    * instances, letter mass, and BPE piece mass after [[bpeApply]]'s
    * merges, with pieces-per-word and letters-per-piece in integer bp.
    * High fertility (many pieces per word) on a source means the
    * vocabulary under-serves it — the standard multilingual-tokenizer
    * health check (a language tokenized at 2× the pieces of another
    * pays 2× the sequence length for the same text).
    *
    * Scale shape: the corpus side collapses to DISTINCT (source, word)
    * counts before anything joins — the vocabulary table (word →
    * n_pieces) is vocabulary-bounded and BROADCAST, so fertility costs
    * one aggregation plus a map-side join however big the corpus is. */
  def fertilityBySource(df: DataFrame, srcCol: String, textCol: String,
      rounds: Int = 3): DataFrame = {
    val vocab = bpeApply(df, textCol, rounds)
      .select(col("word"), col("n_pieces"))
    val sw = df.select(col(srcCol).as("source"),
        explode(regexp_extract_all(lower(col(textCol)),
          lit("[a-z]+"), lit(0))).as("word"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("occ"))
    sw.join(broadcast(vocab), "word")
      .groupBy(col("source"))
      .agg(sum(col("occ")).as("n_words"),
        sum(col("occ") * length(col("word"))).as("n_letters"),
        sum(col("occ") * col("n_pieces")).as("n_pieces"),
        expr("10000 * sum(occ * n_pieces) DIV sum(occ)")
          .as("pieces_per_word_bp"),
        expr("10000 * sum(occ * length(word)) DIV sum(occ * n_pieces)")
          .as("letters_per_piece_bp"))
  }
}
