package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

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

  /** Winnowing fingerprint set (Schleimer et al. 2003): k-gram rolling
    * hashes, minimum per sliding window — robust to local edits. */
  def winnow(text: String, k: Int = 5, window: Int = 4): Array[Int] = {
    val s = text.toLowerCase.replaceAll(WsClass, " ")
    if (s.length < k) return Array(MurmurHash3.stringHash(s, 0x1b873593))
    val grams = (0 to s.length - k)
      .map(i => MurmurHash3.stringHash(s.substring(i, i + k), 0x1b873593))
    if (grams.length <= window) Array(grams.min)
    else grams.sliding(window).map(_.min).toArray.distinct
  }

  def withWinnowFingerprint(df: DataFrame, textCol: String): DataFrame = {
    val f = udf((t: String) => winnow(t))
    df.withColumn("winnow_fp", f(col(textCol)))
  }
}
