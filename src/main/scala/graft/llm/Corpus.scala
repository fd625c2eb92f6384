package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition operators for training-data pipelines (north-star
  * extension, SURVEY.md §2.J note): after cleaning and dedup, a pretraining
  * pipeline still has to decide HOW MUCH of each source to take (domain
  * mixing) and how documents become fixed-budget training sequences
  * (concat-and-chunk packing). Both are deterministic arithmetic here —
  * reproducible across engines, so both are DuckDB-oracle-checkable.
  *
  * Scale design: mixing is a pure row filter (no shuffle, no join — the
  * sampling decision is arithmetic on the id, so it pushes into the scan
  * and survives any partitioning); packing windows per shard key, so the
  * cumulative sums parallelize across shards instead of funneling 100 TB
  * through one global sort.
  */
object Corpus {

  /** Modulus applied to the id BEFORE the multiplicative hash so the
    * product stays far from Long overflow for any id. */
  val MixModulus = 1000000007L

  /** Knuth's multiplicative hash constant (TAOCP vol. 3 — public). */
  val MixMultiplier = 2654435761L

  /** Deterministic per-row sampling key in [0, 100): the id's
    * multiplicative hash mod 100. Pure arithmetic (no RNG state, no
    * engine-specific hash), so the exact same rows are kept on every
    * run and in every engine — the property a reproducible training
    * corpus needs.
    *
    * Parity contract: ids must be NON-NEGATIVE. Spark's `pmod` always
    * returns a non-negative remainder while ANSI `%` (DuckDB, the q92
    * oracle) follows the sign of the dividend — for a negative id the
    * two engines would select different rows. All fixture/document ids
    * are non-negative by construction; callers feeding synthetic ids
    * must keep them ≥ 0. */
  def sampleKey(id: Column): Column =
    pmod(pmod(id, lit(MixModulus)) * lit(MixMultiplier), lit(100L))

  /** Weighted corpus mixing: keep each row iff its sampling key falls
    * under `weightPct` (a per-row Column in [0, 100], typically a CASE
    * over the source/domain). Approximates "take weightPct% of each
    * domain" with zero shuffles: the filter is scan-local arithmetic. */
  def mixBySource(df: DataFrame, idCol: String,
      weightPct: Column): DataFrame =
    df.filter(sampleKey(col(idCol)) < weightPct)

  /** All word k-grams of a text column in order (with repeats) — native
    * builtins only (sequence → slice → array_join), so the whole
    * expression stays inside codegen; no UDF. Texts with fewer than k
    * tokens produce no k-grams. (Spark's `sequence(1, n)` counts DOWN
    * when n < 1, so the short-text case must be guarded, not clamped.)
    * `tok` selects the tokenizer: the single-space default is the
    * historical oracle contract; pass [[TextOps.regexTokens]] for
    * unicode-whitespace corpora (q107). */
  def kGrams(textCol: Column, k: Int,
      tok: Column => Column = TextOps.tokens): Column = {
    val toks = tok(textCol)
    val n = size(toks)
    when(n >= k,
      transform(sequence(lit(1), n - (k - 1)),
        i => array_join(slice(toks, i, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word k-gram shingles ([[kGrams]] deduplicated). */
  def shingles(textCol: Column, k: Int,
      tok: Column => Column = TextOps.tokens): Column =
    array_distinct(kGrams(textCol, k, tok))

  /** Eval-set decontamination: flag every train document sharing at
    * least one word k-gram with the eval corpus (the standard
    * pretraining hygiene step — k=8 is the common choice). Returns
    * `(doc_id, n_shared, first_eval_doc)` for contaminated docs only.
    *
    * Scale shape: the EVAL side is broadcast — eval benchmarks are tiny
    * next to a 100 TB corpus, so the train side streams through a
    * broadcast hash join with no shuffle at all; the only aggregation
    * is over the (small) hit set. Do not feed a second full corpus as
    * `evalDf` — that calls for the jaccard/minhash pair machinery
    * instead. */
  def decontaminate(trainDf: DataFrame, evalDf: DataFrame, idCol: String,
      textCol: String, k: Int = 8,
      tok: Column => Column = TextOps.tokens): DataFrame =
    decontaminateBy(trainDf, evalDf, idCol, textCol,
      shingles(_, k, tok))

  /** [[decontaminate]] with the shingle derivation injected — the seam
    * that lets a caller swap the builtin HOF chain for a scalar pass
    * (q107's regex path: one JIT-compiled
    * [[TextOps.regexShingleSet]] UDF per row instead of interpreted
    * per-element lambda eval — the q106 measured rule). `shingler`
    * maps the text column to its array of distinct k-gram shingles;
    * join/broadcast/aggregation semantics are identical whichever
    * derivation feeds them. */
  def decontaminateBy(trainDf: DataFrame, evalDf: DataFrame,
      idCol: String, textCol: String,
      shingler: Column => Column): DataFrame = {
    // fanOutSmall on both sides: the k-gram shingle explode is the whole
    // corpus's token stream (see graft.util.Par — guide §2.5)
    val tSh = graft.util.Par.fanOutSmall(trainDf)
      .select(col(idCol).as("doc_id"),
        explode(shingler(col(textCol))).as("shingle"))
    // collapse the eval side to one row per DISTINCT shingle before the
    // broadcast (keeping the min doc as the representative): duplicate
    // eval docs then cost nothing, the broadcast is bounded by distinct
    // eval content, and each train shingle matches at most one row —
    // the result is identical because n_shared counts train-side
    // distinct shingles and min(eval_doc) = min of per-shingle mins
    val eSh = graft.util.Par.fanOutSmall(evalDf)
      .select(col(idCol).as("eval_doc"),
        explode(shingler(col(textCol))).as("shingle"))
      .groupBy(col("shingle"))
      .agg(min(col("eval_doc")).as("eval_doc"))
    tSh.join(broadcast(eSh), "shingle")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("n_shared"),
        min(col("eval_doc")).as("first_eval_doc"))
  }

  /** Scored contamination — [[decontaminate]] grades presence/absence;
    * this grades SEVERITY, which is what eval-integrity reports
    * actually publish (the GPT-3/PaLM appendix convention: percentage
    * n-gram overlap with the benchmark, bucketed). Per TRAIN doc:
    * distinct-shingle count, shared-with-eval count, overlap in BASIS
    * POINTS (`(10000·n_shared) DIV n_shingles` — integer floor
    * division, hash-exact; a float percentage would wobble), and a
    * severity bucket (`clean` / `partial` / `heavy` at ≥ 50 %). Docs
    * with zero shared shingles ARE emitted (a contamination report
    * that silently drops the clean rows can't say "N % of the corpus
    * is clean").
    *
    * Scale shape: [[decontaminate]]'s broadcast argument — eval
    * shingles collapse to one distinct row each before the broadcast;
    * the train side streams through the hash join scan-locally; the
    * per-doc shingle array (and its size) is computed in the same
    * scan. Per-doc shingles are already distinct ([[shingles]]), so
    * the hit count is a plain `count`, not `countDistinct`. */
  def contaminationScore(trainDf: DataFrame, evalDf: DataFrame,
      idCol: String, textCol: String, k: Int = 8,
      tok: Column => Column = TextOps.tokens): DataFrame = {
    val t = trainDf.select(col(idCol).as("doc_id"),
        shingles(col(textCol), k, tok).as("__sh"))
      .withColumn("n_shingles", size(col("__sh")).cast("long"))
    val eSh = evalDf.select(
      explode(shingles(col(textCol), k, tok)).as("shingle")).distinct()
    val hits = t.select(col("doc_id"), explode(col("__sh")).as("shingle"))
      .join(broadcast(eSh), "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
    t.select(col("doc_id"), col("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("overlap_bp",
        when(col("n_shingles") > 0,
          expr("(10000 * n_shared) DIV n_shingles")).otherwise(lit(0L)))
      .withColumn("severity",
        when(col("n_shared") === 0, lit("clean"))
          .when(col("overlap_bp") >= 5000, lit("heavy"))
          .otherwise(lit("partial")))
  }

  /** Intra-document repetition stats — the Gopher/C4 family of cleaning
    * signals the composite quality score doesn't cover: how much of a
    * document is the same n-gram repeated. Emits per doc
    * `(n_2grams, distinct_2grams, top_2gram_count)` as INTEGERS (ratios
    * are one division away for the caller; integer outputs keep the
    * operator hash-exact across engines). `n_2grams − distinct_2grams`
    * is the duplicate mass; `top_2gram_count / n_2grams` is the
    * most-repeated-gram fraction.
    *
    * Scale shape: counts per distinct gram come from one explode +
    * two-level aggregation keyed by (doc, gram) — partial aggregation
    * collapses repeats map-side, and nothing is ever collected. */
  def repetitionStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val grams = df.select(col(idCol).as("doc_id"),
      explode(kGrams(col(textCol), 2)).as("gram"))
    grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_2grams"),
        count(lit(1)).as("distinct_2grams"),
        max(col("cnt")).as("top_2gram_count"))
  }

  /** Long-document chunking — the missing half of [[packSequences]]: a
    * real pretraining pipeline first SPLITS documents longer than the
    * sequence budget into consecutive `budget`-token chunks, then packs
    * the pieces. One row per chunk with its 0-based `chunk_id`, its
    * token count (= budget except the tail) and the chunk text. Pure
    * builtins (`sequence` → `transform` → `slice` → `posexplode`), so
    * the whole fan-out stays in codegen and pushes no shuffle — at
    * 100 TB this is a map-only pass like [[mixBySource]]. A text with
    * fewer tokens than the budget yields exactly one chunk (itself);
    * the whitespace-token convention matches [[kGrams]]/q93. Every
    * column except `textCol` is carried through to the chunk rows (a
    * pipeline needs the shard/label columns downstream — q105 packs by
    * `source`); input columns must not collide with the outputs
    * (`chunk_id`/`chunk_tokens`/`chunk_text`) nor with posexplode's
    * intermediates (`pos`/`col`) — enforced loudly rather than left to
    * a confusing ambiguous-reference AnalysisException. */
  def chunkLongDocuments(df: DataFrame, idCol: String, textCol: String,
      budget: Int, tok: Column => Column = TextOps.tokens): DataFrame = {
    require(budget > 0, s"chunk budget must be positive, got $budget")
    val reserved = Set("pos", "col", "chunk_id", "chunk_tokens",
      "chunk_text")
    val clash = df.columns.filter(c => c != textCol && reserved(c))
    require(clash.isEmpty,
      s"chunkLongDocuments: input column(s) ${clash.mkString(", ")} " +
        "collide with the chunk outputs/intermediates " +
        s"(${reserved.mkString(", ")}) — rename before chunking")
    val toks = tok(col(textCol))
    val n = size(toks)
    // integer ceil(n/budget) via exact double division (n ≤ 2^31, so the
    // quotient is exact well past any real document length)
    val nchunks = ((n + lit(budget - 1)) / lit(budget)).cast("int")
    val carried = df.columns.filterNot(_ == textCol).map(col).toSeq
    // a FILTERING tokenizer (regexTokens) can yield zero tokens, where
    // sequence(0, -1) would count DOWN — guard to zero chunks (the
    // single-space default always has ≥1 token, so q104's one-chunk
    // floor for short texts is unchanged)
    val chunkIdx = when(n === 0,
        array().cast("array<int>"))
      .otherwise(sequence(lit(0), nchunks - 1))
    df.select(carried :+ posexplode(
        transform(chunkIdx, i => struct(
          least(n - i * budget, lit(budget)).as("chunk_tokens"),
          array_join(slice(toks, i * budget + 1, lit(budget)), " ")
            .as("chunk_text")))): _*)
      .select(carried ++ Seq(col("pos").as("chunk_id"),
        col("col.chunk_tokens").as("chunk_tokens"),
        col("col.chunk_text").as("chunk_text")): _*)
  }

  /** Sliding-window chunking with OVERLAP — the RAG indexing shape
    * [[chunkLongDocuments]]'s disjoint cuts are wrong for: a retrieval
    * chunk boundary that splits an answer span loses it from every
    * chunk, so embedding pipelines cut windows of `budget` tokens every
    * `stride` tokens (stride < budget ⇒ consecutive chunks share
    * `budget − stride` tokens; stride = budget degenerates to the
    * disjoint chunker). Chunk i covers tokens `[i·stride + 1,
    * i·stride + budget]` clipped to the document; the chunk count
    * `1 + ceil(max(n − budget, 0)/stride)` guarantees full coverage
    * with no chunk starting past the end. Emits (chunk_id,
    * start_token, chunk_tokens, chunk_text). Same zero-token guard and
    * map-only scale shape as [[chunkLongDocuments]] — one projection,
    * fan-out ≈ n/stride per doc, no shuffle. */
  def chunkWithOverlap(df: DataFrame, idCol: String, textCol: String,
      budget: Int, stride: Int,
      tok: Column => Column = TextOps.tokens): DataFrame = {
    require(budget > 0, s"chunk budget must be positive, got $budget")
    require(stride > 0 && stride <= budget,
      s"stride must be in [1, budget], got $stride (budget $budget)")
    val toks = tok(col(textCol))
    val n = size(toks)
    // ceil((n - budget)/stride) on small ints via an exact double floor
    val extra = greatest(n - budget, lit(0))
    val nchunks = (lit(1) + floor((extra.cast("double")
      + lit(stride - 1)) / lit(stride))).cast("int")
    val chunkIdx = when(n === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), nchunks - 1))
    df.select(col(idCol).as("doc_id"), posexplode(
        transform(chunkIdx, i => struct(
          least(n - i * stride, lit(budget)).as("chunk_tokens"),
          array_join(slice(toks, i * stride + 1,
            least(n - i * stride, lit(budget))), " ").as("chunk_text")))))
      .select(col("doc_id"), col("pos").as("chunk_id"),
        (col("pos") * stride + 1).as("start_token"),
        col("col.chunk_tokens").as("chunk_tokens"),
        col("col.chunk_text").as("chunk_text"))
  }

  /** Concat-and-chunk sequence packing: conceptually concatenate the
    * shard's documents in id order and cut every `budget` tokens; a
    * document's pack is where its first token lands —
    * `floor(prefix_tokens / budget)` with `prefix_tokens` the exclusive
    * running sum. Adds `prefix_tokens` and `pack_id`. Packing is
    * per-`shardCol` so the window parallelizes (one cumulative sum per
    * shard, not a global sort).
    *
    * Reproducibility precondition: `idCol` must be UNIQUE within each
    * shard. The rowsBetween running sum orders only by `idCol`; tied
    * ids within a shard could swap `prefix_tokens` (and so `pack_id`)
    * across runs. Document ids satisfy this by construction; callers
    * packing by a non-unique key must add their own tiebreaker to the
    * id before calling. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      shardCol: String, budget: Long): DataFrame =
    packSequencesBy(df, idCol, tokenCol, Seq(shardCol), budget)

  /** [[packSequences]] with a COMPOSITE shard key. Keep the shard
    * columns separate rather than concatenating them into one string:
    * Catalyst can satisfy a downstream `groupBy(shardCols :+ pack)`
    * from the window's `hashpartitioning(shardCols)` (partitioning on a
    * subset of the grouping keys co-locates the groups), but it cannot
    * see through `concat_ws` — a fused key costs the aggregation a
    * second full-corpus exchange (measured: q121 at 11 exchanges vs
    * q97's 10 before this overload existed). */
  def packSequencesBy(df: DataFrame, idCol: String, tokenCol: String,
      shardCols: Seq[String], budget: Long): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    require(shardCols.nonEmpty, "packSequencesBy: at least one shard column")
    val w = Window.partitionBy(shardCols.map(col): _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("prefix_tokens",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      // integer DIV, not float division: exact for any 64-bit token sum
      .withColumn("pack_id", expr(s"prefix_tokens DIV $budget"))
  }

  /** Leakage-safe train/val/test split: the split decision is keyed on
    * the near-dup COMPONENT label (`keeperCol`, e.g. q57's `keep_id`),
    * not the document id — so a whole equivalence class of near-duplicate
    * documents lands in ONE split. Splitting by raw doc id silently
    * leaks: a held-out eval document whose near-duplicate sits in train
    * is memorized, not generalized to (the same hygiene argument as
    * [[decontaminate]], applied to the corpus's own internal dups).
    *
    * The assignment is [[sampleKey]] arithmetic on the keeper id —
    * deterministic, engine-reproducible (the q92 parity contract: keeper
    * ids must be non-negative) and map-only: once component labels
    * exist, the split adds ZERO shuffles and survives any partitioning,
    * so at 100 TB it rides the dedup pass it already needs. Percentiles
    * are of the HASH RANGE, not exact row fractions — per-split sizes
    * concentrate tightly around trainPct/valPct by the usual
    * multiplicative-hash uniformity, and the tradeoff buys stability:
    * adding or removing documents never reassigns an unrelated
    * component's split (no global count to perturb). */
  def leakageSafeSplit(df: DataFrame, keeperCol: String,
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"split percents must satisfy 0 < trainPct, 0 <= valPct, " +
        s"trainPct + valPct <= 100; got train=$trainPct val=$valPct")
    require(!df.columns.contains("split"),
      "leakageSafeSplit: input already has a 'split' column — rename it " +
        "before splitting")
    val key = sampleKey(col(keeperCol))
    df.withColumn("split",
      when(key < lit(trainPct), lit("train"))
        .when(key < lit(trainPct + valPct), lit("val"))
        .otherwise(lit("test")))
  }

  /** Temperature-based source mixing — the multilingual/domain
    * re-balancing step of a pretraining pipeline: sample source s at a
    * rate ∝ its TEMPERED share `sqrt(n_s) / Σ sqrt(n_t)` (temperature
    * T=2, the α=0.5 point of the standard `p_s^(1/T)` family), scaled to
    * a `targetDocs` total. Flattening the distribution up-weights
    * low-resource sources relative to proportional sampling — the reason
    * multilingual corpora don't drown in their biggest language. Rates
    * cap at 100%: this operator FILTERS (sub-samples); duplication-based
    * up-sampling beyond 1× is a separate explode the caller applies to
    * the capped sources if wanted.
    *
    * Engine-reproducible by construction, like [[sampleKey]]: sqrt is
    * IEEE-correctly-rounded in every engine, the per-source weight is
    * immediately floored to an integer (×1e6) so the cross-source SUM is
    * integer arithmetic (order-independent — a double Σ sqrt would hash
    * differently under reordered partial aggregation), and the rate is
    * one fixed left-associated chain of IEEE DOUBLE ops (an oracle must
    * write its literals as doubles — `100e0`, not `100.0`, which DuckDB
    * parses as DECIMAL and computes exactly where Spark rounds). The row
    * decision compares a FINE sampling key (the [[sampleKey]] hash mod
    * 1e6, not mod 100) against `rate_s × 1e4`, so fractional keep-rates
    * resolve to ~1e-4 % instead of quantizing to whole percents — a
    * tempered rate of 0.3 % must keep ~0.3 %, not ceil it to 1 %.
    * NULL sources form their OWN group (null-safe join), not silently
    * dropped rows.
    *
    * Scale shape: the weight table is one tiny per-source aggregate
    * (map-side combined), re-attached by a broadcast join; the keep
    * decision is scan-local arithmetic. No corpus-wide shuffle at any
    * point. The global normalization (`Σ w`) runs as an empty-partition
    * window over the weight table — one task over one row per source,
    * the irreducible cost of any global normalization; if source
    * cardinality ever approached row counts, the broadcast (not this
    * window) would be the first thing to fall over. */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
      targetDocs: Long): DataFrame = {
    require(targetDocs > 0, s"targetDocs must be positive, got $targetDocs")
    checkMixClash(df, "temperatureMix", Set("n_docs", "rate_pct", "__mix_src"))
    // null-safe join: a NULL source is a legitimate group in `counts`
    // and must sample at its own rate, not vanish through an inner
    // equi-join that never matches NULL = NULL
    df.join(broadcast(temperedRates(df, sourceCol, targetDocs, 100.0)),
        col(sourceCol) <=> col("__mix_src"))
      .drop("__mix_src")
      .filter(fineSampleKey(col(idCol)) < col("rate_pct") * lit(10000.0))
  }

  /** Temperature mixing WITH up-sampling — the T<1 regime
    * [[temperatureMix]]'s 100 % cap silently degrades out of: when the
    * tempered rate for a low-resource source exceeds 100 %, the source
    * is REPEATED — `floor(rate/100)` full copies of every row (epochs)
    * plus one extra copy for the rows the fractional tail selects under
    * the exact [[sampleKey]] rule [[temperatureMix]] already uses.
    * Rates cap at `maxEpochs × 100 %` (the standard few-epoch bound:
    * repeating a tiny source dozens of times memorizes it, so the cap
    * is a named knob, not an accident of arithmetic). Output = input
    * columns + `n_docs`, `rate_pct`, `epoch` (0-based copy index) —
    * (id, epoch) is the output key; downstream packing/sharding must
    * key on both (or a derived unique id), since ids now repeat.
    *
    * Engine-reproducible exactly as [[temperatureMix]]: same integer
    * weight sum, same fixed left-associated IEEE DOUBLE rate chain with
    * the cap as `least(maxEpochs·100e0, …)`, and the split into
    * `full = floor(rate/100e0)` copies + fractional tail
    * `rate − full·100e0` is more fixed IEEE arithmetic — an oracle
    * replays row multiplicities bit-for-bit (`unnest(range(0, n))` ↔
    * `explode(sequence(0, n−1))`).
    *
    * Scale shape: [[temperatureMix]]'s broadcast-rates + scan-local
    * arithmetic, plus a scan-local `explode` whose fan-out is bounded
    * by `maxEpochs` — no shuffle is added; the repeats materialize in
    * whatever sink follows, which is the point (a training corpus is
    * written once with the repeats in place). */
  def temperatureMixEpochs(df: DataFrame, idCol: String,
      sourceCol: String, targetDocs: Long, maxEpochs: Int): DataFrame = {
    require(targetDocs > 0, s"targetDocs must be positive, got $targetDocs")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    checkMixClash(df, "temperatureMixEpochs",
      Set("n_docs", "rate_pct", "__mix_src", "n_copies", "epoch"))
    val joined = df.join(
        broadcast(temperedRates(df, sourceCol, targetDocs,
          100.0 * maxEpochs)),
        col(sourceCol) <=> col("__mix_src"))
      .drop("__mix_src")
    // full epochs are guaranteed copies; the fractional remainder keeps
    // one MORE copy for exactly the rows the plain-mix hash rule keeps
    // at that fractional rate (so maxEpochs=1 reproduces temperatureMix
    // row-for-row, epoch ≡ 0)
    val full = floor(col("rate_pct") / lit(100.0)).cast("long")
    val frac = col("rate_pct") - full.cast("double") * lit(100.0)
    val copies = full +
      when(fineSampleKey(col(idCol)) < frac * lit(10000.0), lit(1L))
        .otherwise(lit(0L))
    joined.withColumn("n_copies", copies)
      .filter(col("n_copies") > 0) // sequence(0,-1) would count DOWN
      .withColumn("epoch", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("n_copies")
  }

  /** Token-budget training plan — the PLANNING step the doc-count
    * mixers ([[temperatureMix]]/[[temperatureMixEpochs]]) leave to the
    * user: a training run is specified in TOKENS ("600B tokens at
    * T=2"), not documents, so the allocation must weight sources by
    * tempered token mass and the answer a user needs is "how many
    * epochs of each source". Per source: token total (one map-side-
    * combined aggregate over per-doc token counts), tempered weight
    * `floor(sqrt(n_tokens)·1e6 + 0.5)` (the [[temperedRates]] integer-
    * weight convention), target tokens `floor(budget·w/Σw + 0.5)`
    * capped at `maxEpochs·n_tokens` (the few-epoch memorization bound,
    * [[temperatureMixEpochs]]'s knob), then the exact integer split
    * `epochs_full = target DIV n_tokens`, `frac_tokens = target MOD
    * n_tokens` — the numbers [[temperatureMixEpochs]]-style apply
    * stages consume. One double chain (the q119 fixed left-associated
    * IEEE rule) between exact-integer ends, so the whole plan
    * hash-replays.
    *
    * Scale shape: per-doc token counts are scan-local; the plan table
    * is one row per source (broadcast-sized by construction); the
    * global Σw is an empty-partition window over that tiny table —
    * [[temperedRates]]'s argument verbatim. */
  def tokenBudgetPlan(df: DataFrame, textCol: String, sourceCol: String,
      budgetTokens: Long, maxEpochs: Int,
      tok: Column => Column = TextOps.tokens): DataFrame = {
    require(budgetTokens > 0,
      s"budgetTokens must be positive, got $budgetTokens")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    df.select(col(sourceCol).as("source"),
        size(tok(col(textCol))).cast("long").as("__tk"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tk")).as("n_tokens"))
      .withColumn("w",
        floor(sqrt(col("n_tokens").cast("double")) * lit(1000000.0)
          + lit(0.5)).cast("long"))
      .withColumn("wsum", sum(col("w")).over(Window.partitionBy()))
      .withColumn("target_tokens",
        least(col("n_tokens") * maxEpochs,
          floor(lit(budgetTokens.toDouble) * col("w") / col("wsum")
            + lit(0.5)).cast("long")))
      .withColumn("epochs_full",
        expr("target_tokens DIV n_tokens")) // exact long division (no
      // double round-trip — budgets are token counts beyond 2^53-safe)
      .withColumn("frac_tokens", col("target_tokens") % col("n_tokens"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("w"),
        col("target_tokens"), col("epochs_full"), col("frac_tokens"))
  }

  /** [[sampleKey]] at mod-1e6 resolution (the fractional-rate variant
    * both temperature mixers compare against `rate × 1e4`). */
  private def fineSampleKey(id: Column): Column =
    pmod(pmod(id, lit(MixModulus)) * lit(MixMultiplier), lit(1000000L))

  private def checkMixClash(df: DataFrame, op: String,
      reserved: Set[String]): Unit = {
    val clash = df.columns.filter(reserved)
    require(clash.isEmpty,
      s"$op: input column(s) ${clash.mkString(", ")} collide with the " +
        "attached rate columns (" + reserved.mkString(", ") + ") — " +
        "rename first")
  }

  /** Per-source tempered keep-rates `(__mix_src, n_docs, rate_pct)` —
    * the shared weight table of [[temperatureMix]] (cap 100) and
    * [[temperatureMixEpochs]] (cap maxEpochs·100). */
  private def temperedRates(df: DataFrame, sourceCol: String,
      targetDocs: Long, capPct: Double): DataFrame = {
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w",
        floor(sqrt(col("n_docs").cast("double")) * lit(1000000.0) + lit(0.5))
          .cast("long"))
    counts
      .withColumn("wsum", sum(col("w")).over(Window.partitionBy()))
      .withColumn("rate_pct",
        least(lit(capPct),
          lit(100.0) * lit(targetDocs) * col("w") / col("wsum") /
            col("n_docs")))
      .select(col(sourceCol).as("__mix_src"), col("n_docs"),
        col("rate_pct"))
  }

  /** The 60-bit md5 digest key both deterministic-order operators hash
    * with: `half = 0` takes hex chars 1-15 of md5(id-as-string), `half
    * = 1` the next 15 — each an exact 60-bit integer, reproduced in
    * DuckDB as `CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1|16,
    * 15)) AS BIGINT)`. ONE definition so the Spark side and every
    * oracle twin stay bit-identical ([[shardForTraining]],
    * [[stratifiedSample]]; Dedup's shingle/token hashing has its own
    * older copies tied to their oracles). */
  def digestKey60(id: Column, half: Int): Column = {
    require(half == 0 || half == 1, s"half must be 0 or 1, got $half")
    conv(substring(md5(id.cast("string")), 1 + 15 * half, 15), 16, 10)
      .cast("long")
  }

  /** Deterministic stratified sampling: exactly `min(k, |group|)` rows
    * per group, chosen by md5-hash order of the id (the
    * [[shardForTraining]] idiom) — the fixed-size per-domain carve-out
    * an eval set needs. Hash order, not id order: low ids are usually
    * the OLDEST documents, and an eval set of the corpus's oldest rows
    * is not a sample of it. Engine-reproducible and stable: a document's
    * rank moves only when another document ENTERS its own group's top-k
    * margin, never because an unrelated group grew. Adds `sample_rank`
    * (1-based).
    *
    * Scale shape: one shuffle (the per-group window); output is
    * k-bounded per group. For k ≪ group size on very large groups, the
    * sort is the cost — a TopK partial aggregation
    * ([[graft.functions.TopKAgg]]) is the serving-path alternative; the
    * window form is the oracle-exact reference. */
  def stratifiedSample(df: DataFrame, idCol: String, groupCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    require(!df.columns.contains("sample_rank"),
      "stratifiedSample: input already has a 'sample_rank' column — " +
        "rename it before sampling")
    val hk = digestKey60(col(idCol), 0)
    // NULLS LAST explicitly: a NULL id hashes to a NULL key, and Spark
    // defaults NULLs FIRST where DuckDB (and SQL oracles generally)
    // default them LAST — without this a NULL id would be sampled by
    // one engine and not the other
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hk.asc_nulls_last, col(idCol).asc_nulls_last)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Deterministic training-shard assignment + within-shard order — the
    * "global shuffle" a training run needs, realized the only way that
    * scales: as `nShards` INDEPENDENT pseudo-random permutations.
    * `shard` is the first 60 bits of md5(id) mod nShards; the order
    * within a shard is the NEXT 60 md5 bits (`order_key`), tie-broken by
    * the id itself, positions materialized by one row_number window per
    * shard. Both halves of the digest are engine-reproducible (the
    * q52/q53 md5 idiom), so the full permutation is hash-checkable in
    * DuckDB — and re-runnable bit-identically for training restarts.
    *
    * Scale shape: ONE shuffle total (the per-shard window), parallel
    * across shards — exactly the plan that writes a shuffled 100 TB
    * corpus to nShards partitioned files; no global sort ever exists.
    * Choose nShards ≥ cluster cores so no shard's window serializes the
    * write. Ids must be unique (positions are a permutation of each
    * shard iff the (order_key, id) sort key is unique; duplicate ids
    * would also collide downstream — [[packSequences]]'s contract). */
  def shardForTraining(df: DataFrame, idCol: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val shardClash =
      df.columns.filter(Set("shard", "order_key", "pos_in_shard"))
    require(shardClash.isEmpty,
      s"shardForTraining: input column(s) ${shardClash.mkString(", ")} " +
        "collide with the outputs (shard, order_key, pos_in_shard) — " +
        "rename before sharding")
    val shard = pmod(digestKey60(col(idCol), 0), lit(nShards.toLong))
    val orderKey = digestKey60(col(idCol), 1)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("order_key"), col(idCol))
    df.withColumn("shard", shard)
      .withColumn("order_key", orderKey)
      .withColumn("pos_in_shard", row_number().over(w) - 1)
  }

  /** Multi-epoch deterministic reshuffle — [[shardForTraining]] with the
    * epoch folded into the digest: training loops want a DIFFERENT
    * global order every epoch (re-reading one fixed order correlates
    * gradient noise across epochs) but still a REPRODUCIBLE one (resume
    * from a step counter, re-run a divergence). Hashing `"epoch:id"`
    * instead of `id` gives an independent permutation per epoch from
    * pure arithmetic — no RNG state to checkpoint, no shuffle-buffer
    * approximation, and any (epoch, shard) slice regenerates alone,
    * which is exactly what a resuming trainer asks for.
    *
    * Emits one row per (epoch, input row): `epoch`, `shard`,
    * `order_key`, `pos_in_shard`. The epoch fan-out is a map-side
    * `explode(sequence(...))` (epochs is small); the only shuffle is
    * the per-(epoch, shard) position window, same count as running
    * [[shardForTraining]] once per epoch but in one job. The `":"`
    * separator keeps the key space prefix-free (epoch 1 of id 23 can
    * never collide with epoch 12 of id 3). */
  def epochShuffle(df: DataFrame, idCol: String, nShards: Int,
      epochs: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(epochs > 0, s"epochs must be positive, got $epochs")
    val clash =
      df.columns.filter(Set("epoch", "shard", "order_key", "pos_in_shard"))
    require(clash.isEmpty,
      s"epochShuffle: input column(s) ${clash.mkString(", ")} collide " +
        "with the outputs (epoch, shard, order_key, pos_in_shard) — " +
        "rename before shuffling")
    val key = concat(col("epoch").cast("string"), lit(":"),
      col(idCol).cast("string"))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("order_key"), col(idCol))
    df.withColumn("epoch",
        explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn("shard", pmod(digestKey60(key, 0), lit(nShards.toLong)))
      .withColumn("order_key", digestKey60(key, 1))
      .withColumn("pos_in_shard", row_number().over(w) - 1)
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4), made
    * DETERMINISTIC and non-overlapping by construction: the token
    * stream is cut into fixed `block`-token blocks and each block masks
    * ONE span whose start offset and length (1..maxSpan) come from the
    * md5 digest of `"id:block"` — so spans can never overlap (each is
    * confined to its block: start ≤ block−maxSpan, the classic
    * sequential greedy resolution designed out), corruption density is
    * a fixed knob (mean (maxSpan+1)/2 per block tokens), and the same
    * document always corrupts identically in any engine — the
    * reproducibility a training pipeline needs and an RNG-driven
    * sampler cannot give. Emits per document: `n_tokens`, `n_spans`,
    * `n_masked`, `input_text` (spans replaced by `<extra_id_k>`
    * sentinels, k = block index) and `target_text` (each sentinel
    * followed by the tokens it hides — the seq2seq target).
    *
    * A span landing past the document's end is dropped (short final
    * block) or clipped (start inside, length beyond), mirroring what a
    * block-local sampler does at sequence boundaries.
    *
    * Scale shape: span derivation is a map-side explode bounded by
    * n/block per doc; reassembly is per-document HOF arithmetic over
    * the (few) spans — no join, no shuffle beyond the per-doc span
    * aggregation. The lambda chain is interpreted (not codegen), which
    * is fine for a preprocessing pass; the scalar-pass seam
    * ([[TextOps.regexShingleSet]]'s precedent) is the documented
    * fallback if this ever lands on a hot path. */
  def spanCorruption(df: DataFrame, idCol: String, textCol: String,
      block: Int = 20, maxSpan: Int = 3): DataFrame = {
    require(block > 0, s"block must be positive, got $block")
    require(maxSpan >= 1 && maxSpan < block,
      s"maxSpan must be in [1, block), got $maxSpan (block $block)")
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .withColumn("__n", size(TextOps.tokens(col("__t"))).cast("long"))
    val key = (blk: Column) => concat(col("doc_id").cast("string"),
      lit(":"), blk.cast("string"))
    val spans = base
      .withColumn("blk",
        explode(sequence(lit(0L), expr(s"(__n - 1) DIV $block"))))
      .withColumn("start_in",
        pmod(digestKey60(key(col("blk")), 0), lit((block - maxSpan + 1).toLong)))
      .withColumn("len0",
        lit(1L) + pmod(digestKey60(key(col("blk")), 1), lit(maxSpan.toLong)))
      .withColumn("abs_start", col("blk") * block + col("start_in") + 1)
      .filter(col("abs_start") <= col("__n"))
      .withColumn("span_len",
        least(col("len0"), col("__n") - col("abs_start") + 1))
      .withColumn("masked",
        array_join(slice(TextOps.tokens(col("__t")),
          col("abs_start").cast("int"), col("span_len").cast("int")), " "))
    val agg = spans.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(
          col("abs_start"), col("span_len"), col("blk"), col("masked"))))
          .as("sp"),
        count(lit(1)).as("n_spans"),
        sum(col("span_len")).as("n_masked"))
    val sentinel = (b: Column) =>
      concat(lit("<extra_id_"), b.cast("string"), lit(">"))
    base.join(agg, Seq("doc_id"), "left")
      .withColumn("sp", coalesce(col("sp"),
        array().cast("array<struct<abs_start:long,span_len:long," +
          "blk:long,masked:string>>")))
      .select(col("doc_id"),
        col("__n").as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        array_join(filter(
          transform(sequence(lit(1L), col("__n")), pos => {
            val cov = filter(col("sp"), s =>
              s("abs_start") <= pos &&
                pos < s("abs_start") + s("span_len"))
            when(size(cov) === 0,
                element_at(TextOps.tokens(col("__t")), pos.cast("int")))
              .when(element_at(cov, 1)("abs_start") === pos,
                sentinel(element_at(cov, 1)("blk")))
              .otherwise(lit(null))
          }), t => t.isNotNull), " ").as("input_text"),
        array_join(transform(col("sp"), s =>
          concat(sentinel(s("blk")), lit(" "), s("masked"))), " ")
          .as("target_text"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022,
    * arXiv:2207.14255): split each document into (prefix, middle,
    * suffix) at two cut points and emit the PSM and SPM orderings the
    * FIM objective trains on — `<fim_prefix> P <fim_suffix> S
    * <fim_middle> M` and `<fim_suffix> S <fim_prefix> P <fim_middle>
    * M`. The cut points are the two 60-bit halves of md5("id:fim") mod
    * (n+1) ([[digestKey60]] — the q139 span-corruption discipline):
    * deterministic, so a resuming trainer re-derives the identical
    * transformation, and empty segments are legal exactly as in the
    * paper (a cut at 0 or n). Assembled from a sentinel/segment array
    * with empties filtered, so no double spaces — and the oracle's
    * `array_to_string` NULL-for-empty-list quirk lands in the same
    * filter. Map-only: one projection, no shuffle at any scale. */
  def fimTransform(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .withColumn("__tk", TextOps.tokens(col("__t")))
      .withColumn("n_tokens", size(col("__tk")).cast("long"))
    val fimKey = concat(col("doc_id").cast("string"), lit(":fim"))
    // digest keys are non-negative 60-bit ints, so pmod == the oracle's
    // % (the q99 convention)
    val seg = (from: Column, len: Column) =>
      array_join(slice(col("__tk"), from.cast("int"), len.cast("int")), " ")
    def joinParts(parts: Column*): Column =
      array_join(filter(array(parts: _*), x => x =!= ""), " ")
    base
      .withColumn("c1", pmod(digestKey60(fimKey, 0), col("n_tokens") + 1))
      .withColumn("c2", pmod(digestKey60(fimKey, 1), col("n_tokens") + 1))
      .withColumn("cut_lo", least(col("c1"), col("c2")))
      .withColumn("cut_hi", greatest(col("c1"), col("c2")))
      .withColumn("__pre", seg(lit(1), col("cut_lo")))
      .withColumn("__mid", seg(col("cut_lo") + 1, col("cut_hi") - col("cut_lo")))
      .withColumn("__suf", seg(col("cut_hi") + 1, col("n_tokens") - col("cut_hi")))
      .select(col("doc_id"), col("n_tokens"), col("cut_lo"), col("cut_hi"),
        joinParts(lit("<fim_prefix>"), col("__pre"),
          lit("<fim_suffix>"), col("__suf"),
          lit("<fim_middle>"), col("__mid")).as("psm_text"),
        joinParts(lit("<fim_suffix>"), col("__suf"),
          lit("<fim_prefix>"), col("__pre"),
          lit("<fim_middle>"), col("__mid")).as("spm_text"))
  }

  /** Curriculum-ordered sharding — [[shardForTraining]] with the
    * within-shard order keyed by a DIFFICULTY column first (ascending,
    * NULLS LAST — the q122 cross-engine rule), hash second: every
    * shard reads easy→hard (curriculum learning's standard schedule,
    * Bengio et al. 2009) while shard MEMBERSHIP stays the unbiased
    * md5 split — so each worker sees the same difficulty ramp over an
    * i.i.d. slice of the corpus, rather than worker 0 getting all the
    * easy documents (which is what sorting globally THEN sharding
    * contiguously would do). The hash tiebreaker keeps equal-difficulty
    * runs shuffled instead of id-ordered (oldest-first). Same shuffle
    * count as [[shardForTraining]]: one per-shard window. */
  def curriculumShards(df: DataFrame, idCol: String,
      difficultyCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val clash =
      df.columns.filter(Set("shard", "order_key", "pos_in_shard"))
    require(clash.isEmpty,
      s"curriculumShards: input column(s) ${clash.mkString(", ")} " +
        "collide with the outputs (shard, order_key, pos_in_shard) — " +
        "rename before sharding")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col(difficultyCol).asc_nulls_last, col("order_key"),
        col(idCol))
    df.withColumn("shard",
        pmod(digestKey60(col(idCol), 0), lit(nShards.toLong)))
      .withColumn("order_key", digestKey60(col(idCol), 1))
      .withColumn("pos_in_shard", row_number().over(w) - 1)
  }

  /** DSIR data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling") made deterministic
    * and hash-exact: score each raw document by how much more likely
    * its hashed-bigram features are under a TARGET corpus than under
    * the raw corpus. The hashed n-gram density estimator is the
    * paper's own device — it is what makes the target/raw likelihood
    * ratio computable at corpus scale without training a model. Here
    * both distributions are bucket counts over `nBuckets` md5 feature
    * buckets (the q143 hashed-feature convention) and the per-bucket
    * importance weight is integer basis points with add-one smoothing:
    * `w_bp(b) = (10000·(tc(b)+1)) DIV (rc(b)+1)`. Doc score =
    * Σ occ·w_bp; selection = `rank ≤ topK` by (score DESC, doc_id).
    *
    * Scale shape: per-(doc, bucket) collapse first (as in
    * [[graft.llm.TextOps.tokenRarity]]); both distribution tables are
    * `nBuckets` rows — broadcast-sized BY CONSTRUCTION, which is the
    * hashing trick's whole point. The selection rank over the
    * doc-level aggregate rows is the [[graft.functions.Ranks]]
    * two-pass distributed exact rank (range counts → literal offsets
    * → per-range window), NOT a global window — no task ever holds
    * the corpus (the round-11 verdict's q152 finding); a pure top-k
    * SELECTION (no per-doc audit rank) could go further and use the
    * k-bounded [[graft.functions.TopKAgg]] partial aggregate (the
    * q116 serve shape). Featureless docs (<2 tokens) surface with
    * score 0. */
  def dsirSelect(rawDf: DataFrame, targetDf: DataFrame, idCol: String,
      textCol: String, nBuckets: Int = 4096, topK: Int = 100): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    require(topK >= 1, s"topK must be positive, got $topK")
    // fanOutSmall: the tokenize + bigram-hash explode below is the whole
    // token stream's CPU and must not ride a 1-split scan (guide §2.5)
    def feats(df: DataFrame): DataFrame = graft.util.Par.fanOutSmall(df)
      .select(col(idCol).as("doc_id"),
        explode(TextOps.adjacentBigrams(TextOps.tokens(col(textCol))))
          .as("bigram"))
      .select(col("doc_id"),
        (conv(substring(md5(col("bigram")), 1, 15), 16, 10).cast("long")
          % nBuckets).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("occ"))
    // raw feeds two consumers (rc and the scored join) inside the ONE
    // job the rank checkpoint runs — AQE exchange reuse computes the
    // per-(doc, bucket) aggregation once (an explicit checkpoint here
    // measured strictly slower: it materializes the same exchange a
    // second time)
    val raw = feats(rawDf)
    val rc = raw.groupBy(col("bucket")).agg(sum(col("occ")).as("rc"))
    val tc = feats(targetDf).groupBy(col("bucket"))
      .agg(sum(col("occ")).as("tc"))
    val w = rc.join(tc, Seq("bucket"), "left")
      .select(col("bucket"),
        expr("(10000 * (coalesce(tc, 0) + 1)) DIV (rc + 1)").as("w_bp"))
    val scored = raw.join(broadcast(w), "bucket")
      .groupBy(col("doc_id"))
      .agg(sum(col("occ")).as("n_feats"),
        sum(col("occ") * col("w_bp")).as("score"))
    val audit = rawDf.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .withColumn("n_feats", coalesce(col("n_feats"), lit(0L)))
      .withColumn("score", coalesce(col("score"), lit(0L)))
    // surrogate = -score: monotone in (score DESC, doc_id) order; the
    // score-0 tail (featureless docs) all shares one range, ordered
    // there by doc_id — the documented multiplicity floor
    graft.functions.Ranks.globalRowNumber(audit,
        Seq(col("score").desc, col("doc_id")), -col("score"), "rank")
      ._1
      .withColumn("selected", (col("rank") <= topK).cast("int"))
  }

  /** Per-source document caps — the C4/RefinedWeb guard against a
    * single domain flooding the corpus (Raffel et al. 2020 §2.2 caps
    * pages per domain; web pipelines do the same per host): keep at
    * most `cap` docs per source, chosen by the deterministic
    * [[sampleKey]] hash priority rather than file order (which is not
    * reproducible at scale), tie-broken by id. Emits every doc with
    * its priority rank and a kept flag — the audit view; the keep
    * filter is one predicate away.
    *
    * Scale shape: one window partitioned BY SOURCE — the shuffle keys
    * on source and each partition sorts only its own source's rows.
    * For a pathological mega-source, rank ≤ cap only needs the
    * per-source TOP-cap by priority: pre-filter with a priority
    * threshold (the [[sampleKey]] range is uniform, so a
    * `prio < 100·ε` guard bounds the window's input) or the k-bounded
    * aggregate — the same skew ladder as q116. */
  def sourceCap(df: DataFrame, idCol: String, sourceCol: String,
      cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be positive, got $cap")
    df.withColumn("prio", sampleKey(col(idCol)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(sourceCol))
          .orderBy(col("prio"), col(idCol))))
      .withColumn("kept", (col("rn") <= cap).cast("int"))
  }

  /** Exact nearest-rank percentiles of a numeric column — the
    * CALIBRATION step every threshold gate starts from
    * ([[graft.llm.TextOps.bigramFamiliarity]]'s head/tail cuts, a
    * quality keep-line): the value at rank `ceil(p·n/100)` in
    * (valueCol, tieCol) order, for each requested percentile. Exact
    * and hash-replayable across engines, unlike `approx_percentile`
    * (whose sketch is implementation-specific). Emits
    * `(pct, n_rows, rank, value)`.
    *
    * Scale shape: the [[graft.functions.Ranks.rowsAtRanks]] two-pass
    * distributed rank — range counts size the target ranks, then ONLY
    * the ≤ |pcts| ranges actually holding a target rank are sorted
    * (inside a partitioned window); the rest of the input is counted,
    * never sorted, and no task ever holds the whole frame (the
    * round-11 verdict's q157 finding). The percentile probe itself
    * stays join-free: a per-row explode of the (tiny, literal)
    * percentile list plus a rank-equality filter. */
  def exactPercentiles(df: DataFrame, valueCol: String, tieCol: String,
      pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty, "pcts must be non-empty")
    require(pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be in [1, 100], got ${pcts.mkString(",")}")
    val (picked, n) = graft.functions.Ranks.rowsAtRanks(
      df.select(col(valueCol).as("value"), col(tieCol).as("__tie")),
      Seq(col("value"), col("__tie")), col("value"),
      total => pcts.map(p => math.max(1L, (total * p + 99) / 100))
        .distinct,
      "rn")
    picked
      .select(col("value"), col("rn"), lit(n).as("n_rows"),
        explode(typedLit(pcts)).as("pct"))
      .filter(expr("rn = greatest(1, (n_rows * pct + 99) DIV 100)"))
      .select(col("pct"), col("n_rows"), col("rn").as("rank"),
        col("value"))
  }

  /** Corpus snapshot diff — the data-versioning primitive (what a
    * Delta/Iceberg change feed computes, as a deterministic batch op):
    * per doc id, `added` / `removed` / `changed` / `unchanged` between
    * two corpus versions, with the content fingerprints that justify
    * the verdict. Content compares by md5 FINGERPRINT, not payload —
    * the projection happens before the join, so only 32-byte digests
    * cross the exchange, never the 100 TB of text (the reason a naive
    * `old.text != new.text` join is wrong at scale). One shuffle,
    * keyed on the id both sides already carry. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("doc_id"),
      md5(col(textCol)).as("old_fp"))
    val n = newDf.select(col(idCol).as("doc_id"),
      md5(col(textCol)).as("new_fp"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") === col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")))
  }

  /** Length-bucketed batch assignment — the dynamic-batching step an
    * inference or eval runner uses instead of sequence packing: group
    * same-length-class docs so a batch's padded cost is
    * `batch_size · bucket_len` with bounded waste. Buckets are exact
    * integer CASE classes (≤16/≤32/≤64/≤128/256+ — a float log2
    * bucket would be boundary-fragile cross-engine); capacity per
    * batch = `budgetTokens DIV bucket_len`; membership is a
    * ROW_NUMBER within (group, bucket) in id order, so assignment is
    * deterministic and engine-replayable.
    *
    * Scale shape: one window partitioned by (groupCol, bucket) — the
    * same per-shard parallelism argument as [[packSequencesBy]]; the
    * groupCol is what keeps a single global length class from
    * funneling into one partition. */
  def lengthBatches(df: DataFrame, idCol: String, tokenCol: String,
      groupCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 256,
      s"budgetTokens must cover the largest bucket (256), got $budgetTokens")
    val bucket = when(col(tokenCol) <= 16, 16L)
      .when(col(tokenCol) <= 32, 32L)
      .when(col(tokenCol) <= 64, 64L)
      .when(col(tokenCol) <= 128, 128L)
      .otherwise(256L)
    val w = Window.partitionBy(col(groupCol), col("bucket_len"))
      .orderBy(col(idCol))
    df.withColumn("bucket_len", bucket)
      .withColumn("rn", row_number().over(w))
      .withColumn("per_batch", expr(s"$budgetTokens DIV bucket_len"))
      .withColumn("batch_id", expr("(rn - 1) DIV per_batch"))
      .withColumn("pos_in_batch", expr("(rn - 1) % per_batch"))
      .drop("rn", "per_batch")
  }

  /** Rendezvous (highest-random-weight) shard assignment — the
    * consistent-sharding rule whose defining property is MINIMAL
    * MOVEMENT: when the shard count grows n → n+1, a doc moves iff
    * the NEW shard wins its weight race, so exactly ~1/(n+1) of docs
    * move and every mover lands on the new shard (a `pmod(hash, n)`
    * assignment reshuffles ~n/(n+1) of the corpus instead — the
    * resharding-cost argument for rendezvous in any distributed
    * store). Weight = md5 digest of `id:shard` (the q143 digest
    * convention), argmax tie-broken toward the higher shard id.
    * Map-only: one projection, no explode, no shuffle — the argmax
    * unrolls over a SHARD-COUNT-sized literal array per row. */
  def rendezvousShard(id: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 64,
      s"nShards must be in [1, 64], got $nShards")
    val weights = transform(sequence(lit(0), lit(nShards - 1)),
      s => struct(
        conv(substring(md5(concat(id.cast("string"), lit(":"),
          s.cast("string"))), 1, 15), 16, 10).cast("long").as("w"),
        s.cast("long").as("shard")))
    array_max(weights).getField("shard")
  }

  /** Split-leakage audit — MEASURE the leak [[leakageSafeSplit]]
    * prevents, per split method: given `(idCol, keeperCol)` near-dup
    * component labels, apply the split hash keyed on the doc's own id
    * (`naive` — what a pipeline without component labels does) and
    * keyed on the component label (`safe`), then count, per method,
    * the components whose members straddle more than one split and the
    * docs caught in them. A doc whose near-duplicate sits in train
    * while it sits in val/test is memorized, not held out — the audit
    * turns that from an argument into a number (leak share in integer
    * bp). The `safe` row is the built-in regression gate: anything
    * but zero means the split key stopped being component-constant.
    *
    * Scale shape: the split columns are scan-local arithmetic on the
    * label frame the dedup pass already produced; the audit is one
    * aggregation by component then one by method — no joins, no text. */
  def splitLeakageAudit(labeled: DataFrame, idCol: String,
      keeperCol: String, trainPct: Int = 90, valPct: Int = 5)
      : DataFrame = {
    def splitOf(key: Column): Column = {
      val k = sampleKey(key)
      when(k < lit(trainPct), lit("train"))
        .when(k < lit(trainPct + valPct), lit("val"))
        .otherwise(lit("test"))
    }
    def audit(method: String, splitCol: Column): DataFrame =
      labeled
        .select(col(keeperCol).as("comp"), splitCol.as("split"))
        .groupBy(col("comp"))
        .agg(countDistinct(col("split")).as("n_splits"),
          count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_components"),
          sum(when(col("n_splits") > 1, 1L).otherwise(0L))
            .as("leaky_components"),
          sum(when(col("n_splits") > 1, col("sz")).otherwise(0L))
            .as("docs_in_leaky"),
          expr("10000 * sum(CASE WHEN n_splits > 1 THEN sz ELSE 0 END)" +
            " DIV sum(sz)").as("leak_bp"))
        .select(lit(method).as("method"), col("n_components"),
          col("leaky_components"), col("docs_in_leaky"), col("leak_bp"))
    audit("naive", splitOf(col(idCol)))
      .unionByName(audit("safe", splitOf(col(keeperCol))))
  }

  /** Shard release manifest — the integrity record a reproducible
    * corpus release ships beside its shards: per [[shardForTraining]]
    * shard, the doc count, the size mass, an ORDER-INVARIANT content
    * checksum, and the id range. The checksum is `bit_xor` over each
    * doc's 60-bit digest of `id:md5(content)` — commutative and
    * associative, so it is independent of partitioning and merge order
    * (a concatenation digest would need a global sort to be stable),
    * yet any flipped byte, dropped doc or duplicated doc changes it.
    * Two manifests agree iff the releases carry the same (id, content)
    * sets per shard — the cheap equality test before any diff runs.
    *
    * Scale shape: map-only digest arithmetic + one aggregation keyed
    * by shard; only 8-byte signatures cross the exchange. */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
      sizeCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val shard = pmod(digestKey60(col(idCol), 0), lit(nShards.toLong))
    val sig = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":"), md5(col(textCol)))), 1, 15), 16, 10).cast("long")
    df.select(shard.as("shard"), col(sizeCol).as("__sz"), sig.as("__sig"),
        col(idCol).as("__id"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__sz")).as("size_mass"),
        expr("bit_xor(__sig)").as("checksum"),
        min(col("__id")).as("min_doc"), max(col("__id")).as("max_doc"))
  }
}
