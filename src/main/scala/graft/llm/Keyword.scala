package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword (inverted-index) retrieval — the lexical complement to the
  * ANN stack (SimSearch/Ivf): RAG serving in practice is HYBRID, a
  * keyword candidate set fused with a vector candidate set, because
  * each recalls what the other misses (exact identifiers and rare
  * names vs paraphrase). The reference has no search surface at all
  * (north-star extension, SURVEY.md §2.J note); everything here is
  * deterministic integer arithmetic so the whole retrieval path —
  * postings, boolean AND, match-count ranking, reciprocal-rank fusion
  * — is DuckDB-oracle-checkable.
  *
  * Scale design: the posting "index" is the NORMALIZED (token, doc_id)
  * table, NOT per-token arrays — `collect_list` postings would build a
  * row the size of the corpus for "the" (the same reason the IVF lists
  * are a partitioned table, not a struct). Deduplication to distinct
  * (token, doc) pairs happens map-side under partial aggregation; at
  * rest the table would be written bucketed/partitioned by token hash
  * exactly like the IVF layout (q115), so a query term reads one
  * bucket. Query-side joins are per-TERM semi-joins (a query has a few
  * terms; each probe is key-local), with match-count AND/OR semantics
  * from one aggregation.
  */
object Keyword {

  /** The posting table: one row per DISTINCT (token, doc) pair, tokens
    * lowercased via [[TextOps.regexTokens]]. `df_count` (document
    * frequency) rides along per token — rankers and stop-word gates
    * both need it, and it is one window away from the pairs. */
  def postings(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pairs = df.select(col(idCol).as("doc_id"),
        explode(TextOps.regexTokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf")) // term frequency, exact
    pairs.withColumn("df_count",
      count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("token"))))
  }

  /** Boolean retrieval over [[postings]]: docs matching at least
    * `minMatch` of the `terms` (AND = terms.size, OR = 1). Emits
    * `(doc_id, n_matched, sum_tf)` — integer rank keys. The terms
    * frame is tiny and broadcasts; the postings side is probed
    * key-locally on the token. */
  def search(postings: DataFrame, terms: DataFrame,
      minMatch: Int): DataFrame = {
    require(minMatch >= 1, s"minMatch must be >= 1, got $minMatch")
    // distinct: a repeated query term ("foo bar foo") would duplicate
    // every matching posting row and silently inflate sum_tf (the
    // countDistinct match count would mask it)
    postings.join(broadcast(terms.select(col("token")).distinct()), "token")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("token")).as("n_matched"),
        sum(col("tf")).as("sum_tf"))
      .filter(col("n_matched") >= minMatch)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) kept INTEGER-exact:
    * contribution of rank r is `1000000 DIV (60 + r)` — the standard
    * RRF k=60 shape scaled to integers so the fused score is a sum of
    * exact longs (float RRF sums are order-sensitive in the last ulp
    * and would need a tolerance gate). Inputs are two (doc_id, rn)
    * ranked lists; fusion is a FULL outer join — a doc found by either
    * side scores, an absent side contributes 0. */
  def rrf(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("doc_id"), col("rn").as("rank_a"))
    val r = b.select(col("doc_id"), col("rn").as("rank_b"))
    l.join(r, Seq("doc_id"), "full_outer")
      .withColumn("score",
        coalesce(expr("1000000 DIV (60 + rank_a)"), lit(0L)) +
          coalesce(expr("1000000 DIV (60 + rank_b)"), lit(0L)))
  }
}
