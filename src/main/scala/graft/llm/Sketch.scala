package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch (Cormode & Muthukrishnan 2005) — fixed-size
  * frequency summaries for unbounded key streams. North-star extension
  * (the reference has no sketch surface): a 100 TB ingest wants running
  * token/domain frequencies without materializing a vocabulary-sized
  * aggregation per monitoring tick, and the CMS answers point queries
  * with one-sided error (never an undercount) from depth×width cells.
  *
  * Determinism by construction: the d row-hashes are md5-derived
  * 60-bit digests of `"row:key"` (the [[Corpus.digestKey60]] idiom) mod
  * the width — no seeds, no RNG, so the SAME sketch comes out of any
  * engine, any partitioning, any arrival order, and a DuckDB oracle
  * replays cell counts and point estimates exactly.
  *
  * Scale shape: building is ONE aggregation over (row, cell) — at most
  * depth×width result rows regardless of corpus size, and partial
  * aggregation collapses each partition to ≤ d·w cells map-side, so
  * the exchange carries sketch-sized, not corpus-sized, data. The
  * sketch is trivially MERGEABLE (cell-wise +), which is what makes it
  * the streaming/monitoring structure: a per-executor or per-batch
  * sketch sums into the global one with no rescan. Probing joins each
  * candidate's d cells against the d·w-row sketch — broadcast-sized by
  * definition. */
object Sketch {

  /** The (row, cell) pair a key lands in for hash row `row`. */
  def cmsCell(key: Column, row: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$row:"), key)), 1, 15), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Build the depth×width sketch from one key instance per input row:
    * `(row_i, cell, cnt)` — the d-fold fan-out happens map-side via
    * posexplode, then one aggregation bounded at depth·width rows. */
  def cmsBuild(keys: DataFrame, keyCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    keys.select(posexplode(array((0 until depth).map(r =>
        cmsCell(col(keyCol), r, width)): _*)))
      .withColumnRenamed("pos", "row_i").withColumnRenamed("col", "cell")
      .groupBy(col("row_i"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[cmsBuild]] from pre-aggregated `(keyCol, cntCol)` counts — the
    * same sketch (CMS over instances ≡ CMS weighted by per-key counts),
    * one explode over the collapsed table instead of the instance
    * stream. Use when a key aggregation already exists in the plan so
    * the sketch costs no second pass over the raw corpus. */
  def cmsBuildWeighted(counts: DataFrame, keyCol: String, cntCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    counts.select(col(cntCol),
        posexplode(array((0 until depth).map(r =>
          cmsCell(col(keyCol), r, width)): _*)))
      .withColumnRenamed("pos", "row_i").withColumnRenamed("col", "cell")
      .groupBy(col("row_i"), col("cell"))
      .agg(sum(col(cntCol)).as("cnt"))
  }

  /** Point-estimate each candidate key against a built sketch:
    * est = min over the d rows of the key's cell count — the CMS
    * guarantee est ≥ true count, with overshoot bounded by collisions.
    * `candidates` must expose `keyCol`; the result carries `est`. */
  def cmsProbe(sketch: DataFrame, candidates: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val cells = candidates.select(col(keyCol),
        posexplode(array((0 until depth).map(r =>
          cmsCell(col(keyCol), r, width)): _*)))
      .withColumnRenamed("pos", "row_i").withColumnRenamed("col", "cell")
    cells.join(broadcast(sketch), Seq("row_i", "cell"))
      .groupBy(col(keyCol))
      .agg(min(col("cnt")).as("est"))
  }
}
