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

  /** Equi-join cardinality estimate from two sketches built with the
    * SAME (depth, width): est = min over hash rows of the row-wise
    * inner product Σ_cell cntA·cntB (Cormode & Muthukrishnan 2005 §4.2
    * — the AMS-style inner-product query). Guarantee mirrors the point
    * estimate: est ≥ |A ⋈ B| always (collisions only add), overshoot
    * ~ ‖A‖₁·‖B‖₁/width per row. This is the optimizer's question —
    * "how big is this join" — answered from two mergeable,
    * constant-size summaries WITHOUT scanning either side again: at
    * 100 TB the exact answer is a full groupBy on each side's key
    * domain; the sketches are d·w cells each, maintained incrementally
    * by the streaming ingest (q179's path). Cost here: one
    * (row, cell)-keyed join of two ≤ d·w-row frames. Returns one row
    * `(est)`.
    *
    * Arithmetic bound: the row-wise product sum is ≤ ‖A‖₁·‖B‖₁, so
    * exact long arithmetic holds while that product stays under 2⁶³
    * (~9.2e18 — e.g. 1e10 rows joined against 1e8 rows). Past that a
    * caller should widen the product sum to DECIMAL(38,0); an
    * ESTIMATE at that magnitude does not need the last integer digit,
    * but this library's oracle replays do.
    *
    * Returns one row `(est)` whenever sketch `a` is non-empty — a hash
    * row whose cell sets are fully disjoint between the sketches has
    * true inner product 0, and the left join from `a`'s row domain
    * seeds exactly that zero instead of dropping the row (the inner
    * join would otherwise skip it in the min and, with NO overlapping
    * cells anywhere, return an empty frame — the round-11 advice
    * finding). An empty `a` yields a single NULL est. */
  def cmsInnerProduct(a: DataFrame, b: DataFrame): DataFrame = {
    val ip = a.select(col("row_i"), col("cell"), col("cnt").as("cnt_a"))
      .join(b.select(col("row_i"), col("cell"), col("cnt").as("cnt_b")),
        Seq("row_i", "cell"))
      .groupBy(col("row_i"))
      .agg(sum(col("cnt_a") * col("cnt_b")).as("ip"))
    a.select(col("row_i")).distinct()
      .join(ip, Seq("row_i"), "left")
      .agg(min(coalesce(col("ip"), lit(0L))).as("est"))
  }

  // ---------------------------------------------------------------- Bloom

  /** Bits per Bloom word. 60 (not 64) on purpose: every bit mask is
    * `1L << [0,59]` — positive in both engines — so the DuckDB oracle's
    * checked `<<` never overflows (1::BIGINT << 63 is an error there)
    * and no sign-bit edge case exists anywhere in the replay. */
  val BloomBitsPerWord = 60

  /** Hash `r` of a key → global bit position in a `words`-word filter.
    * Same determinism-by-construction as [[cmsCell]]: a 60-bit md5
    * digest of `"r:key"` mod the bit count — no seeds, no RNG, so the
    * identical filter comes out of any engine or partitioning and a SQL
    * oracle replays membership bit-for-bit. */
  def bloomPos(key: Column, r: Int, words: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$r:"), key)), 1, 15), 16, 10)
      .cast("long"), lit(words.toLong * BloomBitsPerWord))

  /** Build the packed filter from one key per input row: `(word, bits)`
    * with at most `words` result rows. One aggregation; partial
    * aggregation collapses each partition to ≤ `words` rows map-side,
    * so the exchange carries filter-sized, not corpus-sized, data —
    * and like the CMS the filter is MERGEABLE (word-wise OR), so
    * per-batch or per-executor filters union with no rescan. */
  def bloomBuild(keys: DataFrame, keyCol: String, k: Int,
      words: Int, groupCols: Seq[String] = Nil): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be in [1,8], got $k")
    require(words >= 1, s"words must be >= 1, got $words")
    keys.select(groupCols.map(col) :+ explode(array((0 until k).map(r =>
        bloomPos(col(keyCol), r, words)): _*)).as("pos"): _*)
      .groupBy(groupCols.map(col) :+
        (col("pos") / BloomBitsPerWord).cast("long").as("word"): _*)
      .agg(expr(s"bit_or(shiftleft(1L, CAST(pos % $BloomBitsPerWord" +
        " AS INT)))").as("bits"))
  }

  /** Materialize a built filter into its dense Long-array form. Driver
    * collect is bounded BY CONSTRUCTION at `words` longs (16 KiB at the
    * default 2048) — the Ivf-centroids precedent: sketch-sized state is
    * the thing a 1000-executor job broadcasts, not corpus-sized data. */
  def bloomCollect(bloom: DataFrame, words: Int): Array[Long] = {
    require(words <= (1 << 22),
      s"refusing to collect a ${words}-word bloom to the driver")
    val dense = new Array[Long](words)
    bloom.select(col("word").cast("int"), col("bits")).collect().foreach {
      r => dense(r.getInt(0)) = r.getLong(1)
    }
    dense
  }

  /** The JVM twin of [[bloomPos]] for ONE probe hash: the 60-bit md5
    * digest of `"r:key"` (first 15 hex chars parsed base-16 — exactly
    * conv's semantics) mod the filter's bit count. Shared by
    * [[bloomHitUdf]] (executor-side membership) and driver-side
    * metadata readers ([[graft.llm.Layout]]'s stored per-file Bloom —
    * a point-lookup planner probes collected filters without a Spark
    * job); pinned ≡ the SQL expression by LlmSpec. */
  def bloomPosJvm(md: java.security.MessageDigest, key: String, r: Int,
      words: Int): Long = {
    val dig = md.digest(s"$r:$key".getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { // 7.5 bytes; byte 7 contributes its high nibble
      val b = dig(i) & 0xff
      v = if (i < 7) (v << 8) | b else (v << 4) | (b >> 4)
      i += 1
    }
    java.lang.Math.floorMod(v, words.toLong * BloomBitsPerWord)
  }

  /** All `k` probe bit positions of a key — the driver-side planning
    * call (bounded: k longs per probe). */
  def bloomPositions(key: String, k: Int, words: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(k)(r => bloomPosJvm(md, key, r, words))
  }

  /** Membership of a key in a dense collected filter: true iff all `k`
    * probe bits are set. */
  def bloomContains(bits: Array[Long], key: String, k: Int,
      words: Int): Boolean =
    bloomContainsAt(bits, bloomPositions(key, k, words))

  /** Membership from PRE-COMPUTED probe positions ([[bloomPositions]])
    * — the driver-planning fast path: a probe-set × file-set
    * consultation hashes each key ONCE and tests every file with pure
    * bit ops, O(probes·k) digests instead of O(probes·files·k). */
  def bloomContainsAt(bits: Array[Long], positions: Array[Long])
      : Boolean =
    positions.forall { pos =>
      val mask = 1L << (pos % BloomBitsPerWord).toInt
      (bits((pos / BloomBitsPerWord).toInt) & mask) == mask
    }

  /** Map-only membership test against a collected filter: true iff all
    * `k` probe bits are set. A scalar UDF over the broadcast array —
    * no join, no explode, no exchange on the probe side; this is the
    * 100 TB decontamination shape (16 KiB ships to every executor and
    * the corpus streams through a codegen'd filter). The JVM md5 here
    * is pinned ≡ the [[bloomPos]] SQL expression by LlmSpec. */
  def bloomHitUdf(bits: Array[Long], k: Int, words: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    // One digest per thread, not per row: the holder serializes into
    // the task closure (MessageDigest itself is neither Serializable
    // nor thread-safe, so it lives behind @transient + ThreadLocal —
    // safe for driver-side constant folding AND executor tasks), and
    // digest() resets the instance after each call.
    val md5 = new Md5Holder
    udf { (key: String) =>
      if (key == null) false
      else {
        val md = md5.get
        var r = 0
        var all = true
        while (r < k && all) {
          val pos = bloomPosJvm(md, key, r, words)
          val word = (pos / BloomBitsPerWord).toInt
          val mask = 1L << (pos % BloomBitsPerWord).toInt
          if ((bits(word) & mask) != mask) all = false
          r += 1
        }
        all
      }
    }
  }
}

/** Serializable per-thread MD5 supplier for UDF closures: the holder
  * ships empty (the ThreadLocal is @transient) and every JVM it lands
  * in lazily builds one digest per thread on first use. */
private[llm] class Md5Holder extends Serializable {
  @transient private lazy val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))
  def get: java.security.MessageDigest = tl.get()
}
