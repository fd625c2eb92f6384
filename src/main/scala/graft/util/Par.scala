package graft.util

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism helpers (optimization guide §2.5 / §1.2:
  * fix the distributed algorithm's parallelism before per-task work).
  */
object Par {

  /** Per-core size budget under which an extra round-robin exchange is
    * considered free relative to the compute stage it unlocks. */
  private val BytesPerCore: Long = 16L << 20

  /** Fan a SMALL frame out to the session's core count before a
    * CPU-heavy per-row stage (tokenize / shingle / hash / decode
    * fan-outs).
    *
    * Why it exists: the planner parallelizes by BYTES — a single small
    * parquet file plans as ONE scan task, and AQE's partition coalescing
    * folds small shuffle outputs back to one partition — which is right
    * when per-row work is cheap and wrong when each row then explodes
    * into k-gram/hash work orders of magnitude heavier than its bytes
    * (measured in round 15: 1-task stages of 1.3–2.6 s dominating every
    * text/dedup query at sf0.1 while 31 cores idle). That CPU-vs-bytes
    * ratio is problem knowledge the optimizer does not have (guide §8).
    *
    * Why it is scale-safe: the fan-out fires ONLY when the optimizer's
    * own size estimate says the exchange is negligible (≤16 MB/core —
    * then the shuffle costs microseconds and the unlocked parallelism is
    * pure win). On a 100 TB input the estimate exceeds the cap by orders
    * of magnitude, the guard disables the repartition, and the scan's
    * natural split parallelism rules — exactly the "derive partitioning
    * from input size, not a constant" posture. Reading
    * `optimizedPlan.stats` only plans (never runs) the query.
    *
    * Correctness: repartition is pure row placement (retry-safe — Spark
    * sorts before round-robin, SPARK-23207), so any downstream
    * order-independent computation (counts, min/max, integer/decimal
    * sums, per-row maps, joins) is value-identical. Do NOT use below an
    * order-SENSITIVE aggregation (collect_list without sort, first). */
  def fanOutSmall(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    // Sum the LEAF scans' size estimates, not the plan root's: leaf stats
    // are real file sizes, while a join's root estimate multiplies and
    // would wrongly disable the fan-out for (small ⋈ small) inputs. If
    // every leaf this frame reads fits the per-core budget, the added
    // exchange is provably negligible; a 100 TB leaf disables it.
    val est = df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    if (est <= BigInt(cores.toLong) * BytesPerCore) df.repartition(cores)
    else df
  }
}
