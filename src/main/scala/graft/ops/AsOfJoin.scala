package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — an operator Spark lacks natively
  * (extended surface; SURVEY.md §2.C note). For every left row, attach the
  * right row with the greatest `tsCol` ≤ the left row's `tsCol` within the
  * same `keyCol`.
  *
  * Implementation is the merge-style union + running `last(_, ignoreNulls)`
  * window — O((|L|+|R|) log) with ONE shuffle on the key, instead of the
  * naive inequality join (O(|L|·|R|) pair blowup, which Catalyst would plan
  * as BroadcastNestedLoop). This is the plan that survives 100 TB: both
  * sides shuffle-partition by key, sort within partition, no pair
  * materialization.
  */
object AsOfJoin {

  /** Left as-of join: result = left columns + `matchCols` from the
    * most-recent right match (null when none). Right rows at exactly equal
    * ts DO match (inclusive ≤), ensured by sorting rights before lefts at
    * ties. */
  def asofLeft(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, matchCols: Seq[String],
      matchPrefix: String = "asof_"): DataFrame = {
    val l = left.withColumn("_is_left", lit(1))
      .withColumn("_r_payload", lit(null)
        .cast(org.apache.spark.sql.types.StructType(
          right.select(matchCols.map(col): _*).schema.fields)))
    val r = right.select(
      (Seq(col(keyCol), col(tsCol)) :+
        struct(matchCols.map(col): _*).as("_r_payload")): _*)
      .withColumn("_is_left", lit(0))
    // align schemas: right side carries nulls for the left-only columns
    val leftOnly = left.columns.filterNot(c => c == keyCol || c == tsCol)
    val rAligned = leftOnly.foldLeft(r) { (acc, c) =>
      acc.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = l.unionByName(rAligned.select(l.columns.map(col): _*))
    // deterministic tiebreak among right rows sharing (key, ts): order by
    // a stable hash of the payload so `last()` always picks the same one
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_is_left"), hash(col("_r_payload")))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = unioned
      .withColumn("_match", last(col("_r_payload"), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
    val outCols = left.columns.map(col) ++
      matchCols.map(c => col(s"_match.$c").as(s"$matchPrefix$c"))
    matched.select(outCols: _*)
  }
}
