package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (§optimizer toolbox; at 100 TB a handful
  * of hot keys — one chatty service, one runaway cluster id — will stall
  * a plain shuffle join's hottest partition).
  *
  * Left (large, skewed) side gets a deterministic salt in [0, salts);
  * right (smaller) side is exploded ×salts so every (key, salt) pair
  * matches. The shuffle key becomes (key, salt): hot keys spread over
  * `salts` partitions. AQE's skew-join handles moderate skew on its own —
  * this is the explicit tool for the extreme tail.
  */
object SkewJoin {

  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    // deterministic salt (no RNG, so plans replay identically) from the
    // key plus ONE cheap disambiguating column — hashing every column
    // would pay per-row width for no extra spread; the non-key column is
    // what spreads a hot key's rows across salt partitions
    val saltCols = key +: left.columns.filter(_ != key).take(1)
    val salted = left.withColumn("_salt",
      pmod(hash(saltCols.map(col): _*), lit(salts)))
    val exploded = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }
}
