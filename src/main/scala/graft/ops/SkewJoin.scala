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
      salts: Int, saltCols: Seq[String] = Nil): DataFrame = {
    // deterministic salt (no RNG, so plans replay identically). Default:
    // hash ALL left columns — guaranteed to spread a hot key whenever any
    // attribute differs. Pass `saltCols` (cheap columns that VARY within
    // a hot key) to avoid hashing wide rows; hashing only the key would
    // be self-defeating (one salt per key = no spread), and a non-key
    // column that is constant per key silently degrades the same way.
    val cols =
      if (saltCols.nonEmpty) key +: saltCols else left.columns.toSeq
    val salted = left.withColumn("_salt",
      pmod(hash(cols.map(col): _*), lit(salts)))
    val exploded = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }
}
