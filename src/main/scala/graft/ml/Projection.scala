package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D projection feed for cluster visualization (reference §2.J9:
  * `scripts/visualise_results.py:46-63` exports a 2-D embedding of sampled
  * vectors for the scatter plot). The reference uses t-SNE — an iterative
  * stochastic fit, out of scope as viz — so the engine ships the
  * deterministic stand-in that feeds the same plot: top-2 PCA.
  *
  * Scale shape: one pass for the d means + d² second moments (posexplode
  * self-join, d² rows per point with d = embedding dim — the Gramian,
  * collected at d² scalars regardless of N), a tiny seed-free power
  * iteration on the driver's d×d covariance, then one broadcast-project
  * over the corpus. No row-scale collect anywhere.
  */
object Projection {

  /** Top-`k` eigenvectors of a symmetric d×d matrix via deterministic
    * power iteration + deflation (fixed start vector, no RNG). */
  private[ml] def topEigenvectors(cov: Array[Array[Double]], k: Int,
      iters: Int = 200): Seq[Array[Double]] = {
    val d = cov.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val work = cov.map(_.clone())
    (0 until k).foreach { _ =>
      var v = Array.tabulate(d)(i => 1.0 / math.sqrt(d.toDouble))
      var it = 0
      while (it < iters) {
        val nv = Array.tabulate(d)(i => {
          var s = 0.0
          var j = 0
          while (j < d) { s += work(i)(j) * v(j); j += 1 }
          s
        })
        val n = math.sqrt(nv.map(x => x * x).sum)
        v = if (n > 1e-12) nv.map(_ / n) else nv
        it += 1
      }
      // fix sign for determinism: first nonzero component positive
      val lead = v.find(math.abs(_) > 1e-12).getOrElse(1.0)
      if (lead < 0) v = v.map(-_)
      out += v
      // deflate: work -= λ v vᵀ
      val lambda = {
        var s = 0.0
        var i = 0
        while (i < d) {
          var j = 0
          while (j < d) { s += v(i) * work(i)(j) * v(j); j += 1 }
          i += 1
        }
        s
      }
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { work(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
    }
    out.toSeq
  }

  /** (id, pc1, pc2, <labelCol>) — every vector projected onto the top-2
    * principal components of the column's covariance. */
  def pca2d(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val spark = df.sparkSession
    val pts = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"), col(labelCol))
    val dims = pts.select(col("id"), posexplode(col("v")))
    // one d-sized and one d²-sized aggregate — constant-size results
    val means = dims.groupBy("pos").agg(avg("col").as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val moments = dims.select(col("id"), col("pos").as("i"),
        col("col").as("xi"))
      .join(dims.select(col("id"), col("pos").as("j"), col("col").as("xj")),
        "id")
      .groupBy("i", "j")
      .agg(avg(col("xi") * col("xj")).as("e_ij"))
      .collect()
    val d = means.size
    val cov = Array.ofDim[Double](d, d)
    moments.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      cov(i)(j) = r.getDouble(2) - means(i) * means(j)
    }
    val Seq(p1, p2) = topEigenvectors(cov, 2)
    val mu = Array.tabulate(d)(means(_))
    val bc = spark.sparkContext.broadcast((mu, p1, p2))
    val proj = udf((v: Seq[Double]) => {
      val (m, a, b) = bc.value
      var s1 = 0.0
      var s2 = 0.0
      var i = 0
      while (i < v.length) {
        val c = v(i) - m(i)
        s1 += c * a(i); s2 += c * b(i)
        i += 1
      }
      (s1, s2)
    })
    pts.withColumn("p", proj(col("v")))
      .select(col("id"), col("p._1").as("pc1"), col("p._2").as("pc2"),
        col(labelCol))
  }
}
