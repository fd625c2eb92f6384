package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D projection feed for cluster visualization (reference §2.J9:
  * `scripts/visualise_results.py:46-63` exports a 2-D embedding of sampled
  * vectors for the scatter plot). The reference uses t-SNE — an iterative
  * stochastic fit, out of scope as viz — so the engine ships the
  * deterministic stand-in that feeds the same plot: top-2 PCA.
  *
  * Scale shape: ONE map-side-combining aggregation pass accumulates
  * [n, Σv, Σ v·vᵀ] ([[graft.functions.GramianAgg]] — a (1+d+d²)-double
  * buffer per partition regardless of N), a seeded power iteration on the
  * driver's d×d covariance, then one broadcast-project over the corpus.
  * No row-scale collect anywhere.
  */
object Projection {

  /** Top-`k` eigenvectors of a symmetric d×d matrix via deterministic
    * power iteration + deflation. The start vector is seeded-pseudo-random
    * (NOT the uniform vector: for an equicorrelated covariance aI + bJ
    * the uniform vector is itself an exact eigenvector, and when it is a
    * NON-dominant one the iteration would never rotate off it); each
    * iterate is also re-orthogonalized against the eigenvectors already
    * found so deflation round-off cannot leak them back in. */
  private[ml] def topEigenvectors(cov: Array[Array[Double]], k: Int,
      iters: Int = 200): Seq[Array[Double]] = {
    val d = cov.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val work = cov.map(_.clone())
    val rnd = new scala.util.Random(42L)
    def orthonormalize(x: Array[Double]): Array[Double] = {
      val y = x.clone()
      out.foreach { u =>
        var dot = 0.0
        var i = 0
        while (i < d) { dot += y(i) * u(i); i += 1 }
        i = 0
        while (i < d) { y(i) -= dot * u(i); i += 1 }
      }
      val n = math.sqrt(y.map(c => c * c).sum)
      if (n > 1e-12) y.map(_ / n) else y
    }
    (0 until k).foreach { _ =>
      var v = orthonormalize(Array.fill(d)(rnd.nextDouble() - 0.5))
      var it = 0
      while (it < iters) {
        val nv = Array.tabulate(d)(i => {
          var s = 0.0
          var j = 0
          while (j < d) { s += work(i)(j) * v(j); j += 1 }
          s
        })
        v = orthonormalize(nv)
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
    // lazy checkpoint: the Gramian fit and the projection pass both scan
    // pts — materialize the (possibly expensive) upstream plan once
    val pts = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"), col(labelCol))
      .localCheckpoint(false)
    // ONE map-side-combining pass accumulates [n, Σv, Σ v·vᵀ] in a
    // d²-sized buffer per partition (GramianAgg — the MLlib
    // computeGramian pattern as a typed Aggregator): the shuffle carries
    // one buffer per partition regardless of N, and a ragged vector
    // column fails loudly inside the aggregator.
    import df.sparkSession.implicits._
    val g = pts.select(col("v")).as[Seq[Double]]
      .select(graft.functions.GramianAgg.gramian)
      .head()
    // empty input → empty projection (edge-case convention), not a throw
    if (g.isEmpty)
      return pts.withColumn("pc1", lit(0.0)).withColumn("pc2", lit(0.0))
        .select(col("id"), col("pc1"), col("pc2"), col(labelCol))
        .limit(0)
    val d = (math.sqrt(g.length - 0.75) - 0.5).toInt // length = 1 + d + d²
    require(1 + d + d * d == g.length, s"corrupt gramian buffer ${g.length}")
    val n = g(0)
    val mu = Array.tabulate(d)(i => g(1 + i) / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      g(1 + d + i * d + j) / n - mu(i) * mu(j))
    val Seq(p1, p2) = topEigenvectors(cov, 2)
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
