package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q96's oracle parity rests on a CONVERGENCE argument, not on replaying
  * the engine's start vector: both engines run a 200-iteration power
  * method on the bit-identical 8×8 covariance, and because the eigengaps
  * of the fixture geometry are wide (λ₂/λ₁ ≈ 0.65–0.72, λ₃/λ₂ ≈
  * 0.67–0.72 — MlQueries.q96PcaSql scaladoc) both converge to the same
  * axes far below the ROUND(…, 6) gate. That assumption is invisible in
  * the query itself: if a future fixture/dim change narrows the gap, the
  * failure would surface as a confusing oracle hash diff. This spec is
  * the targeted tripwire (round-6 ADVICE): it rebuilds the exact q96
  * covariance (dense md5 vectors, dim 8 — MUST track q96PcaSql's dim)
  * and asserts (a) the gaps stay wide and (b) the produced axes are
  * genuinely converged eigenvectors of the undeflated covariance.
  */
class ProjectionContractSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  test("q96 convergence contract: wide eigengaps + converged axes") {
    val docs = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
    val vecs = Embed.denseSqlVectors(docs, "doc_id", "text", dim = 8)
      .select(col("vec").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val d = 8
    val n = vecs.length.toDouble
    assert(n > 10, "fixture degenerated — contract check meaningless")
    val mu = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      vecs.map(v => (v(i) - mu(i)) * (v(j) - mu(j))).sum / n)
    val eig = Projection.topEigenvectors(cov, 3)
    def apply(v: Array[Double]): Array[Double] =
      Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
    def rayleigh(v: Array[Double]): Double =
      apply(v).zip(v).map { case (a, b) => a * b }.sum
    val lam = eig.map(rayleigh)
    // (a) the eigengap that justifies the shared-convergence argument:
    // if these ratios drift toward 1 the 200-iteration residual claim
    // (≲1e-28) no longer holds and q96's oracle must switch to replaying
    // the engine's seeded start vector instead
    assert(lam(1) / lam(0) < 0.9,
      s"q96 eigengap λ2/λ1 = ${lam(1) / lam(0)} too narrow — the q96 " +
        "oracle's different-start-vector convergence argument is broken " +
        "(see MlQueries.q96PcaSql scaladoc)")
    assert(lam(2) / lam(1) < 0.9,
      s"q96 eigengap λ3/λ2 = ${lam(2) / lam(1)} too narrow — pc2 would " +
        "not converge in 200 iterations (see MlQueries.q96PcaSql scaladoc)")
    // (b) the axes the engine actually ships are converged eigenvectors
    // of the UNDEFLATED covariance (deflation round-off did not leak)
    for ((v, k) <- eig.take(2).zipWithIndex) {
      val av = apply(v)
      val resid = av.zip(v).map { case (a, b) => math.abs(a - lam(k) * b) }.max
      val scale = math.max(math.abs(lam(k)), 1e-12)
      assert(resid / scale < 1e-9,
        s"q96 pc${k + 1} power iterate not converged: relative residual " +
          s"${resid / scale} — fixture geometry changed; q96's oracle " +
          "parity is no longer guaranteed")
    }
  }
}
