package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, SimSearch}
import graft.ml.{Distance, Embed}

/** Property-based coverage (SURVEY.md §5 plan item 3): metric axioms,
  * embedder determinism, dedup idempotence.
  */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest without the
    * scalatestplus bridge (not in the offline cache). */
  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(16, Gen.chooseNum(-5.0f, 5.0f)).map(_.toArray)

  test("minkowski p=1.5: non-negativity, identity, symmetry, triangle") {
    check(Prop.forAll(vecGen, vecGen, vecGen) { (a, b, c) =>
      val dab = Distance.minkowskiS(a, b, 1.5)
      val dba = Distance.minkowskiS(b, a, 1.5)
      val dac = Distance.minkowskiS(a, c, 1.5)
      val dcb = Distance.minkowskiS(c, b, 1.5)
      dab >= 0 &&
        Distance.minkowskiS(a, a, 1.5) == 0.0 &&
        math.abs(dab - dba) < 1e-9 &&
        dab <= dac + dcb + 1e-9 // triangle holds for p >= 1
    })
  }

  test("cosine similarity is bounded in [-1, 1] and reflexive") {
    check(Prop.forAll(vecGen) { a =>
      val nonZero = a.exists(_ != 0f)
      val cAA = Distance.cosineS(a, a)
      val bounded = !nonZero || (cAA > 0.999999 && cAA <= 1.000001)
      bounded
    })
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val c = Distance.cosineS(a, b)
      c >= -1.000001 && c <= 1.000001
    })
  }

  private val textGen: Gen[String] = Gen.listOf(
    Gen.oneOf("spark", "scan", "join", "window", "agg", "sort", "hash",
      "key", "batch", "stream")).map(_.mkString(" "))

  test("embedder: deterministic, unit norm or zero, dimension fixed") {
    check(Prop.forAll(textGen) { t =>
      val v1 = Embed.embed(t)
      val v2 = Embed.embed(t)
      val n = math.sqrt(v1.map(x => x.toDouble * x).sum)
      v1.sameElements(v2) && v1.length == Embed.DefaultDim &&
        (n == 0.0 || math.abs(n - 1.0) < 1e-5)
    })
  }

  test("simhash of identical text is identical; hamming is symmetric") {
    check(Prop.forAll(textGen, textGen) { (a, b) =>
      val ha = Dedup.simHash64(a)
      val hb = Dedup.simHash64(b)
      Dedup.simHash64(a) == ha &&
        java.lang.Long.bitCount(ha ^ hb) ==
          java.lang.Long.bitCount(hb ^ ha)
    })
  }

  test("minhash signature: deterministic; identical texts share all bands") {
    check(Prop.forAll(textGen.suchThat(_.nonEmpty)) { t =>
      val s1 = Dedup.minHashSignature(t)
      val s2 = Dedup.minHashSignature(t)
      s1.sameElements(s2) && s1.length == 64
    })
  }

  test("lsh buckets: deterministic, within range, table-distinct streams") {
    check(Prop.forAll(vecGen) { v =>
      val b = SimSearch.lshBuckets(v, 4, 8)
      b.length == 8 &&
        b.zipWithIndex.forall { case (x, t) =>
          (x >> 4) == t && (x & 15) >= 0 && (x & 15) < 16
        } &&
        b.sameElements(SimSearch.lshBuckets(v, 4, 8))
    })
  }

  test("minK: any merge order yields the k smallest distinct values") {
    val agg = new graft.functions.MinKAgg.MinK(8)
    val longsGen = Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    check(Prop.forAll(longsGen, longsGen) { (a, b) =>
      val viaReduce = (a ++ b).foldLeft(agg.zero)(agg.reduce)
      val viaMerge = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      val expect = (a ++ b).distinct.sorted.take(8)
      val buf = new graft.functions.MinKAgg.MinKBuf(8)
      (a ++ b).foreach(buf.add)
      viaReduce.items == expect && viaMerge.items == expect &&
        agg.merge(viaMerge, viaMerge).items == expect && // idempotent re-merge
        buf.items == expect // the imperative map-side combine agrees
    })
  }

  test("winnow fingerprints are deterministic; empty only below k chars") {
    check(Prop.forAll(textGen) { t =>
      val w = graft.llm.TextOps.winnow(t)
      val norm = t.toLowerCase.filter(c =>
        c.isDigit || (c >= 'a' && c <= 'z'))
      val sized = if (norm.length < graft.llm.TextOps.WinnowK) w.isEmpty
                  else w.nonEmpty
      sized && w.sameElements(graft.llm.TextOps.winnow(t))
    })
  }

  test("avi codec roundtrip holds for arbitrary geometry, padded or not") {
    // LlmSpec pins w=5 (15-byte rows -> padded stride); this sweeps
    // widths including w*3 % 4 == 0 (no padding) and single-row/-frame
    // degenerate shapes
    val geom = for {
      w <- Gen.chooseNum(1, 8)
      h <- Gen.chooseNum(1, 5)
      f <- Gen.chooseNum(1, 4)
      bytes <- Gen.listOfN(w * h * 3 * f, Gen.chooseNum(-128, 127))
    } yield (w, h, f, bytes.map(_.toByte).toArray)
    check(Prop.forAll(geom) { case (w, h, f, content) =>
      val (dw, dh, frames) = graft.llm.Multimodal.aviDecode(
        graft.llm.Multimodal.aviEncode(content, w, h, f))
      dw == w && dh == h && frames.length == f &&
        frames.zipWithIndex.forall { case (px, fi) =>
          val base = fi * w * h * 3
          // bottom-up storage: decoded row r = content row h-1-r
          (0 until h).forall { r =>
            px.slice(r * w * 3, (r + 1) * w * 3).sameElements(
              content.slice(base + (h - 1 - r) * w * 3,
                base + (h - r) * w * 3))
          }
        }
    })
  }

  test("md5 forest: scores in (0,1], refit bit-identical, flagged count " +
      "bounded by contamination, over arbitrary matrices") {
    import graft.ml.IsolationForest
    val matGen = for {
      n <- Gen.chooseNum(2, 40)
      d <- Gen.chooseNum(1, 4)
      rows <- Gen.listOfN(n,
        Gen.listOfN(d, Gen.chooseNum(-100.0, 100.0)).map(_.toArray))
    } yield rows.toArray
    check(Prop.forAll(matGen) { data =>
      val m1 = IsolationForest.fitMd5(data, nTrees = 3)
      val m2 = IsolationForest.fitMd5(data, nTrees = 3)
      val scores = data.map(x => IsolationForest.score(m1, x))
      // paper eq. 2 range; position-keyed draws make refits bit-equal;
      // threshold = (1-0.05)-quantile bounds the strictly-above count
      scores.forall(s => s > 0.0 && s <= 1.0) &&
        m1.threshold == m2.threshold &&
        data.indices.forall(i =>
          IsolationForest.score(m2, data(i)) == scores(i)) &&
        scores.count(_ > m1.threshold) <=
          math.max(1, math.ceil(0.05 * data.length).toInt)
    })
  }
}
