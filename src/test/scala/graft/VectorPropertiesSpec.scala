package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import graft.index.{DistanceKernels, HnswIndex}

/** The property tests SURVEY.md §5 commits to: metric laws for the distance
  * kernels and the top-k contract of the index (result ⊆ table, ordered,
  * length ≤ k) under randomized vectors. */
class VectorPropertiesSpec extends AnyFunSuite {

  /** scalacheck driver (scalatestplus isn't in the offline cache). */
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  private val dim = 8
  private val genVec: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](dim, Gen.chooseNum(-100f, 100f))

  test("l2sq: non-negative, symmetric, zero iff equal") {
    check(Prop.forAll(genVec, genVec) { (a, b) =>
      val d = DistanceKernels.l2sq(a, b)
      d >= 0.0 &&
        d == DistanceKernels.l2sq(b, a) &&
        (DistanceKernels.l2sq(a, a) == 0.0) &&
        ((d == 0.0) == a.sameElements(b))
    })
  }

  test("l2 = sqrt(l2sq); cosine distance bounded in [0, 2]") {
    check(Prop.forAll(genVec, genVec) { (a, b) =>
      val eps = 1e-12
      math.abs(DistanceKernels.l2(a, b) - math.sqrt(DistanceKernels.l2sq(a, b))) < eps && {
        val c = DistanceKernels.cosineDistance(a, b)
        c >= -eps && c <= 2.0 + eps
      }
    })
  }

  test("ip: metricDistance('ip') is anti-symmetric in sign with dot") {
    check(Prop.forAll(genVec, genVec) { (a, b) =>
      DistanceKernels.forMetric("ip")(a, b) == -DistanceKernels.dot(a, b)
    })
  }

  test("index top-k contract: subset of inserted keys, ascending, length <= k") {
    val genTable = Gen.chooseNum(1, 60).flatMap(n =>
      Gen.containerOfN[List, Array[Float]](n, genVec))
    check(Prop.forAll(genTable, genVec, Gen.chooseNum(1, 12)) { (vecs, q, k) =>
      val idx = new HnswIndex(dim, "l2sq")
      vecs.zipWithIndex.foreach { case (v, i) => idx.add(i.toLong, v) }
      val res = idx.search(q, k, ef = vecs.length + 16) // exhaustive
      val keys = res.map(_._1)
      val dists = res.map(_._2)
      res.length == math.min(k, vecs.length) &&
        keys.forall(kk => kk >= 0 && kk < vecs.length) &&
        keys.distinct.length == keys.length &&
        dists.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)) &&
        // exhaustive ef ⇒ exactly the brute-force k best
        keys.toSet == vecs.zipWithIndex
          .map { case (v, i) => (DistanceKernels.l2sq(q, v), i.toLong) }
          .sortBy(x => (x._1, x._2)).take(k).map(_._2).toSet
    })
  }

  test("rolling-min-hash: O(n) rolling update equals naive window recompute") {
    import graft.functions.RollingMinHash.{B, M}
    def naive(s: String, k: Int): Long = {
      val cps = s.codePoints().toArray
      val windows = math.max(cps.length - k + 1, 1)
      (0 until windows).map { i =>
        (0 until k).foldLeft(0L) { (acc, j) =>
          val c = if (i + j < cps.length) cps(i + j).toLong else 0L
          (acc * B + c) % M
        }
      }.min
    }
    val genStr = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.stringOfN(n, Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.const('的'), 1 -> Gen.const(' '))))
    check(Prop.forAll(genStr, Gen.chooseNum(1, 12)) { (s, k) =>
      graft.functions.RollingMinHash.compute(s, k) == naive(s, k)
    })
  }

  test("tombstoned keys never surface, at any k") {
    val vecs = (0 until 40).map(i => Array.fill(dim)(i.toFloat)).toList
    val idx = new HnswIndex(dim, "l2sq")
    vecs.zipWithIndex.foreach { case (v, i) => idx.add(i.toLong, v) }
    check(Prop.forAll(Gen.chooseNum(0, 39), Gen.chooseNum(1, 40)) { (victim, k) =>
      val idx2 = idx.compact() // fresh copy per trial
      idx2.remove(victim.toLong)
      !idx2.search(Array.fill(dim)(victim.toFloat), k, ef = 100).map(_._1)
        .contains(victim.toLong)
    })
  }
}
