package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import graft.functions.vector._
import graft.index.DistanceKernels

class VectorExpressionsSpec extends GraftSparkSpec {
  import spark.implicits._

  private def one(col: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(col).as[Double].head()

  private def arr(xs: Float*) = typedLit(xs.toArray)

  test("array_distance matches reference semantics (hnsw_result.test expected 0,1,1)") {
    assert(one(array_distance(arr(1f, 2f, 3f), arr(1f, 2f, 3f))) == 0.0)
    assert(one(array_distance(arr(1f, 2f, 3f), arr(1f, 2f, 4f))) == 1.0)
    assert(one(array_distance(arr(1f, 2f, 3f), arr(2f, 2f, 3f))) == 1.0)
  }

  test("l2sq, inner product, cosine basic values") {
    assert(one(array_distance_sq(arr(0f, 0f), arr(3f, 4f))) == 25.0)
    assert(one(array_inner_product(arr(1f, 2f, 3f), arr(4f, 5f, 6f))) == 32.0)
    assert(one(array_negative_inner_product(arr(1f, 2f, 3f), arr(4f, 5f, 6f))) == -32.0)
    assert(math.abs(one(array_cosine_similarity(arr(1f, 0f), arr(0f, 1f)))) < 1e-12)
    assert(one(array_cosine_distance(arr(1f, 0f), arr(1f, 0f))) == 0.0)
  }

  test("cosine zero-vector edge cases mirror usearch (both zero → sim 1; one zero → sim 0)") {
    assert(one(array_cosine_similarity(arr(0f, 0f), arr(0f, 0f))) == 1.0)
    assert(one(array_cosine_similarity(arr(0f, 0f), arr(1f, 2f))) == 0.0)
    assert(one(array_cosine_distance(arr(0f, 0f), arr(0f, 0f))) == 0.0)
    assert(one(array_cosine_distance(arr(0f, 0f), arr(1f, 2f))) == 1.0)
  }

  test("NULL array and NULL element yield NULL") {
    val df = Seq((Some(Array(1f, 2f)), None: Option[Array[Float]])).toDF("a", "b")
    assert(df.select(array_distance($"a", $"b")).first().isNullAt(0))
    val withNullElem = spark.sql("SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) a, " +
      "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) b")
    assert(withNullElem.select(array_distance($"a", $"b")).first().isNullAt(0))
  }

  test("dimension mismatch raises") {
    val ex = intercept[Exception] {
      Seq(1).toDF("x").select(array_distance(arr(1f, 2f), arr(1f, 2f, 3f))).collect()
    }
    assert(ex.getMessage.contains("dimension mismatch") ||
      ex.getCause != null && ex.getCause.getMessage.contains("dimension mismatch"))
  }

  test("SQL registration works and agrees with Column API") {
    graft.functions.vector.registerAll(spark)
    val r = spark.sql(
      "SELECT array_distance(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(4 AS FLOAT), CAST(6 AS FLOAT)))").as[Double].head()
    assert(r == 5.0)
  }

  test("property: expression results agree with scalar kernels; metric axioms hold") {
    val genVec = Gen.listOfN(8, Gen.chooseNum(-100f, 100f)).map(_.toArray)
    val prop = Prop.forAll(genVec, genVec) { (a: Array[Float], b: Array[Float]) =>
      val expected = DistanceKernels.l2sq(a, b)
      expected >= 0.0 &&
        DistanceKernels.l2sq(b, a) == expected &&            // symmetry
        DistanceKernels.l2sq(a, a) == 0.0 &&                 // identity
        math.abs(DistanceKernels.cosineSimilarity(a, b)) <= 1.0 + 1e-9
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
    // one Spark-side spot check that the Expression path equals the kernel
    val a = Array(1.5f, -2.25f, 3.125f, 0.0f)
    val b = Array(-7.5f, 0.25f, 9.0f, 1.0f)
    assert(one(array_distance_sq(typedLit(a), typedLit(b))) == DistanceKernels.l2sq(a, b))
    assert(one(array_cosine_distance(typedLit(a), typedLit(b))) == DistanceKernels.cosineDistance(a, b))
    assert(one(array_inner_product(typedLit(a), typedLit(b))) == DistanceKernels.dot(a, b))
  }
}
