package graft.index

/** Scalar distance kernels over float vectors, shared by the HNSW index and
  * the brute-force paths. Same math as the Catalyst expressions in
  * [[graft.functions]] — sequential double accumulation — so index results and
  * expression results agree bit-for-bit.
  *
  * Metric names follow the reference (duckdb_vss,
  * reference src/hnsw/hnsw_index.cpp:232-245): "l2sq" (default), "cosine",
  * "ip"; plus "l2" for the SQL-function variant (reference README.md:59 notes
  * array_distance is the √ of the l2sq index metric — ordering-equivalent).
  */
object DistanceKernels extends Serializable {

  def l2sq(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
    acc
  }

  def l2(a: Array[Float], b: Array[Float]): Double = math.sqrt(l2sq(a, b))

  def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** Zero-vector rule per the reference kernels
    * (reference src/include/usearch/index_plugins.hpp:1021-1025). */
  def cosineSimilarity(a: Array[Float], b: Array[Float]): Double = {
    var dotAcc = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dotAcc += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 && nb == 0.0) 1.0
    else if (na == 0.0 || nb == 0.0) 0.0
    else dotAcc / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineDistance(a: Array[Float], b: Array[Float]): Double =
    1.0 - cosineSimilarity(a, b)

  /** Distance function for a metric name; smaller = closer for all metrics. */
  def forMetric(metric: String): (Array[Float], Array[Float]) => Double = metric match {
    case "l2sq"   => l2sq
    case "l2"     => l2
    case "cosine" => cosineDistance
    case "ip"     => (a, b) => -dot(a, b)
    case other    => throw new IllegalArgumentException(
      s"Unknown metric '$other'; expected one of l2sq, l2, cosine, ip")
  }
}
