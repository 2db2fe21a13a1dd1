package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage decomposition of the bounded LSH miner (iteration tool,
  * like TimeQuery — not part of the driver contract). */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[lsh] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val nonNull = df.where(col("embedding").isNotNull)
      val n = time("count")(nonNull.count())
      val rowsPerBand = graft.ops.Dedup.lshGeometry(n, 32)
      val nPlanes = 4 * rowsPerBand
      println(s"[lsh] n=$n r=$rowsPerBand planes=$nPlanes")
      val sig = time("sig checkpoint") {
        graft.ops.Dedup.lshBandKeysSig(nonNull, "vec_id", "embedding",
          nPlanes).localCheckpoint()
      }
      val buckets = time("buckets agg") {
        graft.ops.Dedup.lshBandExplodePub(sig, "vec_id", nPlanes, rowsPerBand)
          .groupBy(col("band_id"), col("band_val"))
          .agg(sort_array(collect_list(col("vec_id"))).as("ids"))
          .localCheckpoint()
      }
      val cand = time("cand distinct") {
        buckets
          .select(explode(flatten(transform(col("ids"), (x, i) =>
            transform(slice(col("ids"), i + lit(2), lit(8)),
              y => struct(x.as("a"), y.as("b")))))).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
          .distinct()
          .localCheckpoint()
      }
      println(s"[lsh] candidates=${cand.count()}")
      val verified = time("verify join") {
        val va = broadcast(sig.select(col("vec_id").as("a"), col("embedding").as("va")))
        val vb = broadcast(sig.select(col("vec_id").as("b"), col("embedding").as("vb")))
        cand.join(va, "a").join(vb, "b")
          .select(col("a"), col("b"),
            graft.functions.vector.array_cosine_distance(col("va"), col("vb")).as("dist"))
          .where(col("dist") <= 0.8)
          .localCheckpoint()
      }
      println(s"[lsh] verified=${verified.count()}")
      time("topk window") {
        import org.apache.spark.sql.expressions.Window
        verified.withColumn("__rn", row_number().over(
            Window.partitionBy(col("a")).orderBy(col("dist"), col("b"))))
          .where(col("__rn") <= 3).drop("__rn")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
