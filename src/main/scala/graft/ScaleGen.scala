package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the scaling-shape record: replicates the driver's
  * sf0.1 tables `copies`× into a new sf directory with the key spaces kept
  * DISJOINT and the within-copy structure intact, so every query family's
  * work grows linearly by construction:
  *
  *  - fact keys shift by `copy * 10^10` (customer/orders/lineitem keys
  *    co-shift, so joins match within a copy exactly as at sf0.1);
  *  - dimension tables (region/nation/supplier/part) stay single-copy —
  *    fact-only scaling, like growing a cluster's data under fixed
  *    reference data; dim joins fan out 10× per key, linearly;
  *  - document text is word-suffixed per copy (every shingle differs
  *    across copies, so MinHash/Jaccard/SimHash miners see each copy as
  *    fresh material and pair volume scales LINEARLY with the planted
  *    structure — naive replication would make every row a 10-way
  *    near-dup and explode pair mining quadratically, measuring the
  *    fixture, not the plan); n_chars is recomputed from the new text;
  *  - embeddings shift by a copy-specific constant vector (within-copy
  *    distances are translation-invariant — preserved bit-for-bit;
  *    cross-copy distances are large, so ANN/near-dup structure scales
  *    linearly too).
  *
  * Usage: `runMain graft.ScaleGen <srcDir> <destDir> [copies]`. */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dest = if (args.length > 1) args(1) else "scale_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val stride = 10_000_000_000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dest/$name.parquet")
      println(s"[scale] $name: ${spark.read.parquet(s"$dest/$name.parquet").count()} rows")
    }
    def replicate(name: String)(copyK: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(name)
      write(name, (0 until copies).map(k => copyK(base, k)).reduce(_ unionAll _))
    }

    // dimensions: verbatim single copy
    Seq("region", "nation", "supplier", "part").foreach(n => write(n, read(n)))

    replicate("customer") { (df, k) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(k * stride))
    }
    replicate("orders") { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(k * stride))
        .withColumn("o_custkey", col("o_custkey") + lit(k * stride))
    }
    replicate("lineitem") { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(k * stride))
    }
    replicate("events") { (df, k) =>
      df.withColumn("event_id", col("event_id") + lit(k * stride))
        .withColumn("user_id", col("user_id") + lit(k * stride))
    }
    replicate("documents") { (df, k) =>
      val text =
        if (k == 0) col("text")
        else array_join(
          transform(split(col("text"), " "), w => concat(w, lit(k.toString))),
          " ")
      df.withColumn("doc_id", col("doc_id") + lit(k * stride))
        .withColumn("text", text)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    replicate("embeddings") { (df, k) =>
      val emb =
        if (k == 0) col("embedding")
        else transform(col("embedding"),
          (x, i) => (x + ((lit(k) * 31 + i * 7) % 13 - 6) * 0.7f).cast("float"))
      df.withColumn("vec_id", col("vec_id") + lit(k * stride))
        .withColumn("embedding", emb)
    }
    spark.stop()
    println(s"[scale] wrote $dest ($copies copies of $src)")
  }
}
