package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage decomposition of q24 (exact shingle-Jaccard mining through
  * the bucketed ShingleIndex artifact) — iteration tool, like TimeQuery; not
  * part of the driver contract. Each stage materializes via localCheckpoint
  * so its time is its own, then the uncut composed query is timed for
  * comparison (the checkpoint boundaries cost pipelining, so the composed
  * number is the real one; the stages apportion it). */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scale_sf10")
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
      println(f"[jac] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    Graft.registerTable(spark, "pj_docs",
      spark.read.parquet(s"$sfDir/documents.parquet"))
    time("shingle index build") {
      graft.index.ShingleIndex.drop("pj_sh")
      graft.index.ShingleIndex.create(spark, "pj_sh", "pj_docs", "doc_id", "text")
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val sh0 = graft.index.ShingleIndex.shingles(spark, "pj_sh")
      println(s"[jac] shingle rows: ${time("shingle scan count")(sh0.count())}")
      val capped = time("df-cap anti-join (ckpt)") {
        val hot = sh0.groupBy(col("shingle"))
          .agg(count(lit(1)).as("__df"))
          .where(col("__df") > 100)
          .select(col("shingle"))
        sh0.join(broadcast(hot), Seq("shingle"), "left_anti").localCheckpoint()
      }
      val inter = time("self-join + pair agg (ckpt)") {
        val a = capped.select(col("doc_id").as("a"), col("shingle"))
        val b = capped.select(col("doc_id").as("b"), col("shingle"))
        a.join(b, "shingle").where(col("a") < col("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_inter"))
          .localCheckpoint()
      }
      println(s"[jac] candidate pairs: ${inter.count()}")
      time("count joins + filter") {
        val counts = capped.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        inter
          .join(counts.select(col("doc_id").as("a"), col("n").as("n_a")), "a")
          .join(counts.select(col("doc_id").as("b"), col("n").as("n_b")), "b")
          .select(col("a"), col("b"),
            (col("n_inter").cast("double") /
              (col("n_a") + col("n_b") - col("n_inter")).cast("double")).as("jaccard"))
          .where(col("jaccard") >= 0.05)
          .count()
      }
      time("composed q24 (uncut)") {
        graft.ops.Dedup.ngramJaccardPairsFromShingles(sh0,
          "doc_id", minJaccard = 0.05, maxShingleDocFreq = 100)
          .orderBy(col("a"), col("b")).count()
      }
      time("composed q24 (bcast counts)") {
        val capped2 = {
          val hot = sh0.groupBy(col("shingle"))
            .agg(count(lit(1)).as("__df"))
            .where(col("__df") > 100)
            .select(col("shingle"))
          sh0.join(broadcast(hot), Seq("shingle"), "left_anti")
        }
        val counts = capped2.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
          .localCheckpoint()
        val a = capped2.select(col("doc_id").as("a"), col("shingle"))
        val b = capped2.select(col("doc_id").as("b"), col("shingle"))
        val inter2 = a.join(b, "shingle").where(col("a") < col("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_inter"))
        inter2
          .join(broadcast(counts.select(col("doc_id").as("a"), col("n").as("n_a"))), "a")
          .join(broadcast(counts.select(col("doc_id").as("b"), col("n").as("n_b"))), "b")
          .select(col("a"), col("b"),
            (col("n_inter").cast("double") /
              (col("n_a") + col("n_b") - col("n_inter")).cast("double")).as("jaccard"))
          .where(col("jaccard") >= 0.05)
          .orderBy(col("a"), col("b")).count()
      }
    }
    spark.stop()
  }
}
