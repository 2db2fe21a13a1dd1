package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stage decomposition for the per-row annotator family (q39 shape): times
  * each component of the PII query separately through the noop sink, plus
  * the two sort placements. This tool produced the round-17 sort-first
  * finding: a global orderBy's range partitioner SAMPLES by executing the
  * full child plan, so project-then-sort evaluates the expensive projection
  * twice (measured 6.1 s vs 3.1 s at the 100x cut) — the annotator queries
  * now sort the narrow input first and project after the exchange.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> java ... graft.ProfilePii */
object ProfilePii {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scale_sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = graft.ops.Redaction

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def piiOf(d: org.apache.spark.sql.DataFrame) = d.withColumn("pii_text",
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast(StringType), lit("@example.com"),
        lit(" call 555-"), lpad(pmod(col("doc_id"), lit(10000)).cast(StringType), 4, "0"),
        lit(" from 10.0.0."), pmod(col("doc_id"), lit(256)).cast(StringType)))
    val pii = piiOf(docs)
    def annotate(d: org.apache.spark.sql.DataFrame) =
      d.select(col("doc_id"), col("pii_text"), r.redact(col("pii_text")).as("__red"))
        .select(col("doc_id"),
          r.piiCount(col("pii_text"), "email").as("n_emails"),
          r.piiCount(col("pii_text"), "phone").as("n_phones"),
          r.piiCount(col("pii_text"), "ipv4").as("n_ips"),
          md5(col("__red")).as("red_md5"),
          length(col("__red")).cast(LongType).as("red_len"))

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[pii] $label%-24s ${runs.min}%.2f s (runs ${runs.map(x => f"$x%.2f").mkString(", ")})")
    }

    time("scan_only")(docs.select(col("doc_id"), col("text")))
    time("concat_only")(pii.select(col("doc_id"), col("pii_text")))
    time("counts_only")(pii.select(col("doc_id"),
      r.piiCount(col("pii_text"), "email").as("a"),
      r.piiCount(col("pii_text"), "phone").as("b"),
      r.piiCount(col("pii_text"), "ipv4").as("c")))
    time("redact_md5_len")(pii.select(col("doc_id"), col("pii_text"),
        r.redact(col("pii_text")).as("__red"))
      .select(col("doc_id"), md5(col("__red")).as("m"),
        length(col("__red")).cast(LongType).as("l")))
    time("annotate_no_sort")(annotate(pii))
    time("sort_last")(annotate(pii).orderBy(col("doc_id")))
    time("sort_first")(annotate(piiOf(docs.orderBy(col("doc_id")))))
    spark.stop()
  }
}
