package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic splitting / sampling for training-data pipelines.
  *
  * Assignment is a pure function of the row's id (md5 → 8-bit bucket), so it
  * is reproducible across runs, engines, and cluster layouts — unlike
  * `df.sample` / `rand()`, whose output depends on partitioning. That makes
  * the train/val/test membership of every document stable as the corpus is
  * re-ingested, which is what leakage audits need. All column algebra
  * (whole-stage codegen, no UDF, no shuffle); the bucket math uses only
  * string ops exact in DuckDB 1.0 SQL (no conv()), so it has an exact oracle.
  */
object Sampling {

  /** 0..255 bucket from the first two hex chars of md5(id). instr-based hex
    * decode (strpos in DuckDB) — identical semantics, both 1-based. */
  def hashBucket(id: Column): Column = {
    def hexVal(c: Column): Column = instr(lit("0123456789abcdef"), c) - 1
    val h = md5(id.cast(StringType))
    (hexVal(substring(h, 1, 1)) * 16 + hexVal(substring(h, 2, 1))).cast(IntegerType)
  }

  /** Deterministic train/val/test assignment: 205/25/26 buckets of 256
    * (~80/10/10). Stable under repartitioning and re-ingestion. */
  def split(id: Column): Column = {
    val b = hashBucket(id)
    when(b < 205, "train").when(b < 230, "val").otherwise("test")
  }

  /** Annotate with the split column. */
  def withSplit(df: DataFrame, idCol: String, splitCol: String = "split"): DataFrame =
    df.withColumn(splitCol, split(col(idCol)))

  /** Leakage-safe split: near-duplicate documents must land on the SAME
    * side of a train/eval boundary, or the eval set silently contains
    * paraphrases of training documents. Per-doc hash splits ([[split]])
    * leak exactly this way; here the split key is the document's dedup
    * CLUSTER (connected components over the near-dup pair graph), so a
    * whole duplicate cluster moves together — the id-hash rule applied to
    * the cluster's canonical min-id.
    *
    * Scale shape: components iterate over edge-touched vertices only
    * (duplicate-set-sized state); the final assignment is one keyed join
    * of docs against their cluster label. Isolated docs split by their own
    * id, identical to [[split]]. */
  def clusterSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      splitCol: String = "split"): DataFrame = {
    // internal label column renamed before the join: callers may well carry
    // their own `comp` from an earlier components pass
    val comps = Components.connectedComponents(docs.select(col(idCol)), pairs)
      .withColumnRenamed("comp", "__css_comp")
    docs.join(comps, Seq(idCol))
      .withColumn(splitCol, split(col("__css_comp")))
      .drop("__css_comp")
  }

  /** Deterministic ~`rate` sample: keep rows whose bucket falls under
    * rate×256. A narrow filter — pushes down to the scan when `idCol` is a
    * stored column, and never needs a shuffle or a seed. */
  def deterministicSample(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    df.filter(hashBucket(col(idCol)) < math.round(rate * 256).toInt)
  }

  /** Keep rates that calibrate the corpus to target stratum PROPORTIONS by
    * downsampling over-represented strata only (no upsampling): with
    * K = min_s(n_s / target_s), stratum s keeps rate target_s·K/n_s — the
    * bottleneck stratum keeps everything, every other stratum is thinned
    * until the kept mixture matches `targets`. The stratum count aggregate
    * is collected driver-side: it is bounded by the number of DISTINCT
    * strata (domains/languages), not data size. */
  def mixtureRates(df: DataFrame, stratumCol: String,
      targets: Map[String, Double]): Map[String, Double] = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be positive proportions")
    val counts = df
      .where(col(stratumCol).isin(targets.keys.toSeq: _*))
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val absent = targets.keys.filterNot(counts.contains)
    require(absent.isEmpty,
      s"target strata absent from the data (kept mixture could never match " +
        s"targets): ${absent.mkString(",")}")
    val k = targets.map { case (s, t) => counts(s) / t }.min
    targets.map { case (s, t) => s -> t * k / counts(s) }
  }

  /** Deterministic mixture calibration: [[mixtureRates]] applied through
    * [[stratifiedSample]] — reproducible across runs and engines. */
  def calibrateMixture(df: DataFrame, idCol: String, stratumCol: String,
      targets: Map[String, Double]): DataFrame =
    stratifiedSample(df, idCol, stratumCol, mixtureRates(df, stratumCol, targets))

  /** Per-stratum deterministic sampling: one rate per stratum value (e.g.
    * downsample web text, keep all books). Unmatched strata keep rate 0. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double]): DataFrame = {
    val rateCol = rates.foldLeft(lit(0.0)) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)).cast(DoubleType) < rateCol * 256.0)
  }
}
