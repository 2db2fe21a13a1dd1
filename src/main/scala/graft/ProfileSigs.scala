package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for the shingle-family builds (build_dedup_sigs,
  * build_shingle_index) and the batch BM25 join (q56): times each pipeline
  * stage through the noop sink to locate the dominant cost before
  * optimizing. Usage: SPARK_GRAFT_SF_DIR=<dir> java ... graft.ProfileSigs */
object ProfileSigs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scale_sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Dedup

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(label: String)(body: => Unit): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[sigs] $label%-26s ${runs.min}%.2f s (runs ${runs.map(x => f"$x%.2f").mkString(", ")})")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // --- dedup-sigs pipeline ------------------------------------------
    time("split_words_only")(noop(docs.select(col("doc_id"),
      split(trim(col("text")), "\\s+").as("w"))))
    time("shingle_array")(noop(docs.select(col("doc_id"),
      Dedup.shingleArray(col("text"), 3).as("g"))))
    time("shingles_exploded")(noop(Dedup.shingles(docs, "doc_id", "text", 3)))
    time("hashed_shingles")(noop(Dedup.hashedShingles(docs, "doc_id", "text", 3)))
    time("minhash_signatures")(noop(
      Dedup.minHashSignatures(docs, "doc_id", "text", 3, 8)))
    time("sigs_write_parquet") {
      Dedup.minHashSignatures(docs, "doc_id", "text", 3, 8)
        .write.mode("overwrite").parquet("/tmp/profile_sigs_out")
    }
    time("shingles_write_bucketed") {
      val nBuckets = 32
      Dedup.hashedShingles(docs, "doc_id", "text", 3)
        .repartition(nBuckets, pmod(hash(col("shingle")), lit(nBuckets)))
        .write.mode("overwrite").parquet("/tmp/profile_shingles_out")
    }

    // --- span-removal (build_clean_corpus) stages ----------------------
    {
      val words = split(trim(col("text")), "\\s+")
      val toksOnly = docs
        .select(col("doc_id"), filter(words, t => length(t) > 0).as("__w"))
      time("spans_tokens_only")(noop(toksOnly))
      val nWin = size(col("__w")) - 8 + 1
      val winStarts = when(nWin >= 1, sequence(lit(1), nWin))
        .otherwise(array().cast("array<int>"))
      time("spans_window_hashes")(noop(toksOnly
        .select(col("doc_id"), posexplode(transform(winStarts,
          i => md5(concat_ws(" ", slice(col("__w"), i, lit(8))))))
          .as(Seq("start", "whash")))))
      time("spans_full")(noop(Dedup.removeDuplicatedSpans(
        docs, "doc_id", "text", 8, 2)))
      val wins = toksOnly
        .select(col("doc_id"), posexplode(transform(winStarts,
          i => md5(concat_ws(" ", slice(col("__w"), i, lit(8))))))
          .as(Seq("start", "whash")))
        .localCheckpoint()
      val hot = wins.groupBy(col("whash")).agg(count(lit(1)).as("__occ"))
        .where(col("__occ") >= 2).select(col("whash"))
      val covered = wins.join(hot, "whash")
        .select(col("doc_id"), explode(sequence(col("start"),
          col("start") + lit(7))).as("pos"))
        .distinct()
      println(s"[sigs] wins rows = ${wins.count()}; hot = ${hot.count()}; " +
        s"covered = ${covered.count()}; covered docs = ${covered.select(col("doc_id")).distinct().count()}")
    }

    // --- q56 pipeline --------------------------------------------------
    val dirTag = Integer.toHexString(sfDir.hashCode)
    time("q56_full")(noop(SparkEntry.queries("q56_bm25_join")(spark, sfDir)))
    graft.index.TermIndex.get(s"q53_term_$dirTag").foreach { e =>
      val postings = spark.read.parquet(e.path)
      time("q56_postings_scan")(noop(postings.select(col("term"),
        col(e.idCol), col("tf"), col("dl"))))
      // the searchJoin stages, replicated (TextSearch.bm25JoinScored is the
      // shipped tail; these mirror its internals to attribute the cost)
      val queries = docs.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          slice(graft.ops.TextSearch.tokens(col("text")), 1, 3).as("terms"))
      val qterms = queries
        .select(col("qid"), explode(col("terms")).as("term")).distinct()
        .localCheckpoint()
      println(s"[sigs] qterms rows = ${qterms.count()}")
      val filtered = postings
        .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"), "left_semi")
      time("q56_semi_join")(noop(filtered))
      println(s"[sigs] filtered posting rows = ${filtered.count()}")
      val df56 = filtered.groupBy(col("term"))
        .agg(count(lit(1)).cast("double").as("df"))
      val stats = spark.range(1)
        .select(lit(e.nDocs).as("n"), lit(e.avgDl).as("avgdl"))
      val contrib = filtered
        .join(broadcast(df56), "term")
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
        .withColumn("c",
          col("idf") * (col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      time("q56_contrib")(noop(contrib))
      val joined = contrib.join(qterms, "term")
      time("q56_candidate_join")(noop(joined))
      println(s"[sigs] candidate rows = ${joined.count()}")
      val scored = joined
        .groupBy(col("qid"), col(e.idCol))
        .agg(round(aggregate(
          transform(sort_array(collect_list(struct(col("term"), col("c")))),
            x => x.getField("c")),
          lit(0.0), (acc, v) => acc + v), 6).as("score"))
      time("q56_scored_agg")(noop(scored))
      println(s"[sigs] scored rows = ${scored.count()}")
    }
    spark.stop()
  }
}
