package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document chunking for training/RAG pipelines: split each document into
  * overlapping token windows with stable per-document chunk ids.
  *
  * Chunk i covers tokens [i·stride, i·stride + chunkTokens) with
  * stride = chunkTokens − overlap; the chunk count is
  * max(⌈(n − overlap)/stride⌉, 1), so every token is covered, consecutive
  * chunks share `overlap` tokens, and even an empty/short document yields
  * exactly one (possibly short) chunk.
  *
  * Everything is integer arithmetic + array slicing + string join — one
  * narrow pass (explode only multiplies rows by the per-doc chunk count),
  * no shuffle, bit-exact in the DuckDB oracle. */
object Chunking {

  /** Output: (idCol, chunk_id BIGINT 0.., chunk_text, n_tokens BIGINT). */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens; got chunkTokens=$chunkTokens overlap=$overlap")
    val stride = chunkTokens - overlap
    // ⌈(n − overlap)/stride⌉ via integer floor((n − overlap + stride − 1)/stride);
    // double division of small ints is exact, floor returns LONG
    val nChunks = greatest(
      floor((size(col("__toks")) - lit(overlap) + lit(stride - 1)) / lit(stride)),
      lit(1L))
    docs
      .select(col(idCol), TextSearch.tokens(col(textCol)).as("__toks"))
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1)))
      .select(
        col(idCol),
        col("chunk_id"),
        concat_ws(" ",
          slice(col("__toks"), (col("chunk_id") * stride + 1).cast(IntegerType),
            lit(chunkTokens))).as("chunk_text"),
        size(slice(col("__toks"), (col("chunk_id") * stride + 1).cast(IntegerType),
          lit(chunkTokens))).cast(LongType).as("n_tokens"))
  }
}
