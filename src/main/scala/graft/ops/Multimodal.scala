package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for large-scale training-data
  * pipelines: media payloads travel as opaque `binary` columns with typed
  * metadata, and all media-touching transforms are partition-parallel,
  * narrow (no shuffle), and batch-shaped.
  *
  * The Spark-side plumbing — schemas, binary columns, mapPartitions batch
  * iteration, frame slicing — is real and tested. The codec itself is a
  * clearly marked STUB (`decodeStub`): this container has no image/audio
  * libraries, so the "decode" derives deterministic fake dimensions and
  * features from the bytes. A production deployment swaps `decodeStub` for
  * a real codec call; nothing else changes. */
object Multimodal {

  /** Canonical media-table schema: id + opaque payload + declared type. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false)))

  /** Build a media table from a text table by treating UTF-8 bytes as the
    * opaque payload (test fixture / fallback modality). */
  def fromText(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast(LongType).as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("text/plain").as("media_type"))

  // ======================================================== decode (STUB)

  /** STUB decode. A real implementation calls an image/audio codec here;
    * this one derives deterministic pseudo-metadata from the payload bytes
    * so the full pipeline (schema, batching, downstream feature use) is
    * exercised end-to-end: width/height from the leading bytes, an 8-dim
    * float "feature vector" from the payload's md5. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) =
    if (bytes == null || bytes.isEmpty) (0, 0, Array.fill(8)(0f))
    else {
      val w = 1 + (bytes(0) & 0x7f)
      val h = 1 + (bytes(if (bytes.length > 1) 1 else 0) & 0x7f)
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val feats = Array.tabulate(8)(i => (md(i) & 0xff) / 255.0f)
      (w, h, feats)
    }

  /** Decode pass: one batch-shaped partition iteration appending typed
    * metadata + a feature vector usable with the engine's distance kernels
    * and HNSW index. Narrow (partitioning preserved, no shuffle); at 100TB
    * this is the mapInPandas/mapPartitions shape — payload bytes never leave
    * their partition. */
  def decode(df: DataFrame, binCol: String = "media"): DataFrame = {
    val outSchema = df.schema
      .add("width", IntegerType, nullable = false)
      .add("height", IntegerType, nullable = false)
      .add("features", ArrayType(FloatType, containsNull = false), nullable = false)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val (w, h, f) = decodeStub(bytes)
        Row.fromSeq(r.toSeq :+ w :+ h :+ f.toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** "Resize" on the stub representation: rescale the declared dimensions,
    * keep features (a real impl re-encodes pixels). Pure column algebra. */
  def resize(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(col("width"), col("height"), lit(1)))
    df.withColumn("width", greatest(lit(1), floor(col("width") * scale).cast(IntegerType)))
      .withColumn("height", greatest(lit(1), floor(col("height") * scale).cast(IntegerType)))
  }

  // =================================================== frame ops (REAL)

  /** Split a binary payload into fixed-size frames and keep every Nth —
    * the video frame-sampling shape. Real byte slicing via codegen'd column
    * algebra (substr on binary), no UDF, no shuffle. */
  def frameSample(bin: Column, frameBytes: Int, everyN: Int): Column = {
    require(frameBytes > 0 && everyN > 0)
    val nFrames = ceil(length(bin).cast(DoubleType) / frameBytes).cast(IntegerType)
    val idxs = filter(
      sequence(lit(0), greatest(nFrames - 1, lit(0))),
      i => i % everyN === 0)
    when(length(bin) > 0,
      transform(idxs, i => bin.substr(i * frameBytes + 1, lit(frameBytes))))
      .otherwise(array().cast(ArrayType(BinaryType)))
  }

  /** Byte-level metadata (exact, oracle-friendly): payload size and content
    * hash straight off the binary column. */
  def withByteStats(df: DataFrame, binCol: String = "media"): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast(LongType))
      .withColumn("content_md5", md5(col(binCol)))
}
