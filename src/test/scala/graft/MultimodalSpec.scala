package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Multimodal

class MultimodalSpec extends GraftSparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromText(
    Seq((1L, "hello world"), (2L, "a"), (3L, "")).toDF("doc_id", "text"))

  test("fromText produces the canonical media schema (binary payload + type)") {
    assert(media.schema.fieldNames.toSeq == Seq("doc_id", "media", "media_type"))
    assert(media.schema("media").dataType == BinaryType)
    val r = media.orderBy($"doc_id").head()
    assert(new String(r.getAs[Array[Byte]]("media"), "UTF-8") == "hello world")
  }

  test("decode appends typed metadata + an 8-dim feature vector per row") {
    val out = Multimodal.decode(media).orderBy($"doc_id").collect()
    assert(out.length == 3)
    val first = out.head
    // stub decode is deterministic: dims from leading bytes ('h'=104,'e'=101)
    def feats(r: org.apache.spark.sql.Row): Seq[Float] =
      r.getSeq[Float](r.fieldIndex("features"))
    assert(first.getAs[Int]("width") == 1 + ('h' & 0x7f))
    assert(first.getAs[Int]("height") == 1 + ('e' & 0x7f))
    assert(feats(first).length == 8)
    // empty payload decodes to zeros, not a crash
    assert(out(2).getAs[Int]("width") == 0)
    assert(feats(out(2)).forall(_ == 0f))
    // decode twice = identical (pure function of bytes)
    val again = Multimodal.decode(media).orderBy($"doc_id").collect()
    assert(out.map(feats).toSeq == again.map(feats).toSeq)
  }

  test("resize bounds the longer side, preserving integer dims >= 1") {
    val decoded = Multimodal.decode(media)
    val resized = Multimodal.resize(decoded, 16).collect()
    resized.filter(_.getAs[Int]("width") > 0).foreach { r =>
      assert(r.getAs[Int]("width") <= 16 && r.getAs[Int]("height") <= 16)
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("height") >= 1)
    }
  }

  test("frameSample slices real bytes: fixed frames, every Nth kept") {
    val df = Seq((1L, "abcdefghij".getBytes("UTF-8"))).toDF("id", "payload")
    val frames = df.select(
      Multimodal.frameSample($"payload", 4, 2).as("f")).head().getSeq[Array[Byte]](0)
    // frames of 4 bytes: [abcd][efgh][ij] -> keep index 0 and 2
    assert(frames.length == 2)
    assert(new String(frames(0), "UTF-8") == "abcd")
    assert(new String(frames(1), "UTF-8") == "ij")
  }

  test("decoded features feed the vector kernels (multimodal -> ANN pipeline)") {
    val feats = Multimodal.decode(media).filter($"doc_id" < 3)
      .select($"doc_id", $"features")
    val paired = feats.as("a").crossJoin(feats.as("b"))
      .select(graft.functions.vector.array_distance_sq(
        col("a.features"), col("b.features")).as("d"))
    val ds = paired.as[Double].collect()
    assert(ds.length == 4 && ds.count(_ == 0.0) >= 2) // self-pairs at 0
  }
}
