package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.index.IndexCatalog

/** Scale-aware build defaults (IndexCatalog.AutoScaleConfKey): the policy
  * resolution only — which knobs scale, when, and who wins. The recall
  * motivation is measured, not spec'd (ProfileRecall at sf10: defaults read
  * recall@10 0.818 at ef=64 on 200k cosine vectors; M=32/efC=256 read
  * 0.994 at ef=32 — specs stay fast by driving the threshold conf down
  * instead of building 65k+ graphs). */
class AutoScaleSpec extends GraftSparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  override def beforeAll(): Unit = {
    // 200 deterministic dim-4 vectors — tiny build, policy decided by the
    // lowered threshold conf, never by real scale
    val emb = (0 until 200).map { i =>
      (i.toLong, Array(i.toFloat, (i % 7).toFloat, (i % 13).toFloat, 1.0f))
    }.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    Graft.registerTable(spark, "ascale_t", emb)
  }

  override def afterAll(): Unit = {
    spark.conf.unset(IndexCatalog.AutoScaleConfKey)
    spark.conf.unset(IndexCatalog.AutoScaleThresholdConfKey)
  }

  private def built(name: String, options: Map[String, String] = Map.empty,
      sharded: Boolean = false): graft.index.HnswOptions = {
    IndexCatalog.dropIndex(name)
    val e = IndexCatalog.createIndex(spark, name, "ascale_t", "embedding",
      options, sharded = sharded)
    val o = e.options
    IndexCatalog.dropIndex(name)
    o
  }

  test("conf off (default): reference defaults at any n") {
    spark.conf.unset(IndexCatalog.AutoScaleConfKey)
    spark.conf.set(IndexCatalog.AutoScaleThresholdConfKey, "50")
    val o = built("ascale_off")
    assert(o.m == 16 && o.efConstruction == 128)
  }

  test("conf on above threshold: unset knobs scale to (32, 256), m0 follows 2*M") {
    spark.conf.set(IndexCatalog.AutoScaleConfKey, "true")
    spark.conf.set(IndexCatalog.AutoScaleThresholdConfKey, "50")
    val o = built("ascale_on")
    assert(o.m == IndexCatalog.AutoScaleM)
    assert(o.efConstruction == IndexCatalog.AutoScaleEfC)
    assert(o.m0 == 2 * IndexCatalog.AutoScaleM)
  }

  test("conf on below threshold: untouched") {
    spark.conf.set(IndexCatalog.AutoScaleConfKey, "true")
    spark.conf.set(IndexCatalog.AutoScaleThresholdConfKey, "1000")
    val o = built("ascale_small")
    assert(o.m == 16 && o.efConstruction == 128)
  }

  test("explicit knob wins; the unset sibling still scales") {
    spark.conf.set(IndexCatalog.AutoScaleConfKey, "true")
    spark.conf.set(IndexCatalog.AutoScaleThresholdConfKey, "50")
    val o = built("ascale_m", Map("m" -> "8"))
    assert(o.m == 8)
    assert(o.efConstruction == IndexCatalog.AutoScaleEfC)
    val o2 = built("ascale_efc", Map("ef_construction" -> "64"))
    assert(o2.efConstruction == 64)
    assert(o2.m == IndexCatalog.AutoScaleM)
  }

  test("both knobs explicit: no count scan, nothing scales") {
    spark.conf.set(IndexCatalog.AutoScaleConfKey, "true")
    spark.conf.set(IndexCatalog.AutoScaleThresholdConfKey, "50")
    val o = built("ascale_both", Map("m" -> "8", "ef_construction" -> "64"))
    assert(o.m == 8 && o.efConstruction == 64)
  }

  test("an explicit M0 is preserved alongside a scaled M") {
    spark.conf.set(IndexCatalog.AutoScaleConfKey, "true")
    spark.conf.set(IndexCatalog.AutoScaleThresholdConfKey, "50")
    val o = built("ascale_m0", Map("m0" -> "12"))
    assert(o.m == IndexCatalog.AutoScaleM && o.m0 == 12)
  }

  test("sharded builds never auto-scale") {
    spark.conf.set(IndexCatalog.AutoScaleConfKey, "true")
    spark.conf.set(IndexCatalog.AutoScaleThresholdConfKey, "50")
    val o = built("ascale_sh", sharded = true)
    assert(o.m == 16 && o.efConstruction == 128)
  }
}
