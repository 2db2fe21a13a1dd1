package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

class SkewSpec extends GraftSparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on heavily skewed keys") {
    // 90% of probe rows share one hot key
    val probe = (0 until 5000).map { i =>
      (i.toLong, if (i % 10 == 0) s"k${i % 7}" else "HOT")
    }.toDF("id", "key")
    val build = Seq(("HOT", 1), ("k0", 2), ("k3", 3), ("missing", 4))
      .toDF("key", "payload")

    val plain = probe.join(build, "key")
      .select($"id", $"key", $"payload").orderBy($"id").collect()
    val salted = Skew.saltedJoin(probe, build, "key", salts = 8)
      .select($"id", $"key", $"payload").orderBy($"id").collect()
    assert(salted.toSeq == plain.toSeq)
    assert(salted.length == 4500 + probe.filter($"key".isin("k0", "k3")).count())
  }

  test("the hot key's rows spread over multiple salt partitions") {
    val probe = (0 until 1000).map(i => (i.toLong, "HOT")).toDF("id", "key")
    val saltCounts = probe.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(8)))
      .groupBy($"__salt").count().collect()
    assert(saltCounts.length > 4) // spread, not one bucket
    assert(saltCounts.map(_.getLong(1)).max < 1000)
  }
}
