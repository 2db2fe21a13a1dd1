package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling joins for hot keys (the "one boilerplate value with 10⁸
  * rows" problem). AQE's skew-join splitting handles sort-merge skew
  * automatically; salting is the shuffle-proof variant for when a single
  * key's rows must not land in one task at all. */
object Skew {

  /** Salted equi-join: the probe (large, skewed) side gets a deterministic
    * salt in [0, salts); the build side is replicated once per salt; the
    * join key becomes (key, salt), so any single hot key spreads over
    * `salts` partitions instead of one. Results are identical to a plain
    * equi-join on `key` — only the shuffle layout changes. Build-side cost:
    * `salts` copies, so size the factor to the skew, not to the cluster. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be positive")
    val salted = probe.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val expanded = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(expanded, Seq(key, "__salt")).drop("__salt")
  }
}
