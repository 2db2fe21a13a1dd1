package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-layout clustering for scan pruning — the lakehouse OPTIMIZE ZORDER
  * analog. Writing 100 TB ordered by a Morton (Z-order) interleave of two
  * dimensions makes every parquet file's min/max footer stats TIGHT on BOTH
  * dimensions at once, so predicates on either column skip files at the
  * listing level; a plain sort gives that for only its leading column.
  * Pure bit-twiddling column algebra (codegen, no UDF), identical in any
  * engine with integer shifts. */
object Layout {

  /** Spread the low 16 bits of `x` into the even bit positions (classic
    * Morton magic-mask sequence). */
  def spread16(x: Column): Column = {
    val steps = Seq(8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L,
      1 -> 0x55555555L)
    steps.foldLeft(x.cast(LongType).bitwiseAND(lit(0xFFFFL))) {
      case (v, (sh, mask)) => v.bitwiseOR(shiftleft(v, sh)).bitwiseAND(lit(mask))
    }
  }

  /** 32-bit Z-value interleaving the low 16 bits of two non-negative
    * dimensions (caller bucketizes into 0..65535 — e.g. `col % 65536` or a
    * range-rank). a owns the even bits, b the odd. */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Write `df` clustered along the Z-curve of two bucketized dimensions:
    * range-partition by z-value (so files cover disjoint curve segments),
    * sort within partitions, one file per partition. Both dimensions end up
    * with tight per-file min/max — the pruning contract LayoutSpec pins. */
  def zorderWrite(df: DataFrame, dimA: Column, dimB: Column, path: String,
      numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    df.withColumn("__z", zValue(dimA, dimB))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.parquet(path)
  }
}
