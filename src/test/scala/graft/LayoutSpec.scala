package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

class LayoutSpec extends GraftSparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (hand-checked Morton codes)") {
    def localMorton(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 0L),
      (65535L, 65535L), (12345L, 54321L))
    val got = cases.toDF("a", "b")
      .select(Layout.zValue($"a", $"b")).as[Long].collect().toSeq
    assert(got == cases.map { case (a, b) => localMorton(a, b) })
  }

  test("zorderWrite gives tight per-file min/max on BOTH dimensions") {
    // a uniform 64x64 grid: dims a and b are independent, so a plain write
    // cannot be tight on both — the Z-curve tiles the plane
    val grid = spark.range(0, 4096)
      .select(($"id" % 64).as("a"), ($"id" / 64).cast("long").as("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    Layout.zorderWrite(grid, $"a", $"b", s"$dir/z", numFiles = 16)

    val perFile = spark.read.parquet(s"$dir/z")
      .withColumn("f", input_file_name())
      .groupBy($"f")
      .agg((max($"a") - min($"a")).as("ra"), (max($"b") - min($"b")).as("rb"))
      .agg(avg($"ra"), avg($"rb")).as[(Double, Double)].head()
    // 16 files over a 64x64 grid -> each covers ~a 16x16..32x32 curve tile;
    // avg per-file range must beat half the global range on BOTH dims
    // (a single-column sort would leave the other dim's range at ~63)
    assert(perFile._1 <= 32.0, s"dim a per-file range too wide: $perFile")
    assert(perFile._2 <= 32.0, s"dim b per-file range too wide: $perFile")
  }
}
