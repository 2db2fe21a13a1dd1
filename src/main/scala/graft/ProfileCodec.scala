package graft

/** Driver-side codec-dispatch micro: decode 20k tiny payloads of one image
  * format single-threaded and on 32 threads, printing per-row cost and the
  * thread-scaling factor. The sentinel for the registry-scan disease this
  * repo has now found twice (ImageIO's IIORegistry in round 10, the MIDI
  * reader's JDK13Services scan in round 11): healthy dispatch scales
  * near-linearly with threads; a synchronized per-call registry scan shows
  * up as flat-or-NEGATIVE scaling long before it is visible in a suite
  * bench. No Spark session — pure JVM.
  *
  * Usage: `runMain graft.ProfileCodec [png|jpeg|gif|bmp]` (default jpeg —
  * the MJPEG frame path). */
object ProfileCodec {
  def main(args: Array[String]): Unit = {
    val format = if (args.nonEmpty) args(0) else "jpeg"
    def encode(gray: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 16)
        im.setRGB(x, y, (gray << 16) | (gray << 8) | gray)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, format, bos)
      bos.toByteArray
    }
    val payloads = Array.tabulate(20000)(i => encode(i % 256))
    def decodeAll(slice: Array[Array[Byte]]): Int =
      slice.count(b => graft.ops.Multimodal.decodeImage(b).isDefined)
    decodeAll(payloads.take(2000)) // JIT warm
    val t1 = System.nanoTime()
    val ok1 = decodeAll(payloads)
    val single = (System.nanoTime() - t1) / 1e9
    val threads = 32
    val chunks = payloads.grouped(payloads.length / threads + 1).toArray
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val t2 = System.nanoTime()
    val futures = chunks.map(c => pool.submit(
      new java.util.concurrent.Callable[Int] { def call(): Int = decodeAll(c) }))
    val okN = futures.map(_.get()).sum
    val multi = (System.nanoTime() - t2) / 1e9
    pool.shutdown()
    println(f"[codec-profile] $format%s decode 20k payloads: single-thread " +
      f"$single%.3f s (${single / 20000 * 1e6}%.2f us/row, ok=$ok1), " +
      f"32-thread $multi%.3f s (speedup ${single / multi}%.1f x, ok=$okN)")
  }
}
