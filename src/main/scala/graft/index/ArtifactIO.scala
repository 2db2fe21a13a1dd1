package graft.index

import java.io.{InputStream, OutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** All index-artifact IO (shard graphs, manifests, WAL segments, postings
  * directories) routed through the Hadoop FileSystem API, so
  * `graft.indexes.dir`, checkpoint dirs, and WAL locations can live on any
  * Hadoop-resolvable store — `file:`, `hdfs://`, `s3a://` — instead of
  * requiring a disk the driver and every executor happen to share. Bare
  * paths (`/tmp/x`) resolve through `fs.defaultFS`, exactly like Spark's
  * own reads/writes.
  *
  * The Configuration comes from the active SparkSession when one exists on
  * this JVM (driver: session Hadoop options apply) and otherwise from
  * classpath defaults (executor: core-site.xml etc.) — the same resolution
  * chain Spark data IO uses. It is cached per JVM, which also keeps
  * `FileSystem.get`'s instance cache effective.
  *
  * There is deliberately NO `append`: object stores and Hadoop's
  * checksummed LocalFileSystem don't support it. Incremental durability is
  * segment-per-batch instead (see IndexCatalog's WAL). */
object ArtifactIO {

  @volatile private var cachedConf: Configuration = null

  private def conf: Configuration = {
    val c = cachedConf
    if (c != null) c
    else {
      val fresh = org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new Configuration())
      cachedConf = fresh
      fresh
    }
  }

  private def resolve(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(conf), p)
  }

  /** Open for (over)write; parent directories are created by the
    * filesystem. Wrap in a BufferedOutputStream for record-at-a-time
    * writers. */
  def create(path: String): OutputStream = {
    val (fs, p) = resolve(path)
    fs.create(p, true)
  }

  def open(path: String): InputStream = {
    val (fs, p) = resolve(path)
    fs.open(p)
  }

  def exists(path: String): Boolean = {
    val (fs, p) = resolve(path)
    fs.exists(p)
  }

  def isDirectory(path: String): Boolean = {
    val (fs, p) = resolve(path)
    fs.exists(p) && fs.getFileStatus(p).isDirectory
  }

  def mkdirs(path: String): Unit = {
    val (fs, p) = resolve(path)
    fs.mkdirs(p)
    ()
  }

  /** Recursive delete; no-op when the path does not exist. */
  def deleteRecursive(path: String): Unit = {
    val (fs, p) = resolve(path)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  def deleteIfExists(path: String): Unit = {
    val (fs, p) = resolve(path)
    if (fs.exists(p)) fs.delete(p, false)
    ()
  }

  /** Atomic-where-the-store-supports-it publish: write segments to a temp
    * name, rename into place (HDFS/local rename is atomic; object stores
    * degrade to copy — still single-object visibility). */
  def rename(src: String, dst: String): Unit = {
    val (fs, s) = resolve(src)
    fs.rename(s, new Path(dst))
    ()
  }

  /** Child paths of `dir` (non-recursive, full URI strings); empty when the
    * directory does not exist. */
  def list(dir: String): Seq[String] = {
    val (fs, p) = resolve(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.toString).toSeq
  }

  /** Stream copy (works across filesystems — e.g. executor-local temp to
    * s3a:// artifact dir). */
  def copy(src: String, dst: String): Unit = {
    val in = open(src)
    try {
      val out = create(dst)
      try {
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) {
          out.write(buf, 0, n)
          n = in.read(buf)
        }
      } finally out.close()
    } finally in.close()
  }
}
