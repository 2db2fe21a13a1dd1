package graft.index

import java.nio.file.{Files, Paths}

/** Restart durability for the five STORAGE-BACKED index families
  * (IVF, PQ, IVF-PQ, SQ, Term). Their data artifacts already live on
  * shared storage (parquet lists / codes / postings) — the only
  * driver-resident state is each registry's entry metadata (paths,
  * centroids/codebooks/ranges, corpus stats), so checkpointing them is a
  * single small manifest, and restore is a registry re-registration with
  * NO data movement. Unlike the HNSW checkpoint this is not
  * persistence-gated: the reference's experimental-persistence gate
  * guards serializing its in-memory graph, which has no analog here. */
object StorageIndexCatalog {

  private def manifestPath(dir: String) = Paths.get(dir, "storage-catalog.manifest")

  /** Write all storage-backed registry entries to `dir`. Returns the
    * number of entries persisted. */
  def checkpoint(dir: String): Int = {
    Files.createDirectories(Paths.get(dir))
    val manifest: Map[String, Seq[Any]] = Map(
      "ivf" -> IvfIndex.list.toSeq,
      "pq" -> PqIndex.list.toSeq,
      "ivfpq" -> IvfPqIndex.list.toSeq,
      "sq" -> SqIndex.list.toSeq,
      "term" -> TermIndex.list.toSeq)
    val out = new java.io.ObjectOutputStream(
      Files.newOutputStream(manifestPath(dir)))
    try out.writeObject(manifest) finally out.close()
    manifest.valuesIterator.map(_.size).sum
  }

  /** Re-register every entry from `dir`'s manifest whose name is not
    * already live (live entries win — they may have seen post-checkpoint
    * appends). Returns the number restored; 0 when no manifest exists. */
  def restore(dir: String): Int = {
    if (!Files.exists(manifestPath(dir))) return 0
    val in = new java.io.ObjectInputStream(Files.newInputStream(manifestPath(dir)))
    val manifest =
      try in.readObject().asInstanceOf[Map[String, Seq[Any]]]
      finally in.close()
    var n = 0
    manifest.getOrElse("ivf", Nil).foreach { e0 =>
      val e = e0.asInstanceOf[IvfIndex.IvfEntry]
      if (IvfIndex.get(e.name).isEmpty) { IvfIndex.restoreEntry(e); n += 1 }
    }
    manifest.getOrElse("pq", Nil).foreach { e0 =>
      val e = e0.asInstanceOf[PqIndex.PqEntry]
      if (PqIndex.get(e.name).isEmpty) { PqIndex.restoreEntry(e); n += 1 }
    }
    manifest.getOrElse("ivfpq", Nil).foreach { e0 =>
      val e = e0.asInstanceOf[IvfPqIndex.IvfPqEntry]
      if (IvfPqIndex.get(e.name).isEmpty) { IvfPqIndex.restoreEntry(e); n += 1 }
    }
    manifest.getOrElse("sq", Nil).foreach { e0 =>
      val e = e0.asInstanceOf[SqIndex.SqEntry]
      if (SqIndex.get(e.name).isEmpty) { SqIndex.restoreEntry(e); n += 1 }
    }
    manifest.getOrElse("term", Nil).foreach { e0 =>
      val e = e0.asInstanceOf[TermIndex.TermEntry]
      if (TermIndex.get(e.name).isEmpty) { TermIndex.restoreEntry(e); n += 1 }
    }
    n
  }
}
