package graft.index

import scala.collection.concurrent.TrieMap

/** Shared name → entry registry + artifact lifecycle for the
  * storage-backed index families (IVF, PQ, IVF-PQ, SQ, Term): one
  * implementation of the create-race cleanup, the recursive artifact
  * delete, and drop/clear semantics instead of a copy per family. */
final class ArtifactRegistry[E](pathOf: E => String) {
  private val entries = TrieMap.empty[String, E]

  def get(name: String): Option[E] = entries.get(name)
  def values: Iterable[E] = entries.values
  def getOrThrow(name: String, kind: String): E = entries.getOrElse(name,
    throw new IllegalArgumentException(s"no $kind index named $name"))

  /** Eager pre-build check (the cheap fail-fast; [[register]] still
    * handles the concurrent-create race atomically). */
  def requireFresh(name: String): Unit =
    require(!entries.contains(name), s"""Index with name "$name" already exists!""")

  /** Atomic publish; the loser of a concurrent create deletes its own
    * artifact and throws the same duplicate-name error. */
  def register(name: String, entry: E): E = {
    if (entries.putIfAbsent(name, entry).isDefined) {
      ArtifactRegistry.deleteRecursively(pathOf(entry))
      throw new IllegalArgumentException(s"""Index with name "$name" already exists!""")
    }
    StorageIndexCatalog.rewriteIfArmed()
    entry
  }

  /** Replace an entry's metadata (e.g. folded stats after an append, a
    * compaction's path swap). The armed checkpoint manifest is rewritten so
    * a crash never restores metadata older than the artifact it points at. */
  def update(name: String, entry: E): Unit = {
    entries.put(name, entry)
    StorageIndexCatalog.rewriteIfArmed()
  }

  /** Drop the entry AND its artifact (a dropped index frees its storage). */
  def drop(name: String): Boolean = entries.remove(name) match {
    case Some(e) =>
      ArtifactRegistry.deleteRecursively(pathOf(e))
      StorageIndexCatalog.rewriteIfArmed()
      true
    case None => false
  }

  def clear(): Unit = entries.keys.foreach(drop)

  /** Forget every entry WITHOUT touching its artifacts — the restart
    * simulation / ownership-handoff path (drop/clear delete storage). */
  def forgetAll(): Unit = entries.clear()
}

object ArtifactRegistry {
  def deleteRecursively(p: String): Unit = ArtifactIO.deleteRecursive(p)
}
