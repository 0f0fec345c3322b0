package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Persistent sync-state store — the reference keeps its incremental
  * cursor (last SystemModstamp per object) in a state table in the
  * target database; offline, the same contract is a small atomic
  * key→value file. One entry per object name; values are stored as
  * strings with a type tag so Long/String cursors round-trip.
  *
  * Writes are atomic (temp file + ATOMIC_MOVE) so a crashed sync never
  * leaves a torn state file — on restart the previous cursor is intact
  * and the worst case is re-pulling one batch (the upsert sink is
  * idempotent, so replays are safe).
  *
  * Concurrency contract: put()/reset() are load-then-save
  * read-modify-write passes over the whole file, serialized across all
  * CursorStore instances in THIS JVM via a per-path lock (two object
  * syncs sharing one state file can no longer drop each other's cursor
  * update). Across processes the file is single-writer by ownership:
  * one scheduler owns a state file; concurrent external writers are
  * outside the contract (use one file per object if two schedulers
  * must run).
  */
final class CursorStore(path: Path) {

  def this(path: String) = this(Paths.get(path))

  private val lock = CursorStore.lockFor(path)

  private def load(): Map[String, String] =
    if (!Files.exists(path)) Map.empty
    else new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).map { line =>
        val Array(k, v) = line.split("\t", 2)
        k -> v
      }.toMap

  private def save(m: Map[String, String]): Unit = {
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    if (path.getParent != null) Files.createDirectories(path.getParent)
    Files.write(tmp, m.toSeq.sorted.map { case (k, v) => s"$k\t$v" }
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def encode(v: Any): String = v match {
    case l: Long => s"L:$l"
    case i: Int => s"L:$i"
    case s: String => s"S:$s"
    case other => s"S:$other"
  }

  private def decode(s: String): Any = s.splitAt(2) match {
    case ("L:", rest) => rest.toLong
    case ("S:", rest) => rest
    case _ => s
  }

  /** Cursor for an object, if one was ever committed. */
  def get(obj: String): Option[Any] =
    lock.synchronized { load().get(obj).map(decode) }

  /** Commit the cursor for an object (atomic). */
  def put(obj: String, cursor: Any): Unit =
    lock.synchronized { save(load() + (obj -> encode(cursor))) }

  /** Drop an object's cursor (forces a full re-sync next run). */
  def reset(obj: String): Unit = lock.synchronized { save(load() - obj) }
}

object CursorStore {
  // one lock per absolute state-file path, JVM-wide, so independent
  // CursorStore instances over the same file serialize their RMW cycles
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(p: Path): Object =
    locks.computeIfAbsent(p.toAbsolutePath.toString, _ => new Object)
}
