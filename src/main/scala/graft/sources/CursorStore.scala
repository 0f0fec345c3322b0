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
  */
final class CursorStore(path: Path) {

  def this(path: String) = this(Paths.get(path))

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
  def get(obj: String): Option[Any] = load().get(obj).map(decode)

  /** Commit the cursor for an object (atomic). */
  def put(obj: String, cursor: Any): Unit =
    save(load() + (obj -> encode(cursor)))

  /** Drop an object's cursor (forces a full re-sync next run). */
  def reset(obj: String): Unit = save(load() - obj)
}
