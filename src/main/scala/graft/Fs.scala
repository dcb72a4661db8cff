package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Recursive directory deletion — the ONE shared implementation (store
  * teardown, artifact-cache cleanup, Verify's stale-output drop all used
  * to carry private copies). The walk is materialized and its stream
  * closed BEFORE deleting: the open stream holds a directory fd.
  *
  * `strict = true` propagates any failure (a store teardown must not
  * half-succeed silently); `strict = false` is best-effort cleanup that
  * tolerates missing dirs and per-file races.
  */
object Fs {
  def deleteTree(dir: Path, strict: Boolean = false): Unit =
    if (strict || Files.exists(dir)) {
      val s = Files.walk(dir)
      val paths = try s.iterator().asScala.toSeq finally s.close()
      if (strict) paths.reverse.foreach(Files.delete)
      else paths.reverse.foreach(f =>
        try Files.deleteIfExists(f) catch { case _: Exception => () })
    }
}
