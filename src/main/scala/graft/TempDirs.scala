package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Bounded-lifetime scratch directories: app-id-suffixed output dirs
  * (flowlogs corpus, q00 ETL output) are unique per JVM so concurrent
  * runs never clobber each other — but that uniqueness means nothing
  * overwrites them either, so each registers a shutdown-hook delete to
  * keep repeated gate runs from growing the tmpdir without bound.
  */
private[graft] object TempDirs {

  private val registered = scala.collection.mutable.Set.empty[String]

  def deleteOnExit(dir: String): String = synchronized {
    if (registered.add(dir)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(dir)))
    }
    dir
  }

  private def deleteTree(dir: String): Unit = {
    val p = Path.of(dir)
    if (Files.exists(p)) {
      try
        Files
          .walk(p)
          .sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
      catch { case _: java.io.IOException => () } // best-effort cleanup
    }
  }
}
