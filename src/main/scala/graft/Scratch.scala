package graft

import java.nio.file.{Files, Path}

/** JVM-lifetime scratch directories for the declared queries that stage
  * stores/streams/indexes under the temp filesystem. A bare
  * `Files.createTempDirectory` leaks its tree on exit — a bench round
  * writes corpus-sized parquet per staging query per rep, so repeated
  * rounds accumulate unbounded /tmp until external cleanup. One
  * shutdown hook deletes every registered tree at JVM exit (queries
  * hold lazy plans over these paths, so deletion cannot happen any
  * earlier than end-of-process).
  */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val it = dirs.iterator()
      while (it.hasNext) deleteTree(it.next())
    }, "graft-scratch-cleanup"))

  private def deleteTree(p: Path): Unit = {
    val f = p.toFile
    if (f.isDirectory) f.listFiles() match {
      case null => ()
      case kids => kids.foreach(k => deleteTree(k.toPath))
    }
    f.delete()
    ()
  }

  /** A fresh temp directory removed at JVM exit. */
  def dir(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }
}
