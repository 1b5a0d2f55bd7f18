package graft.util

/** Tiny filesystem helpers shared by the bench harness, the streaming
  * door's spool maintenance and the test table cleaners. */
object Fs {
  /** Null-safe recursive delete (ADVICE r11): File.listFiles returns
    * null on an I/O or permission error — an unguarded foreach turns a
    * cleanup into an NPE that kills the calling job. */
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(): Unit
  }
}
