package graft.engine

import java.io.File
import java.nio.file.Files

/** Scratch directories for operators that stage a parquet artifact
  * (the self-contained catalog entries around the persisted IVF
  * index — d37/c26 — build an index to probe it in the same call).
  *
  * Two hygiene rules the pre-r12 fixed `tmpdir/graft_<pid>` paths
  * violated: (1) every invocation gets a UNIQUE directory, so two
  * concurrent runs in one JVM can never overwrite each other's
  * artifact mid-probe; (2) nothing is orphaned — callers that fully
  * materialize their result delete eagerly ([[delete]]); callers
  * that return a frame still lazily reading the artifact rely on the
  * JVM-exit sweep every [[dir]] registers.
  */
object Scratch {

  /** A fresh unique scratch directory, swept at JVM exit. */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    sys.addShutdownHook(delete(p.toFile))
    p.toString
  }

  /** Recursive delete; missing paths are a no-op (safe to call both
    * eagerly and from the exit hook).
    */
  def delete(f: File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(delete)
    }
    f.delete()
    ()
  }

  def delete(path: String): Unit = delete(new File(path))
}
