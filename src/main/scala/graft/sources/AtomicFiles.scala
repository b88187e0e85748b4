package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}

/** One shared write-temp-then-rename helper for every small state file in
  * the engine (store manifests aside, which carry their own token
  * protocol): the rename IS the commit point, so a reader never observes
  * a half-flushed record and a crash mid-write leaves only an orphaned
  * temp file. Duplicating this block per call site is how one of them
  * (the catalog's boundary history) shipped without it — keep the
  * atomicity contract in exactly one place.
  */
object AtomicFiles {

  /** Write `body` to `path` atomically (parent dirs created; an existing
    * file is replaced). The temp name starts with a dot so directory
    * listings filtering on name prefixes never pick up an in-flight write.
    */
  def write(conf: Configuration, path: Path, body: Array[Byte]): Unit = {
    val fs = path.getFileSystem(conf)
    Option(path.getParent).foreach(fs.mkdirs(_))
    val tmp = new Path(path.getParent,
      s".${path.getName}.tmp.${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(body) finally out.close()
    FileContext.getFileContext(tmp.toUri, conf)
      .rename(tmp, path, Options.Rename.OVERWRITE)
  }
}
