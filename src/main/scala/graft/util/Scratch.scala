package graft.util

/** Process-scoped scratch directories under `java.io.tmpdir`.
  *
  * Layout: `graft_<tag>_<keyhash>_<pid>`. The pid component keeps two
  * concurrent JVMs running the same query against the same data dir from
  * overwriting each other's files mid-read; within a process the dir is
  * stable, so writers using `mode("overwrite")` reuse it in place. Every
  * dir is registered once with a JVM shutdown hook for deletion, so
  * repeated bench/driver runs do not accumulate per-pid litter in /tmp
  * (ADVICE r03).
  */
object Scratch {
  private val registered = scala.collection.mutable.Set.empty[String]

  def dir(tag: String, key: String): String = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_" +
      s"${Integer.toHexString(key.hashCode)}_${ProcessHandle.current().pid()}"
    synchronized {
      if (registered.add(path))
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))))
    }
    path
  }
}
