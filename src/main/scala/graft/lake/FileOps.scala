package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}

/** File-lifecycle primitives over Hadoop FileSystem: move/archive/sidecar
  * (reference A10/A11: `lambda_validator.py:98-105`,
  * `glue_job_raw_to_processed.py:69-81`). Same-FS moves use rename (atomic
  * on HDFS/local); cross-FS falls back to copy+delete like the reference's
  * S3 copy_object+delete_object.
  */
final class FileOps(conf: Configuration) {

  private def fs(path: Path): FileSystem = path.getFileSystem(conf)

  def exists(path: String): Boolean = {
    val p = new Path(path)
    fs(p).exists(p)
  }

  /** Move a file, creating target parents. */
  def move(src: String, dst: String): Unit = {
    val (s, d) = (new Path(src), new Path(dst))
    val sfs = fs(s)
    val dfs = fs(d)
    dfs.mkdirs(d.getParent)
    val renamed = (sfs.getUri == dfs.getUri) && sfs.rename(s, d)
    if (!renamed) {
      FileUtil.copy(sfs, s, dfs, d, true, true, conf)
      ()
    }
  }

  /** Recursively move a directory's children into an existing directory
    * (used to commit a staging dir into a partitioned table path). */
  def moveChildrenInto(srcDir: String, dstDir: String): Unit = {
    val s = new Path(srcDir)
    val sfs = fs(s)
    if (sfs.exists(s)) {
      sfs.listStatus(s).foreach { st =>
        move(st.getPath.toString, s"$dstDir/${st.getPath.getName}")
      }
      sfs.delete(s, true)
    }
  }

  def delete(path: String): Unit = {
    val p = new Path(path)
    fs(p).delete(p, true)
    ()
  }

  /** Read the first `maxBytes` of a file (pre-flight sniff window,
    * `lambda_validator.py:68-74`). */
  def readHead(path: String, maxBytes: Int = 65536): Array[Byte] = {
    val p = new Path(path)
    val in = fs(p).open(p)
    try {
      val buf = new Array[Byte](maxBytes)
      var off = 0
      var n = 0
      while (off < maxBytes && { n = in.read(buf, off, maxBytes - off); n >= 0 })
        off += n
      java.util.Arrays.copyOf(buf, off)
    } finally in.close()
  }

  /** Write a small string file (reason sidecars, audit metrics). */
  def writeString(path: String, content: String): Unit = {
    val p = new Path(path)
    val f = fs(p)
    f.mkdirs(p.getParent)
    val out = f.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def readString(path: String): String = {
    val p = new Path(path)
    val in = fs(p).open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString(StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** A8 with the reference's regex bug fixed (SURVEY §2.G Q2): list
    * `date=YYYY-MM-DD` partition directories under a table path. */
  def listPartitionDates(tablePath: String): Seq[String] = {
    val dateRe = "date=(\\d{4}-\\d{2}-\\d{2})".r
    val p = new Path(tablePath)
    val f = fs(p)
    if (!f.exists(p)) Seq.empty
    else
      f.listStatus(p).toSeq
        .filter(_.isDirectory)
        .flatMap(st => dateRe.findFirstMatchIn(st.getPath.getName).map(_.group(1)))
        .sorted
  }

  /** A9 — cheap partition-existence probe. */
  def partitionExists(tablePath: String, date: String): Boolean =
    exists(s"$tablePath/date=$date")
}

object Naming {
  /** B4 — traceable rename `<base>__<tag>__<YYYYMMDDTHHMMSSZ>__<uuid8><ext>`
    * (`lambda_validator.py:44-65`). */
  def withTag(origName: String, tag: String,
      nowUtc: java.time.Instant = java.time.Instant.now(),
      uuid8: String = newRunId()): String = {
    val idx = origName.lastIndexOf('.')
    val (base, ext) =
      if (idx >= 0) (origName.substring(0, idx), origName.substring(idx))
      else (origName, "")
    val ts = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(java.time.ZoneOffset.UTC)
      .format(nowUtc)
    s"${base}__${tag}__${ts}__$uuid8$ext"
  }

  /** 8-hex ingest run id (`lambda_validator.py:48-49`). */
  def newRunId(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(8)
}

/** Minimal JSON writer for sidecar documents (no extra deps; values are
  * flat primitives/maps/seqs). */
object Json {
  def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def render(v: Any): String = v match {
    case null | None => "null"
    case Some(x) => render(x)
    case s: String => "\"" + esc(s) + "\""
    case b: Boolean => b.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Double => n.toString
    case m: Map[_, _] =>
      m.map { case (k, x) => "\"" + esc(k.toString) + "\":" + render(x) }
        .mkString("{", ",", "}")
    case xs: Seq[_] => xs.map(render).mkString("[", ",", "]")
    case other => "\"" + esc(other.toString) + "\""
  }
}
