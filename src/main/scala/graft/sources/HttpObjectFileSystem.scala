package graft.sources

import java.net.{HttpURLConnection, URL}

import org.apache.hadoop.fs.{FSDataInputStream, FSInputStream, FileStatus,
  Path}
import org.apache.hadoop.fs.http.HttpFileSystem

/** Read-only object-store connector over plain HTTP — Hadoop's stock
  * `HttpFileSystem` (HADOOP-14383) plus the three pieces Spark's file
  * scan actually needs that it leaves unimplemented:
  *
  *   - `getFileStatus` issues a HEAD so the index learns the true object
  *     length (the stock implementation reports a placeholder, which
  *     would make split planning read zero bytes);
  *   - `listStatus` of an object URL is the object itself — an object
  *     store has no directories to enumerate, which is exactly how the
  *     reference treats its bucket: partition paths are GENERATED
  *     (s3_utils.py:329-410), each then fetched directly, never listed;
  *   - `open` returns a SEEKABLE stream (the stock one throws on the
  *     `seek(splitStart)` every record reader issues): forward seeks
  *     skip, backward seeks reopen. Correct for every format —
  *     spec-proven against parquet, whose footer-first layout exercises
  *     the backward path — but each backward seek re-GETs the object,
  *     so columnar scans want true ranged GETs (s3a) in production;
  *     this connector is the ingest-edge path.
  *
  * Register with `fs.http.impl = graft.sources.HttpObjectFileSystem`.
  */
class HttpObjectFileSystem extends HttpFileSystem {

  override def getFileStatus(f: Path): FileStatus = {
    val conn = f.toUri.toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("HEAD")
    val head = try {
      val code = conn.getResponseCode
      if (code >= 400)
        throw new java.io.FileNotFoundException(s"$f: HTTP $code")
      conn.getContentLengthLong
    } finally conn.disconnect()
    // A chunked HEAD response carries no Content-Length (-1). Clamping to
    // 0 would make split planning silently scan zero bytes — the exact
    // silent-empty-scan defect this class exists to fix — so fall back to
    // learning the length by draining a GET before giving up.
    val len = if (head >= 0) head else lengthByGet(f)
    new FileStatus(len, false, 1, 4096, 0L, f)
  }

  /** Last-resort length discovery for servers that answer HEAD without
    * Content-Length: issue a GET and count the body. O(object) bytes, but
    * correct — and only reached on non-compliant servers.
    */
  private def lengthByGet(f: Path): Long = {
    val conn = f.toUri.toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      if (conn.getResponseCode >= 400)
        throw new java.io.FileNotFoundException(
          s"$f: HTTP ${conn.getResponseCode}")
      val known = conn.getContentLengthLong
      if (known >= 0) known
      else {
        val in = conn.getInputStream
        try {
          val buf = new Array[Byte](8192)
          var total = 0L
          var n = in.read(buf)
          while (n >= 0) { total += n; n = in.read(buf) }
          total
        } finally in.close()
      }
    } finally conn.disconnect()
  }

  override def listStatus(f: Path): Array[FileStatus] =
    Array(getFileStatus(f))

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    new FSDataInputStream(
      new HttpObjectFileSystem.SeekByReopenStream(f.toUri.toURL))
}

object HttpObjectFileSystem {

  /** Seek-emulating HTTP stream: forward = skip bytes, backward = reopen
    * and skip from zero. One live GET at a time; position is tracked
    * locally, so `getPos`/`seek` satisfy the record-reader contract
    * without server-side range support.
    */
  private final class SeekByReopenStream(url: URL) extends FSInputStream {
    private var in: java.io.InputStream = url.openStream()
    private var pos = 0L

    override def seek(target: Long): Unit = {
      require(target >= 0, s"negative seek $target")
      if (target < pos) {
        in.close()
        in = url.openStream()
        pos = 0L
      }
      skipFully(target - pos)
    }

    private def skipFully(n: Long): Unit = {
      var left = n
      while (left > 0) {
        val s = in.skip(left)
        if (s > 0) { left -= s; pos += s }
        else if (in.read() < 0)
          throw new java.io.EOFException(s"seek past end of $url")
        else { left -= 1; pos += 1 }
      }
    }

    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false

    override def read(): Int = {
      val b = in.read()
      if (b >= 0) pos += 1
      b
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val n = in.read(b, off, len)
      if (n > 0) pos += n
      n
    }

    override def close(): Unit = in.close()
  }
}
