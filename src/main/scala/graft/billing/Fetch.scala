package graft.billing

import java.io.{File, FileOutputStream, InputStream}
import java.net.{HttpURLConnection, URI}

/** Driver-side download utility with HTTP fallback (SURVEY §2 S7),
  * mirroring the reference's only download-resilience story
  * (ref `pipeline/s3_utils.py:159-246`): each file is first fetched via
  * the primary connector (there: s3fs; here: any `(remote, local) => Unit`
  * such as a Hadoop-FS copy); on any failure the remote path is
  * reconstructed into a plain HTTPS URL against the bucket's public
  * domain and streamed to the local file in 8 KiB chunks
  * (ref `s3_utils.py:232-240`).
  *
  * This is deliberately NOT a Spark operator: at cluster scale data flows
  * through `spark.read` over the object store directly ([[Ingest.readCsv]]
  * plus [[S3Conf]]); this utility exists for the reference's driver-side
  * workflow — pulling a handful of partition CSVs onto the launcher box
  * when the connector is misconfigured but the bucket is public.
  */
object Fetch {

  /** (protocol, domain, path) split of a bucket/file URL, mirroring ref
    * `s3_utils.py:17-39` (`_parse_url`): protocol defaults to https when
    * absent, path loses its leading slash, empty input → ("https","","").
    */
  def parseUrl(url: String): (String, String, String) = {
    if (url == null || url.isEmpty) return ("https", "", "")
    val withProto =
      if (url.startsWith("http://") || url.startsWith("https://") ||
        url.startsWith("s3://")) url
      else s"https://$url"
    val u = new URI(withProto)
    val proto = Option(u.getScheme).getOrElse("https")
    val domain = Option(u.getAuthority).getOrElse("")
    val path = Option(u.getPath).getOrElse("").dropWhile(_ == '/')
    (proto, domain, path)
  }

  /** Reconstruct the public HTTP(S) URL for a connector-style file path,
    * mirroring ref `s3_utils.py:204-227`: already-HTTP paths pass
    * through; `s3://` prefixes are stripped; a path that already carries
    * the bucket domain keeps it, otherwise the domain from `bucketUrl`
    * is prepended.
    */
  def resolveHttpUrl(filePath: String, bucketUrl: String): String = {
    if (filePath.startsWith("http://") || filePath.startsWith("https://"))
      return filePath
    val (proto, domain, _) = parseUrl(bucketUrl)
    val clean = filePath.replace("s3://", "").dropWhile(_ == '/')
    if (domain.nonEmpty && clean.contains(domain)) s"$proto://$clean"
    else {
      val parts = clean.split("/", 2)
      val pathPart =
        if (parts.length > 1 && domain.nonEmpty && parts(0).contains(domain))
          parts(1)
        else clean
      s"$proto://$domain/$pathPart"
    }
  }

  /** Stream `url` to `dest` in 8 KiB chunks (ref `s3_utils.py:236-240`).
    * Non-2xx status throws (the `raise_for_status` analogue); the
    * connection and streams always close.
    */
  def httpDownload(url: String, dest: File,
      connectTimeoutMs: Int = 15000, readTimeoutMs: Int = 60000): Unit = {
    val conn = new URI(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    try {
      val status = conn.getResponseCode
      if (status < 200 || status >= 300)
        throw new java.io.IOException(s"HTTP $status fetching $url")
      val in = conn.getInputStream
      try copyStream(in, dest)
      finally in.close()
    } finally conn.disconnect()
  }

  private def copyStream(in: InputStream, dest: File): Unit = {
    val out = new FileOutputStream(dest)
    try {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = in.read(buf)
      }
    } finally out.close()
  }

  /** Fetch one remote file to `dest`: try `primary` (the connector);
    * on any exception fall back to a direct HTTP download of the
    * reconstructed public URL (ref `s3_utils.py:192-242`). Returns which
    * path succeeded, for logging/audit.
    */
  def fetchWithFallback(remotePath: String, dest: File, bucketUrl: String,
      primary: (String, File) => Unit,
      http: (String, File) => Unit = httpDownload(_, _)): FetchResult =
    try {
      primary(remotePath, dest)
      FetchResult(dest, viaFallback = false, error = None)
    } catch {
      case primaryErr: Exception =>
        val url = resolveHttpUrl(remotePath, bucketUrl)
        http(url, dest)
        FetchResult(dest, viaFallback = true,
          error = Some(primaryErr.getMessage))
    }

  /** Download every file of a Hive partition to `localDir` under the
    * reference's `billing-$year-$month-$day-$filename` naming
    * (ref `s3_utils.py:179-190`), connector-first with HTTP fallback.
    * Per-file failures are collected, not thrown — the reference logs and
    * continues (`s3_utils.py:244-246`) — and successfully fetched files
    * are returned in input order.
    */
  def downloadPartition(partition: HivePartition, localDir: File,
      bucketUrl: String, primary: (String, File) => Unit,
      http: (String, File) => Unit = httpDownload(_, _)): Seq[FetchResult] = {
    localDir.mkdirs()
    partition.files.flatMap { remote =>
      val filename = remote.split('/').last
      val local = new File(localDir,
        s"billing-${partition.year}-${partition.month}-${partition.day}-$filename")
      try Some(fetchWithFallback(remote, local, bucketUrl, primary, http))
      catch { case _: Exception => None }
    }
  }

  /** One discovered partition: the reference's partition dict
    * (`s3_utils.py:120-150`) as a typed value.
    */
  final case class HivePartition(year: String, month: String, day: String,
      path: String, files: Seq[String])

  final case class FetchResult(file: File, viaFallback: Boolean,
      error: Option[String])
}
