package graft.billing

import org.apache.spark.sql.SparkSession

/** S2 object-store wiring: config-gated s3a credentials/endpoint setup so
  * [[Ingest.readCsv]] / [[Ingest.readPartitioned]] paths work unchanged
  * against `s3a://bucket/...` URLs (the reference's primary ingress,
  * `pipeline/s3_utils.py:40-44,300-309` — anonymous access to a public
  * bucket, DuckDB's httpfs playing the role Hadoop's s3a connector plays
  * here).
  *
  * UNTESTABLE OFFLINE: this sandbox has zero egress and no object store,
  * so these settings are exercised only by a cluster deployment. The
  * reader itself is path-scheme-agnostic and fully tested on `file://`;
  * this hook only translates the reference's connector configuration
  * into the Hadoop keys Spark reads.
  *
  * At 100 TB the part that matters for throughput is that executors read
  * s3a ranges directly (no driver-side staging): `spark.read.csv("s3a://…")`
  * splits by byte range exactly as on HDFS once this configuration is in
  * place.
  */
object S3Conf {

  /** Anonymous public-bucket access — the reference's default
    * (`s3fs.S3FileSystem(anon=True)`, `s3_utils.py:44`).
    */
  def applyAnonymous(spark: SparkSession): SparkSession = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.aws.credentials.provider",
      "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider")
    spark
  }

  /** Credentialed access with an optional custom endpoint (non-AWS
    * object stores) and path-style addressing, mirroring what the
    * reference leaves as "add aws_access_key_id and aws_secret_access_key
    * if authentication is required" (`s3_utils.py:41-43`). Secrets come
    * from the caller (environment / secret manager) — never hard-code.
    */
  def applyCredentials(spark: SparkSession, accessKey: String,
      secretKey: String, endpoint: Option[String] = None,
      pathStyle: Boolean = false): SparkSession = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.access.key", accessKey)
    hc.set("fs.s3a.secret.key", secretKey)
    endpoint.foreach(hc.set("fs.s3a.endpoint", _))
    if (pathStyle) hc.set("fs.s3a.path.style.access", "true")
    spark
  }

  /** Rewrite the reference's `s3://` / bare-domain bucket URLs to the
    * `s3a://` scheme Hadoop's connector answers to, leaving every other
    * scheme (file, hdfs, http for [[Fetch]]) untouched.
    */
  def toS3a(url: String): String =
    if (url.startsWith("s3://")) "s3a://" + url.stripPrefix("s3://")
    else url
}
