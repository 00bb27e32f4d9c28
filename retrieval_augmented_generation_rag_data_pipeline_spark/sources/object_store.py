"""Object-store (s3a://) wiring for the catalog/content scans.

The reference's primary source is a real S3 bucket it lists and
downloads by hand (reference src/aws_bucket.py:101-191, boto3
list_objects_v2 pagination + per-key GET). On Spark the same scans in
`sources.readers` (`scan_catalog`, `scan_text_documents`, ...) take an
`s3a://bucket/prefix` URI directly — listing parallelism, ranged
reads, retries, and multipart IO live in the Hadoop S3A connector, not
in this repo. What belongs here is only the configuration surface:
which `fs.s3a.*` keys to set, and a capability probe so tests can
skip cleanly where the connector jars aren't on the classpath (this
container ships Spark without hadoop-aws).

Scale notes encoded in the defaults below:
- listing: `fs.s3a.list.version=2` paginated listing; directory
  markers kept (no extra DELETEs on rename-free parquet writes).
- reads: `fs.s3a.experimental.input.fadvise=random` suits parquet
  (footer + column-chunk ranged reads); sequential suits whole-file
  binary scans — callers can override per workload.
- committers: the "magic" committer avoids the O(files) driver-side
  rename phase of FileOutputCommitter v1/v2 on object stores, where
  rename is a COPY+DELETE.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: conf prefix understood by the Hadoop S3A connector
_P = "spark.hadoop.fs.s3a."


def s3a_conf(
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    session_token: str | None = None,
    path_style_access: bool | None = None,
    anonymous: bool = False,
    fadvise: str = "random",
    magic_committer: bool = False,
) -> dict[str, str]:
    """Build the `spark.hadoop.fs.s3a.*` conf map for an S3-compatible
    store. Pure function (unit-testable, no Spark needed); apply via
    `SparkSession.builder.config(map=...)` or `configure_s3a(spark)`.

    ``endpoint``/``path_style_access`` serve MinIO/Ceph/localstack;
    omit both for AWS. With no explicit keys the AWS default provider
    chain (env vars, instance profile) applies — credentials should
    come from the environment in production, not code.

    ``magic_committer`` is OPT-IN: it points the session-wide commit
    protocol at spark-hadoop-cloud's PathOutputCommitProtocol, a class
    that hadoop-aws alone does NOT provide — enabling it without that
    jar breaks every subsequent write (even local ones) with
    ClassNotFoundException. Turn it on only when spark-hadoop-cloud is
    on the classpath (`committer_available(spark)`).
    """
    if anonymous and (access_key or secret_key or session_token):
        raise ValueError(
            "anonymous=True conflicts with explicit credentials — both "
            "set fs.s3a.aws.credentials.provider; pass one or the other"
        )
    conf: dict[str, str] = {
        _P + "list.version": "2",
        _P + "experimental.input.fadvise": fadvise,
        _P + "connection.maximum": "96",
        _P + "threads.max": "64",
    }
    if magic_committer:
        conf["spark.sql.sources.commitProtocolClass"] = (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        )
        conf["spark.sql.parquet.output.committer.class"] = (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        )
        conf[_P + "committer.name"] = "magic"
        conf[_P + "committer.magic.enabled"] = "true"
    if endpoint:
        conf[_P + "endpoint"] = endpoint
    if path_style_access is None:
        path_style_access = endpoint is not None  # MinIO-style by default
    conf[_P + "path.style.access"] = str(bool(path_style_access)).lower()
    if anonymous:
        conf[_P + "aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
        )
    if access_key:
        conf[_P + "access.key"] = access_key
    if secret_key:
        conf[_P + "secret.key"] = secret_key
    if session_token:
        conf[_P + "session.token"] = session_token
        conf[_P + "aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
        )
    return conf


def configure_s3a(spark: SparkSession, **kwargs) -> SparkSession:
    """Apply `s3a_conf(**kwargs)` to a LIVE session's Hadoop conf
    (`spark.hadoop.*` builder keys only bind at startup)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in s3a_conf(**kwargs).items():
        if k.startswith("spark.hadoop."):
            hconf.set(k[len("spark.hadoop."):], v)
        else:
            spark.conf.set(k, v)
    return spark


def committer_available(spark: SparkSession) -> bool:
    """True when spark-hadoop-cloud's PathOutputCommitProtocol is on
    the classpath — the prerequisite for ``magic_committer=True``."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        )
        return True
    except Exception:
        return False


def s3a_available(spark: SparkSession) -> bool:
    """True when the S3A connector classes are on the JVM classpath
    (hadoop-aws + AWS SDK). This container's Spark ships without them,
    so live-bucket tests skip on this probe."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.hadoop.fs.s3a.S3AFileSystem"
        )
        return True
    except Exception:
        return False
