"""s3a configuration surface: pure conf-map unit tests + a live-bucket
smoke that skips unless the S3A connector and a target URL are present
(mirrors the reference's S3 source, src/aws_bucket.py:160-176)."""

from __future__ import annotations

import os

import pytest

from retrieval_augmented_generation_rag_data_pipeline_spark.sources.object_store import (
    configure_s3a,
    s3a_available,
    s3a_conf,
)


def test_s3a_conf_defaults_are_scale_safe():
    conf = s3a_conf()
    # paginated listing + parquet-friendly ranged reads
    assert conf["spark.hadoop.fs.s3a.list.version"] == "2"
    assert conf["spark.hadoop.fs.s3a.experimental.input.fadvise"] == "random"
    # magic committer is OPT-IN: its commit-protocol class lives in
    # spark-hadoop-cloud, which hadoop-aws alone doesn't provide —
    # defaulting it on would break every write on a classpath without
    # that jar (ClassNotFoundException on even local writes)
    assert "spark.sql.sources.commitProtocolClass" not in conf
    magic = s3a_conf(magic_committer=True)
    assert magic["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert "PathOutputCommitProtocol" in magic["spark.sql.sources.commitProtocolClass"]
    # AWS default: virtual-host addressing, provider-chain credentials
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "false"
    assert "access.key" not in {k.rsplit(".", 2)[-2] for k in conf}


def test_s3a_conf_minio_endpoint_and_creds():
    conf = s3a_conf(
        endpoint="http://localhost:9000", access_key="ak", secret_key="sk"
    )
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://localhost:9000"
    # custom endpoint implies path-style addressing unless overridden
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.hadoop.fs.s3a.access.key"] == "ak"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "sk"


def test_s3a_conf_temporary_and_anonymous_credentials():
    tmp = s3a_conf(access_key="a", secret_key="s", session_token="t")
    assert "TemporaryAWSCredentialsProvider" in tmp[
        "spark.hadoop.fs.s3a.aws.credentials.provider"
    ]
    anon = s3a_conf(anonymous=True)
    assert "AnonymousAWSCredentialsProvider" in anon[
        "spark.hadoop.fs.s3a.aws.credentials.provider"
    ]
    # conflicting credential modes must raise, not silently pick one
    import pytest

    with pytest.raises(ValueError, match="anonymous"):
        s3a_conf(anonymous=True, session_token="t")


def test_s3a_live_bucket_smoke(spark):
    """Live scan_catalog over s3a:// — needs hadoop-aws on the
    classpath AND SPARK_GRAFT_S3A_TEST_URL (e.g. a MinIO bucket);
    skips cleanly in this container, runs on a real deployment."""
    url = os.environ.get("SPARK_GRAFT_S3A_TEST_URL")
    if not s3a_available(spark):
        pytest.skip("S3A connector not on classpath (hadoop-aws jars absent)")
    if not url:
        pytest.skip("SPARK_GRAFT_S3A_TEST_URL not set")
    from retrieval_augmented_generation_rag_data_pipeline_spark.sources.readers import (
        scan_catalog,
    )

    configure_s3a(
        spark,
        endpoint=os.environ.get("SPARK_GRAFT_S3A_ENDPOINT"),
        access_key=os.environ.get("AWS_ACCESS_KEY_ID"),
        secret_key=os.environ.get("AWS_SECRET_ACCESS_KEY"),
    )
    rows = scan_catalog(spark, url).select("path", "length").collect()
    assert all(r.path.startswith("s3a://") for r in rows)
