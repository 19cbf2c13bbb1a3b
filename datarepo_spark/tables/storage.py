"""Object-store credential plumbing: boto3 session → Spark S3A confs.

Parity target: reference ``util.py:64-142`` (``get_storage_options`` /
``get_pyarrow_filesystem_args``), which turns a boto3 session + optional
custom endpoint into delta-rs / pyarrow filesystem kwargs. Spark's
equivalent surface is the Hadoop S3A connector, configured through
``fs.s3a.*`` keys on the Hadoop configuration — including PER-BUCKET
overrides (``fs.s3a.bucket.<name>.*``), which is what lets two tables
with different credentials/endpoints coexist in one SparkSession (the
reference achieves the same by passing per-table storage_options to each
scan).

No live S3 exists in the test environment; the mapping itself is the
tested contract, exactly as the reference's tests mock boto3.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

from pyspark.sql import SparkSession

logger = logging.getLogger(__name__)


def get_storage_options(
    boto3_session: Optional[Any] = None,
    endpoint_url: Optional[str] = None,
) -> dict[str, str]:
    """delta-rs-style storage options from a boto3 session (reference
    ``util.py:64-100``). ``boto3_session`` is duck-typed: anything with
    ``get_credentials()`` → (access_key, secret_key, token) and
    ``region_name`` works, so tests need no AWS."""
    storage_options: dict[str, str] = {}
    if endpoint_url is not None:
        storage_options["aws_endpoint_url"] = endpoint_url
    if boto3_session is not None:
        creds = boto3_session.get_credentials()
        if creds is not None:
            storage_options = {
                **storage_options,
                "aws_access_key_id": creds.access_key,
                "aws_secret_access_key": creds.secret_key,
                "aws_session_token": creds.token or "",
                "aws_region": boto3_session.region_name,
            }
        else:
            logger.error(
                "Boto3 session provided but no credentials found. "
                "Storage options will not include AWS credentials."
            )
    return {k: v for k, v in storage_options.items() if v}


# storage-option key → fs.s3a suffix (Hadoop S3A connector docs)
_S3A_KEY_MAP = {
    "aws_access_key_id": "access.key",
    "aws_secret_access_key": "secret.key",
    "aws_session_token": "session.token",
    "aws_endpoint_url": "endpoint",
    "aws_region": "endpoint.region",
}


def storage_options_to_s3a_conf(
    storage_options: dict[str, str],
    bucket: Optional[str] = None,
) -> dict[str, str]:
    """Map delta-rs-style options to S3A Hadoop conf keys. With ``bucket``,
    emit per-bucket overrides (``fs.s3a.bucket.<name>.*``) so different
    tables can carry different credentials in one session."""
    prefix = f"fs.s3a.bucket.{bucket}." if bucket else "fs.s3a."
    conf: dict[str, str] = {}
    for key, value in storage_options.items():
        suffix = _S3A_KEY_MAP.get(key)
        if suffix is None:
            raise ValueError(f"Unknown storage option: {key!r}")
        conf[prefix + suffix] = value
    if "aws_endpoint_url" in storage_options:
        # custom endpoints (MinIO, R2, …) generally need path-style access
        conf[prefix + "path.style.access"] = "true"
    if "aws_session_token" in storage_options:
        conf[prefix + "aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
        )
    return conf


def bucket_of(uri: str) -> Optional[str]:
    """Bucket name of an s3://, s3a:// or s3n:// URI; None otherwise."""
    for scheme in ("s3a://", "s3://", "s3n://"):
        if uri.startswith(scheme):
            rest = uri[len(scheme):]
            return rest.split("/", 1)[0] or None
    return None


def apply_storage_options(
    spark: SparkSession,
    storage_options: dict[str, str],
    uri: Optional[str] = None,
) -> dict[str, str]:
    """Set the mapped S3A confs on the session's Hadoop configuration,
    scoped to ``uri``'s bucket when it is an S3 URI. Returns what was set
    (for tests/inspection). Hadoop confs are read per-filesystem-instance
    at first access, so this must run before the first scan of the
    bucket."""
    conf = storage_options_to_s3a_conf(
        storage_options, bucket=bucket_of(uri) if uri else None
    )
    hadoop_conf = spark.sparkContext._jsc.hadoopConfiguration()
    for key, value in conf.items():
        hadoop_conf.set(key, value)
    return conf
