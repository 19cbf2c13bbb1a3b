"""Object-store credential plumbing (reference util.py:64-142 parity).

No live S3 exists here, exactly as in the reference's own tests — the
tested contract is the mapping: boto3-session-shaped credentials →
delta-rs-style storage options → (per-bucket) fs.s3a.* Hadoop confs,
applied to the session at table-read time.
"""

from collections import namedtuple

import pytest

from datarepo_spark.tables.parquet_table import ParquetTable
from datarepo_spark.tables.storage import (
    apply_storage_options,
    bucket_of,
    get_storage_options,
    storage_options_to_s3a_conf,
)

Creds = namedtuple("Creds", ["access_key", "secret_key", "token"])


class FakeSession:
    """Duck-typed boto3.Session: get_credentials() + region_name."""

    def __init__(self, creds, region="us-west-2"):
        self._creds = creds
        self.region_name = region

    def get_credentials(self):
        return self._creds


class TestGetStorageOptions:
    def test_session_with_static_creds(self):
        opts = get_storage_options(
            FakeSession(Creds("AKIA123", "secret", None))
        )
        assert opts == {
            "aws_access_key_id": "AKIA123",
            "aws_secret_access_key": "secret",
            "aws_region": "us-west-2",
        }  # empty token dropped, like the reference

    def test_session_with_sts_token_and_endpoint(self):
        opts = get_storage_options(
            FakeSession(Creds("AKIA123", "secret", "tok")),
            endpoint_url="http://minio:9000",
        )
        assert opts["aws_session_token"] == "tok"
        assert opts["aws_endpoint_url"] == "http://minio:9000"

    def test_no_creds_logs_and_returns_endpoint_only(self, caplog):
        opts = get_storage_options(
            FakeSession(None), endpoint_url="http://minio:9000"
        )
        assert opts == {"aws_endpoint_url": "http://minio:9000"}

    def test_none_session(self):
        assert get_storage_options() == {}


class TestS3aMapping:
    def test_global_mapping(self):
        conf = storage_options_to_s3a_conf(
            {
                "aws_access_key_id": "AK",
                "aws_secret_access_key": "SK",
                "aws_region": "eu-central-1",
            }
        )
        assert conf == {
            "fs.s3a.access.key": "AK",
            "fs.s3a.secret.key": "SK",
            "fs.s3a.endpoint.region": "eu-central-1",
        }

    def test_per_bucket_scoping_and_endpoint(self):
        conf = storage_options_to_s3a_conf(
            {
                "aws_access_key_id": "AK",
                "aws_endpoint_url": "http://minio:9000",
            },
            bucket="datasets",
        )
        assert conf["fs.s3a.bucket.datasets.access.key"] == "AK"
        assert conf["fs.s3a.bucket.datasets.endpoint"] == "http://minio:9000"
        # custom endpoints imply path-style addressing
        assert conf["fs.s3a.bucket.datasets.path.style.access"] == "true"

    def test_sts_selects_temporary_provider(self):
        conf = storage_options_to_s3a_conf({"aws_session_token": "tok"})
        assert (
            conf["fs.s3a.aws.credentials.provider"]
            == "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
        )

    def test_unknown_key_raises(self):
        with pytest.raises(ValueError, match="Unknown storage option"):
            storage_options_to_s3a_conf({"mystery": "x"})

    def test_bucket_of(self):
        assert bucket_of("s3://datasets/path/to") == "datasets"
        assert bucket_of("s3a://b") == "b"
        assert bucket_of("/local/path") is None


class TestSessionApplication:
    def test_apply_sets_hadoop_conf_scoped_to_bucket(self, spark):
        applied = apply_storage_options(
            spark,
            {"aws_access_key_id": "AK1"},
            uri="s3a://bucket-a/tbl",
        )
        assert applied == {"fs.s3a.bucket.bucket-a.access.key": "AK1"}
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        assert hconf.get("fs.s3a.bucket.bucket-a.access.key") == "AK1"

    def test_parquet_table_kwargs_thread_through(self, spark, tmp_path):
        """The reference's ParquetTable(boto3_session=, endpoint_url=)
        surface: options are captured at construction and applied to the
        session when the table is read."""
        src = str(tmp_path / "t")
        spark.range(3).write.parquet(src)
        t = ParquetTable(
            "t",
            src,
            boto3_session=FakeSession(Creds("AKX", "SKX", None)),
            endpoint_url="http://minio:9000",
        )
        assert t.storage_options["aws_access_key_id"] == "AKX"
        assert t(spark=spark).count() == 3  # local path: conf is global
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        assert hconf.get("fs.s3a.access.key") == "AKX"
        assert hconf.get("fs.s3a.endpoint") == "http://minio:9000"

    def test_per_call_credentials_override_constructor(
        self, spark, tmp_path
    ):
        """r3 verdict item 5: the reference accepts boto3_session/
        endpoint_url per __call__ (parquet_table.py:247-276); per-call
        values must win over construction-time ones and reach the
        session's fs.s3a confs before the scan."""
        src = str(tmp_path / "t2")
        spark.range(2).write.parquet(src)
        t = ParquetTable(
            "t2", src, boto3_session=FakeSession(Creds("OLD", "S0", None))
        )
        assert (
            t(
                spark=spark,
                boto3_session=FakeSession(Creds("NEW", "S1", None)),
                endpoint_url="http://minio:9001",
            ).count()
            == 2
        )
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        assert hconf.get("fs.s3a.access.key") == "NEW"
        assert hconf.get("fs.s3a.endpoint") == "http://minio:9001"
        # plain storage_options dict works per call too
        t(spark=spark, storage_options={"aws_access_key_id": "DICT"})
        assert hconf.get("fs.s3a.access.key") == "DICT"

    def test_unknown_call_kwargs_raise(self, spark, tmp_path):
        """Silent **kwargs swallowing hid typos (r3 verdict item 5)."""
        src = str(tmp_path / "t3")
        spark.range(1).write.parquet(src)
        t = ParquetTable("t3", src)
        with pytest.raises(TypeError, match="unknown arguments.*versionn"):
            t(spark=spark, versionn=3)

    def test_delta_table_per_call_credentials(self, spark, tmp_path):
        from datarepo_spark.tables.delta_table import DeltalakeTable
        from datarepo_spark.tables.delta_writer import write_delta

        uri = str(tmp_path / "d1")
        write_delta(spark.range(3).toDF("v"), uri)
        t = DeltalakeTable("d1", uri)
        n = t(
            spark=spark,
            boto3_session=FakeSession(Creds("DLT", "SK", None)),
        ).count()
        assert n == 3
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        assert hconf.get("fs.s3a.access.key") == "DLT"
        with pytest.raises(TypeError, match="unknown arguments"):
            t(spark=spark, nonsense=True)
