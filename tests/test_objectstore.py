"""awss3exporter partition-key + azureblobexporter blob-name parity.

Vectors from exporter/awss3exporter/internal/upload/partition_test.go
(TestPartitionKeyInputsNewPartitionKey, ts = 2024-01-24 06:40:20) and
azureblobexporter's generateBlobName rules.
"""

import datetime

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.objectstore import (
    AssignObjectKeys,
    PartitionKeyBuilder,
    azure_blob_name,
    s3_upload_opts,
)

TS = datetime.datetime(2024, 1, 24, 6, 40, 20)
FMT = "year=%Y/month=%m/day=%d/hour=%H/minute=%M"


def test_partition_key_vectors():
    fixed = lambda: "fixed"  # noqa: E731
    assert PartitionKeyBuilder(unique_key_func=fixed).build(TS) == \
        "_fixed"
    assert PartitionKeyBuilder(partition_prefix="telemetry",
                               unique_key_func=fixed).build(TS) == \
        "telemetry/_fixed"
    assert PartitionKeyBuilder(
        partition_prefix="telemetry/foo", partition_format="",
        file_prefix="signal-output-", file_format="metrics",
        unique_key_func=fixed).build(TS) == \
        "telemetry/foo/signal-output-_fixed.metrics"
    b = PartitionKeyBuilder(
        partition_prefix="/telemetry", partition_format=FMT,
        file_prefix="signal-output-", metadata="service-01_pod2",
        file_format="metrics", unique_key_func=fixed)
    assert b.build(TS) == \
        ("/telemetry/year=2024/month=01/day=24/hour=06/minute=40/"
         "signal-output-service-01_pod2_fixed.metrics")
    b.compression = "gzip"
    assert b.build(TS).endswith("_fixed.metrics.gz")
    # non-empty override replaces the configured prefix
    assert b.build(TS, override_prefix="/foo-prefix1") == \
        ("/foo-prefix1/year=2024/month=01/day=24/hour=06/minute=40/"
         "signal-output-service-01_pod2_fixed.metrics.gz")
    # empty override keeps it
    assert b.build(TS, override_prefix="").startswith("/telemetry/")


def test_unique_key_fallbacks():
    # empty custom-func result falls through to the random int range
    import numpy as np
    b = PartitionKeyBuilder(unique_key_func=lambda: "",
                            rng=np.random.default_rng(7))
    key = b.build(TS)
    n = int(key[1:])
    assert 100000000 <= n <= 999999999
    # deterministic engines must inject uniqueness explicitly
    try:
        PartitionKeyBuilder().build(TS)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_s3_upload_opts():
    res = {"tenant.prefix": "t1", "dest.bucket": "b9"}
    assert s3_upload_opts(res, s3_prefix_attr="tenant.prefix",
                          s3_bucket_attr="dest.bucket") == ("b9", "t1")
    assert s3_upload_opts(res) == ("", "")
    assert s3_upload_opts({}, s3_prefix_attr="x") == ("", "")


def test_azure_blob_name():
    # config example: "2006/01/02/metrics_15_04_05.json"
    name = azure_blob_name("2006/01/02/metrics_15_04_05.json",
                           serial=123, ts=TS)
    assert name == "2024/01/24/metrics_06_40_20.json_123"
    name = azure_blob_name("2006/01/02/metrics_15_04_05.json",
                           serial=123, serial_before_extension=True,
                           ts=TS)
    assert name == "2024/01/24/metrics_06_40_20_123.json"


def test_assign_object_keys_stage():
    b = PartitionKeyBuilder(partition_prefix="telemetry",
                            partition_format="dt=%Y-%m-%d/hr=%H",
                            file_prefix="logs-", file_format="parquet")
    ts0 = int(TS.timestamp()) * 1_000_000_000
    tab = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "time_ns": pa.array([ts0, ts0, ts0 + 3600 * 10**9], pa.int64()),
        "pfx": pa.array(["", "tenant-a", ""], pa.string()),
        "shard": pa.array([10, 11, 12], pa.int64()),
    })
    out = AssignObjectKeys(b, ts_col="time_ns", prefix_col="pfx",
                           shard_col="shard")(tab)
    keys = out.column("object_key").to_pylist()
    assert keys[0] == ("telemetry/dt=2024-01-24/hr=06/logs-_10.parquet")
    assert keys[1] == ("tenant-a/dt=2024-01-24/hr=06/logs-_11.parquet")
    assert keys[2] == ("telemetry/dt=2024-01-24/hr=07/logs-_12.parquet")
    dirs = out.column("partition_dir").to_pylist()
    assert dirs[1] == "tenant-a/dt=2024-01-24/hr=06"
