"""awss3exporter / azureblobexporter analog: object-store partition
key and blob-name construction for the engine's partitioned sinks.

Parity with exporter/awss3exporter/internal/upload/partition.go:

- ``Build(ts, overridePrefix)`` = path.Join(bucketKeyPrefix, fileName)
  with Go path-Clean semantics (:47-49).
- bucketKeyPrefix (:51-62): prefix (overridden only by a NON-EMPTY
  override) + "/" + strftime(PartitionFormat) — the reference renders
  via timefmt-go strftime; the common directive set maps 1:1 onto
  Python strftime.
- fileName (:64-76): ``FilePrefix + Metadata + "_" + uniqueKey
  [+ "." + FileFormat][+ ".gz" when gzip]``.
- uniqueKey (:78-89): the custom func when provided and non-empty,
  else the 100000000..999999999 random int — the batch engine default
  is a DETERMINISTIC shard id (rand would break resumability and the
  oracles); the random fallback is available via ``rng``.
- resource-attr overrides (exporter.go:43-61): the configured
  resource attribute keys supply per-resource bucket/prefix.

And exporter/azureblobexporter/exporter.go:165-194:

- blob name = Go-layout-formatted now + "_" + serial, where
  ``serial_num_before_extension`` moves the serial before the
  filepath.Ext suffix; serial = random in [0, SerialNumRange)
  (deterministic injection here for the same reason).

The stage assigns every row its partition directory + object key so
``write_routed`` / parquet partitioning can fan files out exactly as
the exporters would (time-bucketed, per-resource-prefix, resumable —
one object per (partition, shard)).
"""

from __future__ import annotations

import posixpath

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.converters import gotime_to_strptime

COMPRESSION_EXT = {"gzip": ".gz"}


def _go_path_join(a: str, b: str) -> str:
    """Go path.Join: join non-empty elements with '/', then Clean."""
    parts = [p for p in (a, b) if p != ""]
    if not parts:
        return ""
    joined = "/".join(parts)
    cleaned = posixpath.normpath(joined)
    return cleaned


class PartitionKeyBuilder:
    """upload/partition.go PartitionKeyBuilder."""

    def __init__(self, partition_prefix="", partition_format="",
                 file_prefix="", file_format="", metadata="",
                 compression=None, unique_key_func=None, rng=None):
        self.partition_prefix = partition_prefix
        self.partition_format = partition_format
        self.file_prefix = file_prefix
        self.file_format = file_format
        self.metadata = metadata
        self.compression = compression
        self.unique_key_func = unique_key_func
        self.rng = rng

    def bucket_key_prefix(self, ts, override_prefix: str = "") -> str:
        prefix = self.partition_prefix
        if override_prefix != "":
            prefix = override_prefix
        if prefix != "":
            prefix += "/"
        return prefix + (ts.strftime(self.partition_format)
                         if self.partition_format else "")

    def file_name(self, unique: "str | None" = None) -> str:
        suffix = ""
        if self.file_format:
            suffix = "." + self.file_format
        suffix += COMPRESSION_EXT.get(self.compression or "", "")
        return (f"{self.file_prefix}{self.metadata}_"
                f"{self._unique_key(unique)}{suffix}")

    def _unique_key(self, unique=None) -> str:
        if unique is not None:
            return unique
        if self.unique_key_func is not None:
            k = self.unique_key_func()
            if k:
                return k
        if self.rng is None:
            raise ValueError(
                "deterministic unique key required: pass unique/"
                "unique_key_func, or rng for the reference's random "
                "fallback")
        return str(100000000 + int(self.rng.integers(0, 899999999)))

    def build(self, ts, override_prefix: str = "",
              unique: "str | None" = None) -> str:
        return _go_path_join(self.bucket_key_prefix(ts, override_prefix),
                             self.file_name(unique))


def s3_upload_opts(resource_attrs: dict, *, s3_prefix_attr: str = "",
                   s3_bucket_attr: str = "") -> tuple[str, str]:
    """exporter.go getUploadOpts: per-resource (bucket, prefix)
    overrides from configured attribute keys."""
    prefix = bucket = ""
    if s3_prefix_attr and s3_prefix_attr in (resource_attrs or {}):
        prefix = str(resource_attrs[s3_prefix_attr])
    if s3_bucket_attr and s3_bucket_attr in (resource_attrs or {}):
        bucket = str(resource_attrs[s3_bucket_attr])
    return bucket, prefix


def azure_blob_name(layout: str, serial: int, *,
                    serial_before_extension: bool = False,
                    ts=None) -> str:
    """azureblobexporter generateBlobName: Go-layout time + _serial,
    optionally placed before the filepath extension."""
    import datetime as _dt

    ts = ts or _dt.datetime(1970, 1, 1)
    if serial_before_extension:
        root, ext = posixpath.splitext(layout)
        return f"{ts.strftime(gotime_to_strptime(root))}_{serial}{ext}"
    return f"{ts.strftime(gotime_to_strptime(layout))}_{serial}"


class AssignObjectKeys:
    """Stamp (s3_bucket, partition_dir, object_key) per row from a ns
    timestamp column + optional per-resource prefix/bucket attr
    columns. Vectorized: strftime runs once per DISTINCT time bucket
    (vocabulary trick), shard ids come from a deterministic shard
    column."""

    def __init__(self, builder: PartitionKeyBuilder, ts_col="time_ns",
                 prefix_col=None, bucket_col=None, shard_col=None):
        self.b = builder
        self.ts_col = ts_col
        self.prefix_col = prefix_col
        self.bucket_col = bucket_col
        self.shard_col = shard_col

    def __call__(self, tab: pa.Table) -> pa.Table:
        import datetime as _dt

        ns = tab.column(self.ts_col).to_numpy(zero_copy_only=False)
        # bucket to seconds; strftime once per distinct second
        secs = (ns // 1_000_000_000).astype(np.int64)
        uniq, inv = np.unique(secs, return_inverse=True)
        fmt = self.b.partition_format
        rendered = np.asarray(
            [(_dt.datetime(1970, 1, 1) + _dt.timedelta(seconds=int(s)))
             .strftime(fmt) if fmt else "" for s in uniq], object)
        buckets = rendered[inv]

        prefixes = (tab.column(self.prefix_col).to_pylist()
                    if self.prefix_col else [""] * tab.num_rows)
        shards = (tab.column(self.shard_col).to_pylist()
                  if self.shard_col else list(range(tab.num_rows)))

        dirs, keys = [], []
        for bucket, prefix, shard in zip(buckets, prefixes, shards):
            pfx = prefix if prefix else self.b.partition_prefix
            d = (pfx + "/" if pfx else "") + bucket
            dirs.append(d)
            keys.append(_go_path_join(
                d, self.b.file_name(str(shard))))
        out = {c: tab.column(c) for c in tab.column_names}
        if self.bucket_col:
            out["s3_bucket"] = tab.column(self.bucket_col)
        out["partition_dir"] = pa.array(dirs, pa.string())
        out["object_key"] = pa.array(keys, pa.string())
        return pa.table(out)


def assign_object_keys(ds, builder: PartitionKeyBuilder, *,
                       ts_col="time_ns", prefix_col=None,
                       bucket_col=None, shard_col=None):
    """Assign every row its exporter-equivalent partition dir + object
    key (feeds write_routed for the actual fan-out write)."""
    return ds.map_batches(
        AssignObjectKeys(builder, ts_col, prefix_col, bucket_col,
                         shard_col),
        batch_format="pyarrow", zero_copy_batch=True)
