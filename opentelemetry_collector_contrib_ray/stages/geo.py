"""GeoIP / DNS enrich — actor-held database-reader stages (§2.8 tail).

Reference semantics:

- geoipprocessor (processor/geoipprocessor/geoip_processor.go): for each
  record's IP attribute, look up a provider database (an mmdb file opened
  ONCE per instance) and attach geo attributes (country, city, asn).
- dnslookupprocessor (processor/dnslookupprocessor): resolve a hostname
  attribute to an IP via a resolver with a process-held cache.

Ray shape (the §2.8 actor pattern beyond plain dicts): the stage is a
callable CLASS for ``map_batches(concurrency=N)`` — ``__init__`` opens and
indexes the database file once per actor (the expensive part), ``__call__``
is a vectorized range/exact lookup. No codec or network dependencies exist
in this sandbox, so the database is a deterministic Parquet fixture with the
same *shape* as an mmdb range table (sorted ip_start/ip_end + attributes);
the lookup code is the real production path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def ip_to_u32(col) -> np.ndarray:
    """Dotted-quad string column -> uint32 host-order ints, vectorized."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.split_pattern(col, ".")
    flat = parts.flatten().cast(pa.int64()).to_numpy(zero_copy_only=False)
    quads = flat.reshape(len(col), 4)
    return (
        (quads[:, 0].astype(np.uint64) << 24)
        | (quads[:, 1].astype(np.uint64) << 16)
        | (quads[:, 2].astype(np.uint64) << 8)
        | quads[:, 3].astype(np.uint64)
    ).astype(np.uint32)


def build_demo_geodb(path: str, n_ranges: int = 16) -> str:
    """Write a deterministic mmdb-shaped range database: ``n_ranges`` equal
    slices of the IPv4 space, each with a synthetic country/asn."""
    width = (1 << 32) // n_ranges
    starts = np.arange(n_ranges, dtype=np.int64) * width
    tbl = pa.table({
        "ip_start": pa.array(starts, pa.int64()),
        "ip_end": pa.array(starts + width - 1, pa.int64()),
        "country": pa.array([f"C{i:02d}" for i in range(n_ranges)]),
        "asn": pa.array([64500 + i for i in range(n_ranges)], pa.int64()),
    })
    pq.write_table(tbl, path)
    return path


class GeoIPEnrich:
    """Actor-pool callable: ip column -> country/asn via a range database.

    ``__init__`` reads + sorts the database once per actor (mmdb-open
    analog); ``__call__`` is one searchsorted per batch. IPs outside every
    range get nulls (the reference emits no geo attributes on miss).
    """

    def __init__(self, db_path: str, ip_col: str = "ip"):
        db = pq.read_table(db_path).sort_by("ip_start")
        self.starts = db.column("ip_start").to_numpy(zero_copy_only=False).astype(np.uint64)
        self.ends = db.column("ip_end").to_numpy(zero_copy_only=False).astype(np.uint64)
        self.country = db.column("country").to_numpy(zero_copy_only=False)
        self.asn = db.column("asn").to_numpy(zero_copy_only=False)
        self.ip_col = ip_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ips = ip_to_u32(batch.column(self.ip_col)).astype(np.uint64)
        idx = np.searchsorted(self.starts, ips, side="right") - 1
        idx_c = np.clip(idx, 0, len(self.starts) - 1)
        hit = (idx >= 0) & (ips <= self.ends[idx_c])
        country = np.where(hit, self.country[idx_c], None)
        asn = np.where(hit, self.asn[idx_c], 0)
        batch = batch.append_column(
            "geo_country", pa.array(country.tolist(), pa.string())
        )
        return batch.append_column(
            "geo_asn",
            pa.array(np.where(hit, asn, None).tolist(), pa.int64()),
        )


class DNSLookup:
    """Actor-pool callable: hostname column -> resolved ip (table-backed
    resolver held per actor; unresolvable names pass through as null —
    the dnslookupprocessor's miss behavior)."""

    def __init__(self, db_path: str, host_col: str = "host",
                 out: str = "resolved_ip"):
        db = pq.read_table(db_path)
        self._hosts = db.column("host").combine_chunks() \
            if isinstance(db.column("host"), pa.ChunkedArray) else db.column("host")
        self._ips = db.column("ip").to_numpy(zero_copy_only=False)
        self.host_col = host_col
        self.out = out

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.host_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        idx = pc.index_in(col, value_set=self._hosts)
        valid = idx.is_valid().to_numpy(zero_copy_only=False)
        pos = np.where(valid,
                       np.nan_to_num(
                           idx.cast(pa.float64()).to_numpy(zero_copy_only=False),
                           nan=0).astype(np.int64),
                       0)
        resolved = np.where(valid, self._ips[pos], None)
        return batch.append_column(self.out,
                                   pa.array(resolved.tolist(), pa.string()))


def build_demo_dnsdb(path: str, n_hosts: int = 50) -> str:
    """Deterministic resolver table: host-k -> 10.0.<k//256>.<k%256>."""
    tbl = pa.table({
        "host": pa.array([f"host-{k}" for k in range(n_hosts)]),
        "ip": pa.array([f"10.0.{k // 256}.{k % 256}" for k in range(n_hosts)]),
    })
    pq.write_table(tbl, path)
    return path
