"""URL/domain blocklist filtering — the C4/RefinedWeb-style pretraining
hygiene pass (no reference analog; a training-data operator).

Semantics:

- hosts extract from absolute URLs (``scheme://[user@]host[:port]/…``)
  vectorized via one ``pyarrow.compute.extract_regex`` pass; userinfo
  and ports strip, hosts lowercase; URL-less rows have no host and are
  never blocked.
- a host is blocked when it equals a blocklist entry OR is a subdomain
  of one (``a.b.dom.com`` matches entry ``dom.com``) — the standard
  registrable-domain suffix rule without a public-suffix database
  (entries are expected at the granularity the operator of the list
  chose; documented).
- ``mode="drop"`` removes blocked rows, ``mode="keep"`` retains only
  them (audit mode), ``mode="tag"`` appends a ``url_blocked`` bool.

Scale shape: the blocklist ships ONCE via ``ray.put`` and is read
zero-copy per task (the broadcast-small-side convention); per batch the
suffix checks run once per DISTINCT host (``pc.unique`` → python
membership over the bounded distinct set → ``index_in`` gather — the
vocabulary trick), so cost is bounded by distinct hosts per block, not
rows. Block-local, zero shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?(?P<host>[^/?#:]+)"


def extract_hosts(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Lowercased hostnames (null where no absolute URL)."""
    ex = pc.extract_regex(urls, _HOST_RE)
    host = pc.struct_field(ex, "host")
    return pc.utf8_lower(host)


def _host_blocked(host: str, blocked: set) -> bool:
    if host in blocked:
        return True
    i = host.find(".")
    while i != -1:
        if host[i + 1:] in blocked:
            return True
        i = host.find(".", i + 1)
    return False


class _UrlFilter:
    """Task-based cheap-state stage: holds the ray.put ref and lazy-gets
    the blocklist per task (zero-copy plasma; the decontaminate
    convention — no actor-pool spin-up for a set lookup)."""

    def __init__(self, url_col: str, blocklist_ref, mode: str):
        self.url_col = url_col
        self.blocklist_ref = blocklist_ref
        self.mode = mode
        self._blocked = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._blocked is None:
            obj = self.blocklist_ref
            self._blocked = set(ray.get(obj)) if isinstance(
                obj, ray.ObjectRef) else set(obj)
        hosts = extract_hosts(batch.column(self.url_col))
        uniq = pc.unique(hosts)
        flags = pa.array(
            [False if h is None else _host_blocked(h, self._blocked)
             for h in uniq.to_pylist()], pa.bool_())
        idx = pc.index_in(hosts, uniq)
        blocked = pc.fill_null(pc.take(flags, idx), False)
        if self.mode == "tag":
            return batch.append_column("url_blocked", blocked)
        keep = blocked if self.mode == "keep" else pc.invert(blocked)
        return batch.filter(keep)


def filter_urls(ds, url_col: str = "url", *, blocklist,
                mode: str = "drop"):
    """Blocklist-filter rows by URL domain (drop | keep | tag)."""
    if mode not in ("drop", "keep", "tag"):
        raise ValueError(f"mode must be drop|keep|tag, got {mode!r}")
    ref = ray.put(sorted(set(blocklist)))
    return ds.map_batches(_UrlFilter(url_col, ref, mode),
                          batch_format="pyarrow", zero_copy_batch=True)
