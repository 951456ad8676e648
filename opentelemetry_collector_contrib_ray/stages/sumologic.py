"""sumologicprocessor: attribute-convention translation + cloud namespace.

Reference semantics (processor/sumologicprocessor/processor.go:47-55 —
subprocessor order: cloud namespace BEFORE attribute translation):

- ``add_cloud_namespace`` (cloud_namespace_processor.go:61-79): when
  ``cloud.platform`` is ``aws_ec2`` / ``aws_ecs`` /
  ``aws_elastic_beanstalk``, put ``cloud.namespace`` = ``aws/ec2`` /
  ``ecs`` / ``ElasticBeanstalk`` (PutStr: update-or-append). Other
  platforms add nothing.
- ``translate_attributes`` (translate_attributes_processor.go:19-42,
  86-112): rename OpenTelemetry attribute keys to Sumo Logic
  conventions with two collision guards — (1) if the row ALREADY has an
  attribute named like the translation target, the entry keeps its
  OpenTelemetry name; (2) when two entries translate to the same target
  (``host.name`` and ``k8s.pod.hostname`` both → ``host``), the first
  in map order wins and later ones are dropped (pcommon.Map rebuild via
  "only insert if absent").

Both are fully vectorized over the flattened entry children of a
map<string,string> column — packed (row, key-code) int64 membership
checks and a stable first-wins unique, no per-row Python. Block-local,
zero shuffle; at 100 TB these are free riders on whatever map stage
they're fused into.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.maps import _map_parts, _rebuild

# translate_attributes_processor.go:19-42 (verbatim table)
ATTRIBUTE_TRANSLATIONS = {
    "cloud.account.id": "AccountId",
    "cloud.availability_zone": "AvailabilityZone",
    "cloud.platform": "aws_service",
    "cloud.region": "Region",
    "host.id": "InstanceId",
    "host.name": "host",
    "host.type": "InstanceType",
    "k8s.cluster.name": "Cluster",
    "k8s.container.name": "container",
    "k8s.daemonset.name": "daemonset",
    "k8s.deployment.name": "deployment",
    "k8s.namespace.name": "namespace",
    "k8s.node.name": "node",
    "k8s.service.name": "service",
    "k8s.pod.hostname": "host",
    "k8s.pod.name": "pod",
    "k8s.pod.uid": "pod_id",
    "k8s.replicaset.name": "replicaset",
    "k8s.statefulset.name": "statefulset",
    "service.name": "service",
    "log.file.path_resolved": "_sourceName",
}

# cloud_namespace_processor.go:20-23 + conventions values
CLOUD_NAMESPACES = {
    "aws_ec2": "aws/ec2",
    "aws_ecs": "ecs",
    "aws_elastic_beanstalk": "ElasticBeanstalk",
}

CLOUD_PLATFORM_KEY = "cloud.platform"
CLOUD_NAMESPACE_KEY = "cloud.namespace"


def _entry_rows(lens: np.ndarray) -> np.ndarray:
    return np.repeat(np.arange(len(lens), dtype=np.int64), lens)


def sumo_translate_map(col, translations: dict[str, str] | None = None):
    """Sumo Logic attribute translation over a map column (collision
    rules exactly as translateAttributes, translate_attributes_processor
    .go:86-112). Returns a rebuilt MapArray."""
    trans = ATTRIBUTE_TRANSLATIONS if translations is None else translations
    col, lens, keys, items, nulls = _map_parts(col)
    n_entries = int(lens.sum())
    if not trans or n_entries == 0:
        return col

    ot = pa.array(list(trans.keys())).cast(keys.type)
    sumo = pa.array(list(trans.values())).cast(keys.type)
    target = pc.take(sumo, pc.index_in(keys, value_set=ot))
    has_target = pc.is_valid(target).to_numpy(zero_copy_only=False)

    # shared dictionary over original keys ∪ candidate target keys
    all_keys = pa.chunked_array(
        [keys, pc.fill_null(target, "")]).combine_chunks()
    codes = pc.fill_null(
        pc.dictionary_encode(all_keys).indices, 0
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    kcode, tcode = codes[:n_entries], codes[n_entries:]
    width = int(codes.max()) + 2
    rows = _entry_rows(lens)

    # guard 1: the row already holds an attribute named like the target
    existing = np.sort(rows * width + kcode)
    cand = rows * width + tcode
    pos = np.searchsorted(existing, cand)
    exists = existing[np.minimum(pos, n_entries - 1)] == cand
    renamed = has_target & ~exists

    new_keys = pc.if_else(pa.array(renamed), target, keys)
    new_code = np.where(renamed, tcode, kcode)

    # guard 2: first entry per (row, result-key) wins; later ones drop
    packed = rows * width + new_code
    order = np.argsort(packed, kind="stable")  # stable = entry order
    p_sorted = packed[order]
    first = np.ones(n_entries, dtype=bool)
    first[1:] = p_sorted[1:] != p_sorted[:-1]
    keep = np.zeros(n_entries, dtype=bool)
    keep[order[first]] = True

    return _rebuild(lens, keep, new_keys, items, nulls, col.type)


def add_cloud_namespace_map(col):
    """cloud.namespace derivation over a map column: update-or-append
    (PutStr semantics) for the three mapped AWS platforms."""
    col, lens, keys, items, nulls = _map_parts(col)
    n = len(lens)
    n_entries = int(lens.sum())
    if n_entries == 0:
        return col
    rows = _entry_rows(lens)

    is_platform = pc.equal(keys, CLOUD_PLATFORM_KEY).to_numpy(
        zero_copy_only=False)
    plat = pa.array(list(CLOUD_NAMESPACES.keys())).cast(items.type)
    ns = pa.array(list(CLOUD_NAMESPACES.values())).cast(items.type)
    mapped = pc.take(ns, pc.index_in(items, value_set=plat))
    hit = is_platform & pc.is_valid(mapped).to_numpy(zero_copy_only=False)

    # per-row namespace value (last platform entry wins, as Get does)
    row_ns = np.full(n, -1, dtype=np.int64)  # entry index providing ns
    row_ns[rows[hit]] = np.nonzero(hit)[0]
    has_ns = row_ns >= 0

    is_nskey = pc.equal(keys, CLOUD_NAMESPACE_KEY).to_numpy(
        zero_copy_only=False)
    row_has_key = np.zeros(n, dtype=bool)
    row_has_key[rows[is_nskey]] = True

    # update in place where the key already exists
    upd_entry = is_nskey & has_ns[rows]
    mapped_full = pc.fill_null(mapped, "")
    new_items = pc.if_else(
        pa.array(upd_entry), pc.take(mapped_full, pa.array(
            np.maximum(row_ns[rows], 0), pa.int64())), items)

    append = has_ns & ~row_has_key
    if not append.any():
        return _rebuild(lens, np.ones(n_entries, dtype=bool), keys,
                        new_items, nulls, col.type)

    # interleave one appended entry at each appending row's end
    new_lens = lens + append.astype(np.int64)
    new_off = np.concatenate(([0], np.cumsum(new_lens))).astype(np.int64)
    shift = np.concatenate(([0], np.cumsum(append.astype(np.int64))[:-1]))
    out_pos = np.arange(n_entries) + np.repeat(shift, lens)
    app_rows = np.nonzero(append)[0]
    app_pos = new_off[app_rows + 1] - 1

    total = n_entries + len(app_rows)
    gather = np.empty(total, dtype=np.int64)
    gather[out_pos] = np.arange(n_entries)
    gather[app_pos] = n_entries + np.arange(len(app_rows))

    keys_ext = pa.chunked_array([
        keys, pa.array([CLOUD_NAMESPACE_KEY] * len(app_rows), keys.type),
    ]).combine_chunks()
    items_ext = pa.chunked_array([
        new_items,
        pc.take(mapped_full, pa.array(row_ns[app_rows], pa.int64())),
    ]).combine_chunks()
    out_keys = pc.take(keys_ext, pa.array(gather, pa.int64()))
    out_items = pc.take(items_ext, pa.array(gather, pa.int64()))
    return _rebuild(new_lens, np.ones(total, dtype=bool), out_keys,
                    out_items, nulls, col.type)


class SumoLogic:
    """Batch callable: cloud namespace then attribute translation over a
    map-typed column, in the reference's subprocessor order."""

    def __init__(self, map_col: str = "attributes",
                 add_cloud_namespace: bool = True,
                 translate_attributes: bool = True):
        self.map_col = map_col
        self.add_ns = add_cloud_namespace
        self.translate = translate_attributes

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.map_col)
        if self.add_ns:
            col = add_cloud_namespace_map(col)
        if self.translate:
            col = sumo_translate_map(col)
        i = batch.column_names.index(self.map_col)
        return batch.set_column(i, self.map_col, col)
