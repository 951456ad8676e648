"""kafkametricsreceiver consumer-scraper analog: consumer-group
offset blocks + partition high-water marks → kafka.consumer_group.*
metric rows with the derived lag math.

Parity with receiver/kafkametricsreceiver
(consumer_scraper.go:53-166, factory.go defaults, metadata.yaml):

- inputs: a Dataset of consumer-offset blocks ``(group, topic,
  partition, offset)`` (ListConsumerGroupOffsets — entries exist for
  every requested topic-partition, offset −1 = never consumed), a
  SMALL partition high-water-mark table ``(topic, partition,
  offset)`` (GetOffset newest — broadcast via ``ray.put``), and a
  ``{group: member_count}`` map (DescribeConsumerGroups).  The sarama
  admin/client sessions are ingest transport.
- filters: ``group_match`` (default ``.*``) and ``topic_match``
  (default ``^[^_].*$`` — internal topics excluded) use Go
  ``MatchString`` = SEARCH semantics, applied to the distinct values
  (vocabulary trick) before any math.
- per (group, topic): the whole block set is SKIPPED unless at least
  one partition has offset ≠ −1 (isConsumed,
  consumer_scraper.go:130-137).  When consumed: one offset gauge per
  partition (−1 offsets included), one lag gauge per partition where
  lag = hwm − consumer_offset only when the partition has a
  high-water mark AND the offset ≠ −1, else −1 (:145-154);
  offset_sum adds EVERY offset (−1 too), lag_sum adds only measured
  lags (:138-152).
- one non-monotonic members Sum per described group; resource
  kafka.cluster.alias.

Execution shape: pass A = per-block vectorized (group, topic)
partials (consumed-any / offset-sum / lag-sum; bounded by groups ×
topics × blocks) merged on the driver; pass B = distributed per-row
offset/lag emission gated by the broadcast consumed set; the tiny sum
+ members rows append driver-side.  The hwm table is broadcast once,
never re-shipped per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SCHEMA = (("name", pa.string()), ("mtype", pa.string()),
           ("is_monotonic", pa.bool_()),
           ("aggregation_temporality", pa.int32()),
           ("value_int", pa.int64()), ("group", pa.string()),
           ("topic", pa.string()), ("partition", pa.int64()),
           ("cluster_alias", pa.string()),
           ("time_unix_nano", pa.int64()))


def _match_mask(arr: pa.ChunkedArray, pattern: str) -> np.ndarray:
    """Go MatchString (search) over distinct values, gathered back."""
    rx = re.compile(pattern)
    uniq = pc.unique(pa.chunked_array(arr.chunks
                                      if hasattr(arr, "chunks")
                                      else [arr]))
    ok = pa.array([bool(rx.search(u)) for u in uniq.to_pylist()],
                  pa.bool_())
    idx = pc.index_in(arr, value_set=uniq)
    return pc.take(ok, idx).to_numpy(zero_copy_only=False)


def _rows_table(names, values, groups, topics, partitions, alias,
                now_ns) -> pa.Table:
    n = len(values)
    return pa.table({
        "name": pa.array(names, pa.string()),
        "mtype": pa.array(["gauge"] * n, pa.string()),
        "is_monotonic": pa.array([None] * n, pa.bool_()),
        "aggregation_temporality": pa.array([0] * n, pa.int32()),
        "value_int": pa.array(values, pa.int64()),
        "group": pa.array(groups, pa.string()),
        "topic": pa.array(topics, pa.string()),
        "partition": pa.array(partitions, pa.int64()),
        "cluster_alias": pa.array([alias] * n, pa.string()),
        "time_unix_nano": pa.array([now_ns] * n, pa.int64()),
    })


class _Partials:
    """Pass A: per-(group, topic) partials for one block."""

    def __init__(self, group_match, topic_match):
        self.group_match = group_match
        self.topic_match = topic_match

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"group": pa.array([], pa.string()),
                             "topic": pa.array([], pa.string()),
                             "consumed": pa.array([], pa.int64()),
                             "offset_sum": pa.array([], pa.int64()),
                             "lag_sum": pa.array([], pa.int64())})
        keep = (_match_mask(batch.column("group"), self.group_match)
                & _match_mask(batch.column("topic"), self.topic_match))
        t = batch.filter(pa.array(keep))
        gt = pc.binary_join_element_wise(t.column("group"),
                                         t.column("topic"), "\x00")
        codes = gt.combine_chunks().dictionary_encode()
        idx = np.asarray(codes.indices)
        uniq = codes.dictionary.to_pylist()
        off = t.column("offset").to_numpy(zero_copy_only=False)
        lag = t.column("_lag").to_numpy(zero_copy_only=False)
        measured = t.column("_measured").to_numpy(
            zero_copy_only=False)
        k = len(uniq)
        consumed = np.bincount(idx[off != -1], minlength=k)
        # exact int64 accumulation (bincount weights would go float)
        offset_sum = np.zeros(k, np.int64)
        np.add.at(offset_sum, idx, off)
        # lagSum adds MEASURED lags only — a measured lag may equal −1
        # (hwm − off == −1), so the flag travels separately
        lag_sum = np.zeros(k, np.int64)
        np.add.at(lag_sum, idx[measured], lag[measured])
        gs, ts = zip(*(u.split("\x00", 1) for u in uniq)) if uniq \
            else ((), ())
        return pa.table({"group": pa.array(list(gs), pa.string()),
                         "topic": pa.array(list(ts), pa.string()),
                         "consumed": pa.array(consumed, pa.int64()),
                         "offset_sum": pa.array(offset_sum, pa.int64()),
                         "lag_sum": pa.array(lag_sum, pa.int64())})


class _StampLag:
    """Stamp per-row lag + measured columns (hwm via the broadcast
    ref, dict built once per task — the cheap-state pattern)."""

    def __init__(self, hwm_ref):
        self.hwm_ref = hwm_ref
        self._hwm = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._hwm is None:
            t = ray.get(self.hwm_ref)
            self._hwm = {(tp, p): o for tp, p, o in zip(
                t.column("topic").to_pylist(),
                t.column("partition").to_pylist(),
                t.column("offset").to_pylist())}
        off = batch.column("offset").to_numpy(zero_copy_only=False)
        topics = batch.column("topic").to_pylist()
        parts = batch.column("partition").to_pylist()
        lag = np.full(len(off), -1, dtype=np.int64)
        measured = np.zeros(len(off), dtype=bool)
        for i, (t, p) in enumerate(zip(topics, parts)):
            h = self._hwm.get((t, p))
            if h is not None and off[i] != -1:
                lag[i] = h - off[i]
                measured[i] = True
        batch = batch.append_column("_lag", pa.array(lag, pa.int64()))
        return batch.append_column("_measured",
                                   pa.array(measured, pa.bool_()))


def _with_lag(ds, hwm_ref):
    return ds.map_batches(_StampLag(hwm_ref), batch_format="pyarrow",
                          zero_copy_batch=True)


def consumer_lag_metrics(consumer_offsets, hwm: pa.Table,
                         members: dict, *, group_match: str = ".*",
                         topic_match: str = "^[^_].*$",
                         cluster_alias: str = "", now_ns: int = 0,
                         merge_driver_rows: int = 5_000_000):
    """Consumer-offset blocks → kafka.consumer_group.* metric rows.

    Partial merge is size-gated (the LSH/bloom gate convention): at or
    below ``merge_driver_rows`` partial rows the (group, topic) triples
    merge on the driver; above it ONE lean hash groupby-sum reduces
    them to a row per distinct pair first (bounded by group × topic
    cardinality, never by blocks).  Both paths are golden-tested
    identical; the count is metadata-only on the materialized
    partials."""
    import ray

    hwm_ref = ray.put(hwm)
    with_lag = _with_lag(consumer_offsets, hwm_ref).materialize()

    # pass A: tiny (group, topic) partials
    partials = with_lag.map_batches(
        _Partials(group_match, topic_match), batch_format="pyarrow",
        zero_copy_batch=True).materialize()
    if partials.count() > merge_driver_rows:
        # distributed reduce: one hash groupby-sum over the lean
        # partial triples, collect one row per distinct pair
        from .blocks import nonempty_blocks

        partials = nonempty_blocks(partials).groupby(
            ["group", "topic"]).sum(
            ["consumed", "offset_sum", "lag_sum"]).materialize()
        cols = {c: (f"sum({c})" if f"sum({c})"
                    in partials.schema().names else c)
                for c in ("consumed", "offset_sum", "lag_sum")}
    else:
        cols = {c: c for c in ("consumed", "offset_sum", "lag_sum")}
    merged: dict = {}
    for ref in partials.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0 or "group" not in t.schema.names:
            continue
        for g, tp, c, os_, ls in zip(
                t.column("group").to_pylist(),
                t.column("topic").to_pylist(),
                t.column(cols["consumed"]).to_pylist(),
                t.column(cols["offset_sum"]).to_pylist(),
                t.column(cols["lag_sum"]).to_pylist()):
            e = merged.setdefault((g, tp), [0, 0, 0])
            e[0] += c
            e[1] += os_
            e[2] += ls
    consumed_set = {k for k, v in merged.items() if v[0] > 0}
    consumed_ref = ray.put(consumed_set)

    gm, tm = group_match, topic_match

    def emit_rows(batch: pa.Table) -> pa.Table:
        cset = ray.get(consumed_ref)
        if batch.num_rows == 0:
            return _rows_table([], [], [], [], [], cluster_alias,
                               now_ns)
        keep = (_match_mask(batch.column("group"), gm)
                & _match_mask(batch.column("topic"), tm))
        t = batch.filter(pa.array(keep))
        groups = t.column("group").to_pylist()
        topics = t.column("topic").to_pylist()
        parts = t.column("partition").to_pylist()
        offs = t.column("offset").to_pylist()
        lags = t.column("_lag").to_pylist()
        names, vals, gs, ts, ps = [], [], [], [], []
        for g, tp, p, o, lg in zip(groups, topics, parts, offs, lags):
            if (g, tp) not in cset:
                continue  # isConsumed gate
            names.append("kafka.consumer_group.offset")
            vals.append(o)
            gs.append(g)
            ts.append(tp)
            ps.append(p)
            names.append("kafka.consumer_group.lag")
            vals.append(lg)
            gs.append(g)
            ts.append(tp)
            ps.append(p)
        return _rows_table(names, vals, gs, ts, ps, cluster_alias,
                           now_ns)

    per_row = with_lag.map_batches(emit_rows, batch_format="pyarrow",
                                   zero_copy_batch=True)

    # tiny driver-side tables: sums + members
    names, vals, gs, ts, ps = [], [], [], [], []
    for (g, tp) in sorted(consumed_set):
        _c, osum, lsum = merged[(g, tp)]
        names += ["kafka.consumer_group.offset_sum",
                  "kafka.consumer_group.lag_sum"]
        vals += [osum, lsum]
        gs += [g, g]
        ts += [tp, tp]
        ps += [None, None]
    sums = _rows_table(names, vals, gs, ts, ps, cluster_alias, now_ns)
    mem_rows = pa.table({
        "name": pa.array(["kafka.consumer_group.members"]
                         * len(members), pa.string()),
        "mtype": pa.array(["sum"] * len(members), pa.string()),
        "is_monotonic": pa.array([False] * len(members), pa.bool_()),
        "aggregation_temporality": pa.array([2] * len(members),
                                            pa.int32()),
        "value_int": pa.array([int(v) for v in members.values()],
                              pa.int64()),
        "group": pa.array(list(members.keys()), pa.string()),
        "topic": pa.array([None] * len(members), pa.string()),
        "partition": pa.array([None] * len(members), pa.int64()),
        "cluster_alias": pa.array([cluster_alias] * len(members),
                                  pa.string()),
        "time_unix_nano": pa.array([now_ns] * len(members),
                                   pa.int64()),
    })
    import ray.data as rd

    return per_row.union(rd.from_arrow(pa.concat_tables(
        [sums, mem_rows])))
