"""The tokenized-sequence corpus: deterministic synthesis of the pipeline input.

Input table shape (BASELINE.json input_hint):

    doc_id : string       "doc-%08d"
    tokens : list<int32>  token_id(word) per whitespace word of the doc text
    n_tok  : int32        == len(tokens)
    source : string       low-cardinality origin tag ("src0".."src19")

plus a derived ``raw`` log line so the parse stage does real work — the
analog of the line a filelog receiver would emit before the regex parser
runs (pkg/stanza/fileconsumer/file.go:156-176 tokenizes lines;
pkg/stanza/operator/parser/regex/parser.go:38-48 extracts named captures):

    raw = "<ts> <severity> source=<source> doc=<doc_id> n=<n_tok> msg=m<k>"

Every derived scalar is a pure deterministic function of the source
``documents`` table that DuckDB can also compute (see RAW_SQL_CTE below),
so the whole parse→route→aggregate pipeline is oracle-checkable; per-row
``tokens`` equality is asserted in pytest against this generator.

This module is corpus *synthesis* (the stanza ``generate`` input analog,
pkg/stanza/operator/input/generate) — in production the corpus would
already exist as Parquet shards and the pipeline starts at
``ray.data.read_parquet``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import md5_u64_many, token_id
from .tables import table_path

SEVERITIES = ("DEBUG", "INFO", "WARN", "ERROR", "FATAL")
TS_BASE = 1704067200  # 2024-01-01T00:00:00Z


def _doc_id_strings(ids: np.ndarray, offset: int) -> np.ndarray:
    """Format numeric ids as ``doc-<zero-padded>``, collision-free.

    ``np.char.zfill(a, w)`` TRUNCATES strings longer than ``w`` (its width is
    the output itemsize), so the historical ``zfill(ids.astype('U8'), 8)``
    silently collided doc_ids once replica offsets pushed ids past 8 digits
    (ADVICE r1). Width is derived from the replica offset — constant for
    every batch of a replica (replicas span < 10^7 ids), minimum 8 to keep
    the base corpus format ``doc-00000126`` byte-stable for the oracles.
    """
    width = max(8, len(str(offset + 9_999_999)))
    return np.char.add("doc-", np.char.zfill(ids.astype(f"U{width}"), width))


class BuildCorpus:
    """map_batches callable: documents batch -> corpus batch (stateless)."""

    def __init__(self, with_raw: bool = True, rep: int = 0):
        self.with_raw = with_raw
        # replication offset: rep r shifts doc ids by r*10_000_000 so the
        # bench can scale row count without changing per-row semantics
        self.offset = rep * 10_000_000

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False) + self.offset
        texts = batch.column("text").to_pylist()
        sources = batch.column("source")

        doc_ids = _doc_id_strings(ids, self.offset)
        token_lists = []
        n_tok = np.empty(len(texts), dtype=np.int32)
        for i, t in enumerate(texts):
            words = t.split(" ")
            n_tok[i] = len(words)
            token_lists.append([token_id(w) for w in words])

        h = md5_u64_many(doc_ids)
        sev_idx = (h % 5).astype(np.int64)
        severities = np.array(SEVERITIES, dtype=object)[sev_idx]
        ts = TS_BASE + (ids % 86400)

        cols = {
            "doc_id": pa.array(doc_ids, pa.string()),
            "tokens": pa.array(token_lists, pa.list_(pa.int32())),
            "n_tok": pa.array(n_tok, pa.int32()),
            "source": sources,
        }
        if self.with_raw:
            msg = (h % 1000).astype(np.int64)
            raw = [
                f"{ts[i]} {severities[i]} source={sources[i]} doc={doc_ids[i]} "
                f"n={n_tok[i]} msg=m{msg[i]:03d}"
                for i in range(len(texts))
            ]
            cols["raw"] = pa.array(raw, pa.string())
        return pa.table(cols)


class _ReplicatedBuild:
    """Emit ``replicate`` id-shifted corpus copies per input batch (one read).

    The expensive part — text split + token-id mapping — runs ONCE per batch;
    each replica reuses the tokens/n_tok/source buffers zero-copy and only
    re-derives the id-dependent columns (doc_id, severity, ts, raw).
    """

    def __init__(self, with_raw: bool, replicate: int):
        self.with_raw = with_raw
        self.replicate = replicate

    def __call__(self, batch: pa.Table):
        ids0 = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        sources = batch.column("source")

        token_lists = []
        n_tok = np.empty(len(texts), dtype=np.int32)
        for i, t in enumerate(texts):
            words = t.split(" ")
            n_tok[i] = len(words)
            token_lists.append([token_id(w) for w in words])
        tokens_arr = pa.array(token_lists, pa.list_(pa.int32()))
        n_tok_arr = pa.array(n_tok, pa.int32())
        src_list = sources.to_pylist()

        for rep in range(self.replicate):
            offset = rep * 10_000_000
            ids = ids0 + offset
            doc_ids = _doc_id_strings(ids, offset)
            h = md5_u64_many(doc_ids)
            cols = {
                "doc_id": pa.array(doc_ids, pa.string()),
                "tokens": tokens_arr,
                "n_tok": n_tok_arr,
                "source": sources,
            }
            if self.with_raw:
                sev_idx = (h % 5).astype(np.int64)
                severities = np.array(SEVERITIES, dtype=object)[sev_idx]
                ts = TS_BASE + (ids % 86400)
                msg = (h % 1000).astype(np.int64)
                cols["raw"] = pa.array(
                    [
                        f"{ts[i]} {severities[i]} source={src_list[i]} "
                        f"doc={doc_ids[i]} n={n_tok[i]} msg=m{msg[i]:03d}"
                        for i in range(len(texts))
                    ],
                    pa.string(),
                )
            yield pa.table(cols)


def corpus_dataset(
    sf_dir: str,
    with_raw: bool = True,
    replicate: int = 1,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Read documents.parquet and derive the tokenized-sequence corpus.

    ``replicate`` > 1 yields shifted copies (distinct doc_ids) per batch to
    scale the bench corpus without external data — one read, one map stage.
    """
    path = table_path(sf_dir, "documents")
    ds = ray.data.read_parquet(
        path,
        columns=["doc_id", "text", "source"],
        override_num_blocks=override_num_blocks,
    )
    if replicate == 1:
        return ds.map_batches(
            BuildCorpus(with_raw=with_raw),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return ds.map_batches(
        _ReplicatedBuild(with_raw, replicate),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# DuckDB CTE reproducing every derived scalar column (used by oracle_sql()).
# md5_number_upper(s) == int.from_bytes(md5(s).digest()[:8], "little").
RAW_SQL_CTE = """
corpus AS (
    SELECT
        printf('doc-%08d', doc_id) AS doc_id,
        CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok,
        source,
        CAST(1704067200 + (doc_id % 86400) AS BIGINT) AS ts,
        CASE CAST(md5_number_upper(printf('doc-%08d', doc_id)) % 5 AS INTEGER)
            WHEN 0 THEN 'DEBUG' WHEN 1 THEN 'INFO' WHEN 2 THEN 'WARN'
            WHEN 3 THEN 'ERROR' ELSE 'FATAL' END AS severity
    FROM documents
)
"""


# ---- enrich lookup table (F2): source -> team/env/sink_hint ----------------
# Known sources are src0..src17; src18/src19 are deliberately absent so the
# null-passthrough path is exercised (reference leaves resource unmodified
# when no pod association matches, k8sattributesprocessor/processor.go:141+).

N_KNOWN_SOURCES = 18
ENVS = ("prod", "staging", "dev")


def enrich_lookup() -> dict[str, dict[str, str]]:
    out = {}
    for k in range(N_KNOWN_SOURCES):
        out[f"src{k}"] = {
            "team": f"team-{k % 4}",
            "env": ENVS[k % 3],
            "sink_hint": f"hint-{k % 2}",
        }
    return out


ENRICH_SQL_CTE = """
enriched AS (
    SELECT c.*,
        CASE WHEN k < 18 THEN 'team-' || CAST(k % 4 AS VARCHAR) END AS team,
        CASE WHEN k >= 18 THEN NULL
             WHEN k % 3 = 0 THEN 'prod' WHEN k % 3 = 1 THEN 'staging'
             ELSE 'dev' END AS env,
        CASE WHEN k < 18 THEN 'hint-' || CAST(k % 2 AS VARCHAR) END AS sink_hint
    FROM (SELECT *, CAST(substr(source, 4) AS INTEGER) AS k FROM corpus) c
)
"""


# ---- routing rule table (F3): first-match-wins ------------------------------

ROUTING_RULES = [
    ('env == "prod" and n_tok > 60', "sink-archive"),
    ('severity in ("ERROR", "FATAL")', "sink-alerts"),
    ("n_tok < 20", "sink-short"),
]
DEFAULT_SINK = "sink-default"

ROUTE_SQL_CASE = """
CASE
    WHEN env = 'prod' AND n_tok > 60 THEN 'sink-archive'
    WHEN severity IN ('ERROR', 'FATAL') THEN 'sink-alerts'
    WHEN n_tok < 20 THEN 'sink-short'
    ELSE 'sink-default'
END
"""
