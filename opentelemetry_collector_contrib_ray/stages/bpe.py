"""BPE tokenizer-merge training + encoding (beyond the reference —
an LLM-data-pipeline operator; the reference's token machinery stops
at parsing/metrics, SURVEY §2 training-data extension).

Algorithm = the classic byte-pair-encoding merge training of
Sennrich et al. 2016 in the production shape GPT-2/HF tokenizers use:

1. distributed word counting — whitespace words with an end-of-word
   marker, per-block np.unique partials merged on the driver (the
   distinct-word table is VOCABULARY-BOUNDED, not corpus-bounded, so
   the driver merge is the same scale-safe move as the engine's
   count_sum partials; above ``distinct_gate`` the partials route
   through one hash-shuffle groupby first);
2. driver-side merge training over the word-count table — each
   iteration counts symbol pairs WEIGHTED by word frequency and merges
   the most frequent pair (ties: lexicographically smallest pair, a
   deterministic stand-in for undefined dict-order ties); training
   cost is bounded by distinct words × merges, never touches the
   corpus again;
3. distributed encoding — the learned merge ranks broadcast via
   ray.put; each worker encodes each DISTINCT word once per batch
   (vocabulary trick) by repeatedly merging the lowest-rank adjacent
   pair (greedy min-rank, the GPT-2 bpe() loop), then gathers
   per-word token sequences back to rows.

Determinism: no RNG anywhere; merges depend only on the word counts,
so the learned tokenizer is identical at any partitioning/cluster
size (pinned by test).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

END_OF_WORD = "</w>"


# ---------------------------------------------------------------------------
# phase 1: distributed word counts


class _WordCountPartial:
    def __init__(self, text_col: str, lowercase: bool):
        self.text_col = text_col
        self.lowercase = lowercase

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col)
        if self.lowercase:
            texts = pc.utf8_lower(texts)
        words = pc.split_pattern_regex(
            pc.fill_null(texts.cast(pa.string()), ""), r"\s+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.values.filter(
            pc.greater(pc.utf8_length(words.values), 0))
        w = np.asarray(flat.to_numpy(zero_copy_only=False), object)
        uniq, counts = np.unique(w.astype(str), return_counts=True)
        return pa.table({"word": pa.array(uniq, pa.string()),
                         "n": pa.array(counts, pa.int64())})


def word_counts(ds, text_col: str = "text", *, lowercase: bool = True,
                distinct_gate: int = 5_000_000) -> dict:
    """Distinct-word counts on the driver. Partials are bounded by
    distinct words × blocks; above distinct_gate rows they are first
    combined by one hash-shuffle groupby (the scale path)."""
    partial = ds.map_batches(_WordCountPartial(text_col, lowercase),
                             batch_format="pyarrow",
                             zero_copy_batch=True).materialize()
    total_rows = partial.count()  # materialized → metadata-only
    if total_rows > distinct_gate:
        partial = partial.groupby("word").sum("n").rename_columns(
            ["word", "n"]).materialize()
    out: dict = {}
    for ref in partial.to_arrow_refs():
        t = ray.get(ref)
        for word, n in zip(t.column("word").to_pylist(),
                           t.column("n").to_pylist()):
            out[word] = out.get(word, 0) + int(n)
    return out


# ---------------------------------------------------------------------------
# phase 2: driver-side merge training


def train_bpe_merges(wcounts: dict, n_merges: int) -> list:
    """Sennrich-style merge training over a word-count table. Returns
    the ordered merge list [(left, right), ...]."""
    words = {}
    for w, n in wcounts.items():
        symbols = tuple(list(w) + [END_OF_WORD])
        words[symbols] = words.get(symbols, 0) + n
    merges = []
    for _ in range(n_merges):
        pairs: dict = {}
        for symbols, n in words.items():
            for a, b in zip(symbols, symbols[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best_count = max(pairs.values())
        if best_count < 2:
            break
        best_pair = min(p for p, c in pairs.items() if c == best_count)
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        new_words = {}
        for symbols, n in words.items():
            out = []
            i = 0
            while i < len(symbols):
                if (i + 1 < len(symbols) and symbols[i] == a and
                        symbols[i + 1] == b):
                    out.append(ab)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + n
        words = new_words
    return merges


def encode_word(word: str, ranks: dict) -> list:
    """GPT-2 bpe() greedy min-rank merge loop for one word."""
    symbols = list(word) + [END_OF_WORD]
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        symbols[best_i:best_i + 2] = [symbols[best_i] +
                                      symbols[best_i + 1]]
    return symbols


def build_vocab(merges: list) -> dict:
    """token string → id. Ids: merge outputs first (rank order, the
    interesting learned units), then a stable fallback for unmerged
    symbols is assigned at encode time (hash-free: characters get
    codepoint-offset ids above the merge range)."""
    vocab = {}
    for i, (a, b) in enumerate(merges):
        vocab[a + b] = i
    return vocab


class _BpeEncode:
    """Actor/task state: merge ranks via ray.put ref, per-worker
    distinct-word encode cache."""

    def __init__(self, ranks_ref, text_col: str, lowercase: bool,
                 out_col: str):
        self.ranks_ref = ranks_ref
        self.text_col = text_col
        self.lowercase = lowercase
        self.out_col = out_col
        self._ranks = None
        self._vocab = None
        self._cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._ranks is None:
            merges = ray.get(self.ranks_ref)  # zero-copy plasma get
            self._ranks = {p: i for i, p in enumerate(merges)}
            self._vocab = build_vocab(merges)
        texts = batch.column(self.text_col)
        if self.lowercase:
            texts = pc.utf8_lower(texts)
        texts = pc.fill_null(texts.cast(pa.string()), "")
        words = pc.split_pattern_regex(texts, r"\s+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        off = words.offsets.to_numpy().astype(np.int64)
        off = off - off[0]
        flat = np.asarray(words.values.to_numpy(zero_copy_only=False),
                          object)
        n_merge = len(self._ranks)
        uniq, inv = np.unique(flat.astype(str), return_inverse=True)
        enc = []
        for wtext in uniq:
            if wtext == "":
                enc.append([])
                continue
            hit = self._cache.get(wtext)
            if hit is None:
                toks = encode_word(wtext, self._ranks)
                ids = [self._vocab[t] if t in self._vocab
                       else n_merge + (ord(t[0]) if t != END_OF_WORD
                                       else 0)
                       for t in toks]
                hit = ids
                self._cache[wtext] = hit
            enc.append(hit)
        per_word = [enc[j] for j in inv]
        rows = []
        for i in range(batch.num_rows):
            ids: list = []
            for j in range(off[i], off[i + 1]):
                ids.extend(per_word[j])
            rows.append(ids)
        return batch.append_column(
            self.out_col, pa.array(rows, pa.list_(pa.int32())))


def bpe_train_and_encode(ds, text_col: str = "text", *,
                         n_merges: int = 200, lowercase: bool = True,
                         out_col: str = "bpe_tokens",
                         distinct_gate: int = 5_000_000):
    """Train BPE merges on the corpus (bounded driver table) and
    encode every document (broadcast ranks, per-distinct-word cache).
    Returns (encoded dataset, merges list)."""
    wcounts = word_counts(ds, text_col, lowercase=lowercase,
                          distinct_gate=distinct_gate)
    merges = train_bpe_merges(wcounts, n_merges)
    ranks_ref = ray.put(merges)
    out = ds.map_batches(
        _BpeEncode(ranks_ref, text_col, lowercase, out_col),
        batch_format="pyarrow", zero_copy_batch=True)
    return out, merges
