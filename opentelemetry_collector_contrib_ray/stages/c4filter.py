"""C4-style page/line cleaning (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning" §2.2) — the classic web-corpus hygiene
pass; not in the reference (a training-data op beyond it, like
url_filter / boilerplate_filter).

Rules implemented exactly as published:

- only retain lines ending in a terminal punctuation mark
  (``.``, ``!``, ``?``, or the closing quote ``"``);
- only retain lines with at least ``min_words_per_line`` (default 5)
  words; words are the maximal runs of non-space characters;
- drop any line containing the word ``javascript``
  (case-insensitive);
- drop the whole page when it contains ``lorem ipsum``
  (case-insensitive) or a curly bracket ``{``;
- after line filtering, drop pages with fewer than
  ``min_sentences`` (default 3) sentences — sentences counted as
  terminal-punctuation characters (``[.!?]``) in the retained text.

Lines are split on ``\\n`` and trimmed of ``space/tab/CR`` before the
checks; the retained page is the kept (trimmed) lines re-joined with
``\\n``.  (The paper's bad-words list is a deployment-supplied
resource; pass extra page-drop phrases via ``page_drop_phrases``.)

Execution: fully vectorized — one ``split_pattern`` flatten, arrow
kernels for every predicate (count_substring_regex word/sentence
counts), numpy offset math for the per-page reassembly; block-local,
zero shuffle, streaming-safe at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TERMINALS = (".", "!", "?", '"')


class _C4Filter:
    def __init__(self, text_col, id_col, min_words, min_sentences,
                 page_drop_phrases, mode):
        self.text_col = text_col
        self.id_col = id_col
        self.min_words = min_words
        self.min_sentences = min_sentences
        self.page_drop_phrases = tuple(page_drop_phrases)
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lower = pc.utf8_lower(text)
        page_drop = pc.match_substring(lower, "lorem ipsum")
        page_drop = pc.or_(page_drop, pc.match_substring(text, "{"))
        for phrase in self.page_drop_phrases:
            page_drop = pc.or_(page_drop,
                               pc.match_substring(lower, phrase))
        page_drop_np = page_drop.to_numpy(zero_copy_only=False)

        lines_list = pc.split_pattern(text, "\n")
        if isinstance(lines_list, pa.ChunkedArray):
            lines_list = lines_list.combine_chunks()
        offsets = np.asarray(lines_list.offsets)
        flat = pc.utf8_trim(lines_list.flatten(), " \t\r")
        keep = pc.ends_with(flat, _TERMINALS[0])
        for t in _TERMINALS[1:]:
            keep = pc.or_(keep, pc.ends_with(flat, t))
        words = pc.count_substring_regex(flat, "[^ ]+")
        keep = pc.and_(keep, pc.greater_equal(words, self.min_words))
        keep = pc.and_(keep, pc.invert(pc.match_substring(
            pc.utf8_lower(flat), "javascript")))
        keep_np = keep.to_numpy(zero_copy_only=False)

        # per-page reassembly via offset math (no python line loops:
        # join the kept lines per page with one binary_join over a
        # rebuilt list array)
        counts = np.add.reduceat(
            np.r_[keep_np, False].astype(np.int64), offsets[:-1])
        counts[offsets[:-1] == offsets[1:]] = 0  # empty pages
        kept_flat = flat.filter(keep)
        new_offsets = np.zeros(len(counts) + 1, dtype=np.int32)
        np.cumsum(counts, out=new_offsets[1:])
        kept_list = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()), kept_flat)
        joined = pc.binary_join(kept_list, "\n")
        sentences = pc.count_substring_regex(joined, "[.!?]")
        sentences_np = sentences.to_numpy(zero_copy_only=False)
        c4_keep = (~page_drop_np & (counts >= 1)
                   & (sentences_np >= self.min_sentences))

        out = pa.table({
            self.id_col: batch.column(self.id_col),
            "c4_keep": pa.array(c4_keep, pa.bool_()),
            "n_kept_lines": pa.array(counts, pa.int64()),
            "n_sentences": pa.array(sentences_np.astype(np.int64),
                                    pa.int64()),
            "filtered_text": joined,
        })
        if self.mode == "tag":
            return out
        return out.filter(pa.array(c4_keep)).select(
            [self.id_col, "filtered_text"])


def c4_filter(ds, text_col: str = "text", id_col: str = "doc_id", *,
              min_words_per_line: int = 5, min_sentences: int = 3,
              page_drop_phrases=(), mode: str = "filter"):
    """C4 cleaning over a document Dataset.  ``mode="filter"`` keeps
    surviving pages with their retained text; ``mode="tag"`` returns
    every page with keep flags + counts (the oracle-friendly form)."""
    if mode not in ("filter", "tag"):
        raise ValueError(f"unknown mode {mode!r}")
    return ds.map_batches(
        _C4Filter(text_col, id_col, min_words_per_line, min_sentences,
                  page_drop_phrases, mode),
        batch_format="pyarrow", zero_copy_batch=True)
