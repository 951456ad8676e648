"""C4 cleaning rules (Raffel et al. 2020 §2.2) — rule-by-rule vectors
plus a pure-python reference parity check."""

import pyarrow as pa
import ray

from opentelemetry_collector_contrib_ray.stages.c4filter import c4_filter


def _run(texts, **kw):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = c4_filter(ds, mode="tag", **kw)
    return pa.concat_tables(ray.get(out.to_arrow_refs())) \
        .sort_by("doc_id").to_pylist()


def _py_reference(text, min_words=5, min_sentences=3):
    page_drop = ("lorem ipsum" in text.lower()) or ("{" in text)
    kept = []
    for line in text.split("\n"):
        t = line.strip(" \t\r")
        if not t.endswith((".", "!", "?", '"')):
            continue
        if len([w for w in t.split(" ") if w]) < min_words:
            continue
        if "javascript" in t.lower():
            continue
        kept.append(t)
    joined = "\n".join(kept)
    sentences = sum(joined.count(c) for c in ".!?")
    return {"c4_keep": (not page_drop) and len(kept) >= 1
            and sentences >= min_sentences,
            "n_kept_lines": len(kept), "n_sentences": sentences,
            "filtered_text": joined}


def test_rules():
    texts = [
        # kept: 3 terminal-punct 5-word lines
        "one two three four five.\nsix seven eight nine ten!\n"
        "ask me a question now?",
        # line drops: short / no punct / javascript
        "too short.\nno terminal punctuation in this line\n"
        "enable javascript to view this page.\n"
        "one two three four five.\nsix seven eight nine ten!\n"
        "ask me a question now?",
        # page drops
        "Lorem Ipsum dolor sit amet today.\n"
        "one two three four five.\nsix seven eight nine ten!\n"
        "ask me a question now?",
        "var f = function() { return; }\n"
        "one two three four five.\nsix seven eight nine ten!\n"
        "ask me a question now?",
        # quote terminal counts as a line but adds no sentence
        'he said the following words to me "\n'
        "one two three four five.\nsix seven eight nine ten!",
        "",  # empty page
        "   one two three four five.   \nsix seven eight nine ten!\n"
        "ask me a question now?",  # trimming
    ]
    rows = _run(texts)
    for row, text in zip(rows, texts):
        ref = _py_reference(text)
        for k, v in ref.items():
            assert row[k] == v, (text[:40], k, row[k], v)
    assert rows[0]["c4_keep"] is True
    assert rows[1]["c4_keep"] is True
    assert rows[1]["n_kept_lines"] == 3  # 3 of 6 lines survive
    assert rows[2]["c4_keep"] is False  # lorem ipsum
    assert rows[3]["c4_keep"] is False  # curly bracket
    assert rows[4]["c4_keep"] is False  # only 2 sentences
    assert rows[4]["n_kept_lines"] == 3
    assert rows[5]["n_kept_lines"] == 0
    assert rows[5]["filtered_text"] == ""
    assert rows[6]["filtered_text"].startswith("one two")  # trimmed


def test_filter_mode_and_params():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b c.\nd e f!\ng h i?",
                          "one two three four five."], pa.string())}))
    out = c4_filter(ds, min_words_per_line=3, min_sentences=3)
    rows = pa.concat_tables(ray.get(out.to_arrow_refs())).to_pylist()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["filtered_text"] == "a b c.\nd e f!\ng h i?"
    # extra page-drop phrases
    rows2 = _run(["one two three four five.\nsix seven eight nine "
                  "ten!\nask me a question now?\ncookies policy."],
                 page_drop_phrases=("cookies policy",))
    assert rows2[0]["c4_keep"] is False
