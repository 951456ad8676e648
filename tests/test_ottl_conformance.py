"""Statement-level conformance suite for the OTTL-subset kernels.

Mirrors the reference's language-semantics spec tests
(pkg/ottl/e2e/e2e_test.go: real statements against constructed contexts,
asserting resulting values).  Pure pyarrow — no Ray involved.
"""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.functions.converters import get_converter
from opentelemetry_collector_contrib_ray.functions.expr import compile_condition
from opentelemetry_collector_contrib_ray.stages.transform import (
    C,
    Col,
    Transform,
    delete_keys,
    keep_keys,
    rename_key,
    replace_pattern,
    set_,
    truncate_all,
)

TBL = pa.table(
    {
        "body": ["error in module A", "all good", None, "warn: disk 91% full"],
        "sev": ["ERROR", "INFO", "DEBUG", "WARN"],
        "n": [10, 3, 7, 91],
        "f": [1.5, 2.0, -1.0, 0.25],
        "tags": [["a", "b"], [], ["c"], ["d", "e", "f"]],
    }
)


# --- condition compiler ------------------------------------------------------

@pytest.mark.parametrize(
    "cond,expected",
    [
        ('sev == "ERROR"', [True, False, False, False]),
        ('sev != "ERROR"', [False, True, True, True]),
        ("n > 5 and n < 50", [True, False, True, False]),
        ("n <= 3 or n >= 91", [False, True, False, True]),
        ('not (sev == "INFO")', [True, False, True, True]),
        ('sev in ("ERROR", "WARN")', [True, False, False, True]),
        ('IsMatch(body, "disk \\d+%")', [False, False, False, True]),
        ("Len(tags) >= 2", [True, False, False, True]),
        ('HasPrefix(sev, "ERR")', [True, False, False, False]),
        ('HasSuffix(body, "full")', [False, False, False, True]),
        ("f > 1.0", [True, True, False, False]),
        ("missing_col == 1", [False, False, False, False]),
        ("missing_col == nil", [True, True, True, True]),
        ('body == nil', [False, False, True, False]),
        ('body != nil', [True, True, False, True]),
        ("n == 7 or missing_col == 2", [False, False, True, False]),
    ],
)
def test_conditions(cond, expected):
    assert compile_condition(cond)(TBL).to_pylist() == expected


@pytest.mark.parametrize("bad", ["n === 3", "n >", 'sev in "x"', "(n > 1", "n @ 3"])
def test_bad_conditions_raise(bad):
    with pytest.raises(ValueError):
        compile_condition(bad)


# --- converters --------------------------------------------------------------

def arr(*vals):
    return pa.array(list(vals))


@pytest.mark.parametrize(
    "name,args,expected",
    [
        ("ToUpperCase", (arr("ab", "Cd"),), ["AB", "CD"]),
        ("ToLowerCase", (arr("AB", "Cd"),), ["ab", "cd"]),
        ("ConvertCase", (arr("fooBarBaz", "a-b c"), "snake"), ["foo_bar_baz", "a_b_c"]),
        ("ConvertCase", (arr("foo_bar", "x-y"), "camel"), ["FooBar", "XY"]),
        ("Substring", (arr("hello world",), 0, 5), ["hello"]),
        ("Trim", (arr("  x  ",),), ["x"]),
        ("Len", (arr("abc", ""),), [3, 0]),
        ("HasPrefix", (arr("abc", "xbc"), "ab"), [True, False]),
        ("IsMatch", (arr("a1", "bb"), r"\d"), [True, False]),
        ("String", (pa.array([1, 2]),), ["1", "2"]),
        ("ParseInt", (arr("12", "34"),), [12, 34]),
        ("Double", (arr("1.5",),), [1.5]),
        ("Hex", (arr("ab",),), ["6162"]),
        ("MD5", (arr("abc",),), ["900150983cd24fb0d6963f7d28e17f72"]),
        ("SHA256", (arr("abc",),),
         ["ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"]),
        ("Log", (pa.array([1.0]),), [0.0]),
        ("Sort", (pa.array([[3, 1, 2]]),), [[1, 2, 3]]),
        ("ContainsValue", (pa.array([[1, 2], [3]]), 2), [True, False]),
        ("IsString", (arr("a", "b"),), [True, True]),
        ("IsInt", (arr("a", "b"),), [False, False]),
    ],
)
def test_converters(name, args, expected):
    out = get_converter(name)(*args)
    assert out.to_pylist() == expected


def test_concat_and_split():
    c = get_converter("Concat")(arr("a", "b"), arr("x", "y"), delimiter="-")
    assert c.to_pylist() == ["a-x", "b-y"]
    s = get_converter("Split")(arr("a,b,c"), ",")
    assert s.to_pylist() == [["a", "b", "c"]]


def test_extract_patterns():
    out = get_converter("ExtractPatterns")(
        arr("id=7 code=x9"), r"id=(?P<id>\d+) code=(?P<code>\w+)"
    )
    assert out.to_pylist() == [{"id": "7", "code": "x9"}]


def test_parse_key_value():
    out = get_converter("ParseKeyValue")(arr("a=1 b=2", "c=3"))
    assert out.to_pylist() == [[("a", "1"), ("b", "2")], [("c", "3")]]


def test_parse_json_field():
    out = get_converter("ParseJsonField")(arr('{"k": 5}', "bad", None), "k", pa.int64())
    assert out.to_pylist() == [5, None, None]


def test_time_functions():
    ts = pa.array([1704067200_000_000], pa.timestamp("us"))
    assert get_converter("Year")(ts).to_pylist() == [2024]
    assert get_converter("Month")(ts).to_pylist() == [1]
    assert get_converter("Hour")(ts).to_pylist() == [0]
    assert get_converter("UnixSeconds")(ts).to_pylist() == [1704067200]
    parsed = get_converter("Time")(arr("2024-03-05 10:00:00"), "%Y-%m-%d %H:%M:%S")
    assert get_converter("Day")(parsed).to_pylist() == [5]
    trunc = get_converter("TruncateTime")(parsed, "day")
    assert get_converter("Hour")(trunc).to_pylist() == [0]
    fmt = get_converter("FormatTime")(parsed, "%Y/%m/%d")
    assert fmt.to_pylist() == ["2024/03/05"]


def test_fnv_matches_reference_impl():
    from opentelemetry_collector_contrib_ray.functions.hashing import fnv1a64

    out = get_converter("FNV")(arr("abc"))
    expected = fnv1a64("abc")
    if expected >= 1 << 63:
        expected -= 1 << 64  # int64 two's-complement view
    assert out.to_pylist()[0] == expected


# --- editors / statement sequences ------------------------------------------

def test_statement_sequence_order_matters():
    # later statements observe earlier mutations (parser.go:394-408)
    t = pa.table({"a": [1, 2]})
    out = Transform([
        set_("b", Col("a")),
        set_("c", C("String", Col("b"))),
    ])(t)
    assert out.column("c").to_pylist() == ["1", "2"]


def test_set_with_where_guard():
    t = pa.table({"sev": ["ERROR", "INFO"], "flag": ["n", "n"]})
    out = Transform([set_("flag", "y", where='sev == "ERROR"')])(t)
    assert out.column("flag").to_pylist() == ["y", "n"]


def test_editors():
    t = pa.table({"a": [1], "b": ["long-string-value"], "c": [2]})
    out = Transform([delete_keys("c")])(t)
    assert out.column_names == ["a", "b"]
    out = Transform([keep_keys("b")])(t)
    assert out.column_names == ["b"]
    out = Transform([rename_key("a", "x")])(t)
    assert "x" in out.column_names and "a" not in out.column_names
    out = Transform([truncate_all(4)])(t)
    assert out.column("b").to_pylist() == ["long"]
    out = Transform([replace_pattern("b", r"-\w+", "")])(t)
    assert out.column("b").to_pylist() == ["long"]


def test_trace_span_id_converters():
    t = get_converter("TraceID")(arr("0af7651916cd43dd8448eb211c80319c"))
    assert t.to_pylist() == [bytes.fromhex("0af7651916cd43dd8448eb211c80319c")]
    s = get_converter("SpanID")(arr("b7ad6b7169203331"))
    assert s.to_pylist() == [bytes.fromhex("b7ad6b7169203331")]
    short = get_converter("SpanID")(arr("3331"))  # zero-padded to 8 bytes
    assert short.to_pylist() == [b"\x00" * 6 + bytes.fromhex("3331")]


def test_grok_compile_and_extract():
    from opentelemetry_collector_contrib_ray.functions.grok import compile_grok
    import pyarrow.compute as pc

    regex, types = compile_grok(
        "%{IP:client} %{WORD:method} %{NUMBER:bytes:int} %{LOGLEVEL:level}"
    )
    assert types == {"bytes": pa.int64()}
    out = pc.extract_regex(
        arr("10.0.0.1 GET 512 ERROR", "bad line !!"), regex
    )
    assert out.to_pylist() == [
        {"client": "10.0.0.1", "method": "GET", "bytes": "512", "level": "ERROR"},
        None,
    ]


def test_grok_user_patterns_and_nesting():
    from opentelemetry_collector_contrib_ray.functions.grok import compile_grok
    import pyarrow.compute as pc

    regex, _ = compile_grok(
        "%{KVPAIR:kv}", extra_patterns={"KVPAIR": r"%{WORD}=%{NOTSPACE}"}
    )
    out = pc.extract_regex(arr("k=v rest"), regex)
    assert out.to_pylist() == [{"kv": "k=v"}]


def test_grok_unknown_pattern_raises():
    from opentelemetry_collector_contrib_ray.functions.grok import compile_grok

    with pytest.raises(ValueError):
        compile_grok("%{NO_SUCH_PATTERN:x}")


def test_xml_converters():
    xml = '<root a="1"><child>hi</child></root>'
    parsed = get_converter("ParseXML")(arr(xml, "not<xml"))
    import json as _json

    obj = _json.loads(parsed.to_pylist()[0])
    assert obj["tag"] == "root" and obj["attributes"] == {"a": "1"}
    assert obj["children"][0]["content"] == "hi"
    assert parsed.to_pylist()[1] is None
    got = get_converter("GetXML")(arr(xml), "child")
    assert got.to_pylist() == ["hi"]


def test_user_agent_and_decode():
    ua = get_converter("UserAgent")(arr(
        "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0.0.0 Safari/537.36",
        "curl/8.4.0",
    ))
    rows = ua.to_pylist()
    assert rows[0] == {"name": "Chrome", "version": "120.0.0.0", "os": "Windows"}
    assert rows[1]["name"] == "curl"
    dec = get_converter("Decode")(pa.array([b"hej"]))
    assert dec.to_pylist() == ["hej"]


def test_murmur3_known_vectors():
    # public murmur3_x86_32 test vectors (seed 0)
    m = get_converter("Murmur3Hash")
    assert m(arr("")).to_pylist() == [0]
    assert m(arr("hello")).to_pylist() == [0x248BFA47]
    assert m(arr("hello, world")).to_pylist() == [0x149BBB7F]


def test_kv_string_slice_map_roundtrip():
    kv = get_converter("ParseKeyValue")(arr("b=2 a=1"))
    s = get_converter("ToKeyValueString")(kv)
    assert s.to_pylist() == ["a=1 b=2"]  # sorted keys
    lst = pa.array([["x", "y", "z"]])
    m = get_converter("SliceToMap")(lst, ["first", "second"])
    assert m.to_pylist() == [[("first", "x"), ("second", "y")]]


def test_luhn_duration_uuid():
    luhn = get_converter("IsValidLuhn")(arr("79927398713", "79927398714", "abc"))
    assert luhn.to_pylist() == [True, False, False]
    d = get_converter("Duration")(arr("1h30m", "250ms", "1.5s", "bogus"))
    assert d.to_pylist() == [5_400_000_000_000, 250_000_000, 1_500_000_000, None]
    u = get_converter("UUID")(arr("doc-1", "doc-1", "doc-2"))
    vals = u.to_pylist()
    assert vals[0] == vals[1] != vals[2]  # deterministic, content-derived
    assert vals[0][14] == "5" and len(vals[0]) == 36


def test_map_keys_values():
    kv = get_converter("ParseKeyValue")(arr("a=1 b=2"))
    assert get_converter("Keys")(kv).to_pylist() == [["a", "b"]]
    assert get_converter("Values")(kv).to_pylist() == [["1", "2"]]


def test_unquote_flatten_assign_keys():
    from opentelemetry_collector_contrib_ray.stages.transform import (
        assign_keys,
        flatten_struct,
        unquote,
    )

    t = pa.table({"v": ['"quoted"', "'single'", "plain", '"half']})
    out = Transform([unquote("v")])(t)
    assert out.column("v").to_pylist() == ["quoted", "single", "plain", '"half']

    t = pa.table({
        "s": pa.array([{"a": 1, "b": "x"}], pa.struct([("a", pa.int64()), ("b", pa.string())])),
        "keep": [9],
    })
    out = Transform([flatten_struct("s", prefix="s_")])(t)
    assert set(out.column_names) == {"keep", "s_a", "s_b"}
    assert out.column("s_a").to_pylist() == [1]

    t = pa.table({"c0": [1], "c1": [2]})
    out = Transform([assign_keys(["c0", "c1"], ["x", "y"])])(t)
    assert out.column_names == ["x", "y"]


def test_hll_sketch_accuracy():
    import numpy as np

    from opentelemetry_collector_contrib_ray.stages.sketch import HLL

    hll = HLL(p=12)
    regs = hll.fold(range(10_000))
    est = hll.estimate(regs)
    assert abs(est - 10_000) / 10_000 < 0.05
    # mergeability: two halves merged == whole
    a = hll.fold(range(5_000))
    b = hll.fold(range(5_000, 10_000))
    merged = hll.merge(a, b)
    assert np.array_equal(merged, regs)


def test_hash_editor():
    t = pa.table({"v": ["abc"]})
    out = Transform([set_("v", C("SHA256", Col("v")))])(t)
    assert out.column("v").to_pylist()[0].startswith("ba7816bf")


# --- round-2 editor tail (VERDICT r1 #4): 14/14 OTTL editors -----------------

def test_merge_maps_strategies():
    """func_merge_maps.go:40-45: insert / update / upsert semantics, with
    per-row key presence expressed as value validity."""
    from opentelemetry_collector_contrib_ray.stages.transform import merge_maps

    tbl = pa.table({
        "a": pa.array([1, None, 3], pa.int64()),
        "m": pa.array(
            [{"a": 10, "b": 100}, {"a": 20, "b": None}, {"a": None, "b": 300}],
            pa.struct([("a", pa.int64()), ("b", pa.int64())]),
        ),
    })
    ins = Transform([merge_maps("m", "insert")])(tbl)
    # a: target key exists rows 0,2 -> kept; row 1 absent -> source 20
    assert ins.column("a").to_pylist() == [1, 20, 3]
    # b: new column -> source values verbatim
    assert ins.column("b").to_pylist() == [100, None, 300]

    upd = Transform([merge_maps("m", "update")])(tbl)
    # update only where source valid AND target key present
    assert upd.column("a").to_pylist() == [10, None, 3]
    assert "b" not in upd.column_names  # update never creates keys

    ups = Transform([merge_maps("m", "upsert")])(tbl)
    assert ups.column("a").to_pylist() == [10, 20, 3]
    assert ups.column("b").to_pylist() == [100, None, 300]


def test_merge_maps_bad_strategy():
    from opentelemetry_collector_contrib_ray.stages.transform import merge_maps

    with pytest.raises(ValueError, match="strategy"):
        merge_maps("m", "replace")


def test_limit_keys():
    """func_limit.go:36-47: priority keys survive, then first-seen order;
    no-op when already within the limit."""
    from opentelemetry_collector_contrib_ray.stages.transform import limit_keys

    tbl = pa.table({"w": [1], "x": [2], "y": [3], "z": [4]})
    out = Transform([limit_keys(2, ("z",))])(tbl)
    assert out.column_names == ["w", "z"]  # original order preserved
    out2 = Transform([limit_keys(10)])(tbl)
    assert out2.column_names == ["w", "x", "y", "z"]
    with pytest.raises(ValueError, match="negative"):
        limit_keys(-1)
    with pytest.raises(ValueError, match="priority"):
        limit_keys(1, ("a", "b"))


def test_delete_and_keep_matching_keys():
    from opentelemetry_collector_contrib_ray.stages.transform import (
        delete_matching_keys,
        keep_matching_keys,
    )

    tbl = pa.table({"http.url": [1], "http.method": [2], "user": [3]})
    out = Transform([delete_matching_keys(r"^http\.")])(tbl)
    assert out.column_names == ["user"]
    out2 = Transform([keep_matching_keys(r"^http\.")])(tbl)
    assert out2.column_names == ["http.url", "http.method"]
    with pytest.raises(Exception):
        delete_matching_keys("[unclosed")


def test_append_editor():
    """func_append.go: scalar target -> list with value appended; list
    target -> elements extended; missing target -> just the values; null
    list rows contribute no elements."""
    from opentelemetry_collector_contrib_ray.stages.transform import append_to

    tbl = pa.table({
        "s": ["x", "y"],
        "l": pa.array([[1, 2], None], pa.list_(pa.int64())),
    })
    out = Transform([append_to("s", value="z")])(tbl)
    assert out.column("s").to_pylist() == [["x", "z"], ["y", "z"]]
    out2 = Transform([append_to("l", values=(9, 10))])(tbl)
    assert out2.column("l").to_pylist() == [[1, 2, 9, 10], [9, 10]]
    out3 = Transform([append_to("fresh", value="v")])(tbl)
    assert out3.column("fresh").to_pylist() == [["v"], ["v"]]
    with pytest.raises(ValueError):
        append_to("s")


def test_replace_match_glob():
    """func_replace_match.go:43-47: glob FULL-value match replaces the
    whole value; non-matching values untouched."""
    from opentelemetry_collector_contrib_ray.stages.transform import (
        replace_all_matches,
        replace_all_patterns,
        replace_match,
    )

    tbl = pa.table({"host": ["web-1", "web-2", "db-1", None],
                    "other": ["web-9", "x", "y", "z"]})
    out = Transform([replace_match("host", "web-*", "web")])(tbl)
    assert out.column("host").to_pylist() == ["web", "web", "db-1", None]
    assert out.column("other").to_pylist() == ["web-9", "x", "y", "z"]

    out2 = Transform([replace_all_matches("web-?", "W")])(tbl)
    assert out2.column("host").to_pylist() == ["W", "W", "db-1", None]
    assert out2.column("other").to_pylist() == ["W", "x", "y", "z"]

    out3 = Transform([replace_all_patterns(r"\d", "#")])(tbl)
    assert out3.column("host").to_pylist() == ["web-#", "web-#", "db-#", None]


def test_severity_parser_full_enum():
    """severity_builder.go:20-85 presets + severity.go:13-50 enum: aliases,
    numeric strings, warning/err extras, HTTP shorthands, min/max ranges,
    unmatched -> Default."""
    from opentelemetry_collector_contrib_ray.stages.parsers import (
        SEVERITY_TEXT,
        SeverityParser,
    )

    assert len(SEVERITY_TEXT) == 25 and SEVERITY_TEXT[0] == "DEFAULT"
    assert SEVERITY_TEXT[1] == "TRACE" and SEVERITY_TEXT[24] == "FATAL4"

    p = SeverityParser("s", mapping={"error3": "4xx",
                                     "fatal": {"min": 500, "max": 599},
                                     "info": ["click", "view"]})
    t = pa.table({"s": ["ERROR", "warning2", "17", "404", "503", "click",
                        "bogus", None, "Err4", "fatal4"]})
    out = p(t)
    assert out.column("severity_number").to_pylist() == \
        [17, 14, 17, 19, 21, 9, 0, 0, 20, 24]
    assert out.column("severity_text").to_pylist() == \
        ["ERROR", "WARN2", "ERROR", "ERROR3", "FATAL", "INFO",
         "DEFAULT", "DEFAULT", "ERROR4", "FATAL4"]

    # otel preset has no warning/err extras; 'none' preset maps nothing
    otel = SeverityParser("s", preset="otel", text_out=None)
    assert otel(pa.table({"s": ["warning", "warn"]}))[
        "severity_number"].to_pylist() == [0, 13]
    none = SeverityParser("s", preset="none", text_out=None)
    assert none(pa.table({"s": ["error"]}))["severity_number"].to_pylist() == [0]

    # int parse_from columns cast to string first (severity.go find: ints
    # compare via their numeric-string alias)
    ints = SeverityParser("n", text_out=None)
    assert ints(pa.table({"n": pa.array([1, 24, 99], pa.int64())}))[
        "severity_number"].to_pylist() == [1, 24, 0]

    with pytest.raises(ValueError, match="unknown severity"):
        SeverityParser("s", mapping={"catastrophic": "x"})


def test_time_layout_types():
    """helper/time.go:20-27,93-101: strptime / gotime / epoch layouts."""
    from opentelemetry_collector_contrib_ray.functions.converters import (
        gotime_to_strptime,
        parse_time_layout,
    )

    assert gotime_to_strptime("2006-01-02 15:04:05") == "%Y-%m-%d %H:%M:%S"
    assert gotime_to_strptime("Jan 2 15:04:05 MST") == "%b %-d %H:%M:%S %Z"
    assert gotime_to_strptime("02/Jan/2006:15:04:05 -0700") == \
        "%d/%b/%Y:%H:%M:%S %z"

    s = pa.array(["2024-03-01 10:20:30"])
    out = parse_time_layout(s, "2006-01-02 15:04:05", "gotime")
    assert str(out[0]) == "2024-03-01 10:20:30"

    # epoch integer layouts
    base_us = 1_709_288_430_000_000  # 2024-03-01T10:20:30Z in us
    assert parse_time_layout(
        pa.array([base_us // 1_000_000]), "s", "epoch")[0].value == base_us
    assert parse_time_layout(
        pa.array([base_us // 1_000]), "ms", "epoch")[0].value == base_us
    assert parse_time_layout(
        pa.array([base_us]), "us", "epoch")[0].value == base_us
    ns = parse_time_layout(pa.array([base_us * 1_000 + 123]), "ns", "epoch")
    assert ns.type == pa.timestamp("ns") and ns[0].value == base_us * 1000 + 123

    # epoch subsecond layouts (seconds with fraction)
    sms = parse_time_layout(pa.array([1709288430.123]), "s.ms", "epoch")
    assert sms[0].value == base_us + 123_000
    sus = parse_time_layout(pa.array(["1709288430.000123"]), "s.us", "epoch")
    assert sus[0].value == base_us + 123

    with pytest.raises(ValueError, match="epoch"):
        parse_time_layout(pa.array([1]), "h", "epoch")
    with pytest.raises(ValueError, match="layout_type"):
        parse_time_layout(pa.array([1]), "s", "unixy")


def test_parse_json_array():
    """parser/jsonarray/parser.go: array line -> element list; header mode
    -> positional fields; nested objects stay as compact JSON strings."""
    from opentelemetry_collector_contrib_ray.functions.converters import (
        parse_json_array,
    )

    col = pa.array(['[1, "x", true, null, {"a": 2}]', "not json", None, "[]"])
    out = parse_json_array(col)
    assert out.to_pylist() == [
        ["1", "x", "true", None, '{"a":2}'], None, None, []
    ]

    hdr = parse_json_array(
        pa.array(['[5, "web", 1.5]', '[7, "db"]']),
        header=["n", "svc", "load"],
        types={"n": pa.int64(), "load": pa.float64()},
    )
    assert hdr.to_pylist() == [
        {"n": 5, "svc": "web", "load": 1.5},
        {"n": 7, "svc": "db", "load": None},
    ]


def test_converter_tail_round2():
    """Round-2 converter additions: duration extractors, murmur3-128,
    deterministic UUIDv7, simplified/edit XML family, profile/root-span."""
    gc = get_converter

    # duration extractors over int64 nanos (Go time.Duration methods)
    dur = pa.array([3_661_000_000_000, 500_000_000], pa.int64())  # 1h1m1s, .5s
    assert gc("Hours")(dur).to_pylist() == pytest.approx([3661 / 3600.0, 0.5 / 3600.0], rel=1e-12)
    assert gc("Seconds")(dur).to_pylist() == [3661.0, 0.5]
    assert gc("Milliseconds")(dur).to_pylist() == [3_661_000, 500]
    assert gc("Nanoseconds")(dur).to_pylist() == [3_661_000_000_000, 500_000_000]

    # murmur3 128 known vector (x64_128 of "hello" seed 0)
    out = gc("Murmur3Hash128")(pa.array(["hello", None]))
    assert out[1].as_py() is None
    assert len(out[0].as_py()) == 32 and out[0].as_py() == gc("Murmur3Hash128")(pa.array(["hello"]))[0].as_py()

    # UUIDv7: version/variant bits + time-ordered prefix, deterministic
    ts = pa.array([1_000_000, 2_000_000], pa.timestamp("us"))
    ids = gc("UUIDv7")(pa.array(["a", "b"]), ts).to_pylist()
    assert ids[0][14] == "7" and ids[1][14] == "7"  # version nibble
    assert ids[0][19] in "89ab"                      # variant
    assert ids[0][:13] < ids[1][:13]                 # time-sortable
    assert ids == gc("UUIDv7")(pa.array(["a", "b"]), ts).to_pylist()

    # simplified XML: no attributes, repeated tags -> lists
    xml = pa.array(['<r a="1"><x>1</x><x>2</x><y><z>t</z></y></r>', "<bad", None])
    simp = gc("ParseSimplifiedXML")(xml).to_pylist()
    assert simp[0] == '{"r":{"x":["1","2"],"y":{"z":"t"}}}'
    assert simp[1] is None and simp[2] is None

    # XML edit family
    ins = gc("InsertXML")(pa.array(["<a><b/></a>"]), "b", "<c>x</c>").to_pylist()
    assert ins[0] == "<a><b><c>x</c></b></a>"
    rem = gc("RemoveXML")(pa.array(["<a><b>1</b><c/></a>"]), ".//b").to_pylist()
    assert rem[0] == "<a><c /></a>"
    attrs = gc("ConvertAttributesToElementsXML")(
        pa.array(['<a x="1" y="2"><b z="3"/></a>'])).to_pylist()
    assert attrs[0] == "<a><b><z>3</z></b><x>1</x><y>2</y></a>"
    txt = gc("ConvertTextToElementsXML")(pa.array(["<a>hi<b/></a>"])).to_pylist()
    assert txt[0] == "<a><value>hi</value><b /></a>"

    # profile id + root span
    pid = gc("ProfileID")(pa.array(["00" * 16]))
    assert pid.type == pa.binary(16)
    roots = gc("IsRootSpan")(pa.array(["0000000000000000", "00abcdef00abcdef", None]))
    assert roots.to_pylist() == [True, False, True]

    # case aliases
    assert gc("ToSnakeCase")(pa.array(["FooBarBaz"])).to_pylist() == ["foo_bar_baz"]


def test_exponential_histogram_sketch():
    """Auto-downscaling mergeable expohisto (spanmetrics scale path):
    merge(a, b) == from_values(a ++ b) totals; downscale halves indices."""
    import numpy as np

    from opentelemetry_collector_contrib_ray.stages.expohist import (
        ExponentialHistogram,
        bucket_boundaries,
        exponential_bucketize,
    )

    rng = np.random.default_rng(7)
    a, b = rng.lognormal(0, 2, 500), rng.lognormal(3, 1, 500)
    h1 = ExponentialHistogram(scale=4, max_size=32).add_values(a)
    h2 = ExponentialHistogram(scale=4, max_size=32).add_values(b)
    both = ExponentialHistogram(scale=4, max_size=32).add_values(
        np.concatenate([a, b]))
    merged = h1.merge(h2)
    assert merged.total == both.total == 1000
    assert merged.scale <= 4
    # merged counts at the coarser common scale match the direct build
    while both.scale > merged.scale:
        both.scale -= 1
        both.counts = {k >> 1: sum(v for kk, v in both.counts.items()
                                   if kk >> 1 == k >> 1) for k in both.counts}
    assert merged.counts == both.counts
    # zero/negative -> zero bucket
    hz = ExponentialHistogram().add_values(np.array([0.0, -1.0, 2.0]))
    assert hz.zero_count == 2 and hz.total == 3

    # fixed-scale bucketize: upper-inclusive edges, under/overflow sentinels
    bounds = bucket_boundaries(0, 0, 3)  # 1,2,4,8,16
    idx = exponential_bucketize(np.array([1.0, 1.5, 2.0, 16.0, 17.0, 0.5]),
                                bounds, 0)
    assert idx.tolist() == [-1, 0, 0, 3, 4, -1]


def test_parse_json_unix_now_kvlookup():
    gc = get_converter
    out = gc("ParseJSON")(pa.array(['{"b":1,"a":2}', "nope", None]))
    assert out.to_pylist() == ['{"a":2,"b":1}', None, None]

    ts = gc("Unix")(pa.array([1_700_000_000], pa.int64()),
                    pa.array([123_000], pa.int64()))
    assert ts.type == pa.timestamp("us") and ts[0].value == 1_700_000_000_000_123

    fixed = gc("Now")(pa.array([1, 2, 3]), "2024-06-01T12:00:00")
    assert fixed.to_pylist()[0].isoformat() == "2024-06-01T12:00:00"
    assert len(fixed) == 3

    from opentelemetry_collector_contrib_ray.functions.converters import (
        parse_key_value,
    )

    kv = parse_key_value(pa.array(["a=1 b=2", "b=9", "c=0"]),
                         pair_delimiter=" ", kv_delimiter="=")
    vals = gc("KVLookup")(kv, "b")
    assert vals.to_pylist() == ["2", "9", None]


def test_regex_parse_memoized_matches_plain():
    from opentelemetry_collector_contrib_ray.stages.parse import RegexParse

    rows = ["x=1 y=a", "x=2 y=b", "x=1 y=a", "bad"] * 10
    t = pa.table({"raw": rows})
    pat = r"^x=(?P<x>\d+) y=(?P<y>\w+)$"
    plain = RegexParse(pat, on_error="send", keep_input=True)(t)
    memo = RegexParse(pat, on_error="send", keep_input=True, memoize=True)(t)
    assert plain.to_pydict() == memo.to_pydict()
    dropped = RegexParse(pat, on_error="drop", memoize=True)(t)
    assert dropped.num_rows == 30


def test_math_expressions():
    """LANGUAGE.md "Math Expressions" / math.go: + - * / with int/float
    segregation, truncating int division, div-by-zero errors."""
    t = pa.table({"a": [1, 2, 3], "b": [10, 20, 30], "f": [1.0, 2.5, 3.0]})
    cc = compile_condition
    assert cc("a + 1 == 3")(t).to_pylist() == [False, True, False]
    assert cc("b / a >= 10")(t).to_pylist() == [True, True, True]
    assert cc("a * 2 - 1 == 5")(t).to_pylist() == [False, False, True]
    assert cc("b / 7 == 2")(t).to_pylist() == [False, True, False]  # truncates
    assert cc("f * 2.0 > 4.9")(t).to_pylist() == [False, True, True]
    assert cc("a - 5 == -3")(t).to_pylist() == [False, True, False]
    with pytest.raises(ValueError, match="never mix"):
        cc("a + 1.5 == 2")(t)
    with pytest.raises(Exception):
        cc("a / 0 == 1")(t)


def test_transform_error_modes():
    """transformprocessor error_mode: propagate raises, ignore/silent
    continue with later statements still applied."""
    from opentelemetry_collector_contrib_ray.stages.transform import (
        Statement,
        Transform,
        rename_key,
        set_,
    )

    t = pa.table({"x": [1]})
    bad = Statement("hash", ("missing_col", "sha256"))
    good = set_("y", 7)
    with pytest.raises(Exception):
        Transform([bad, good])(t)
    out = Transform([bad, good], error_mode="ignore")(t)
    assert out.column("y").to_pylist() == [7]
    out2 = Transform([bad, rename_key("x", "z")], error_mode="silent")(t)
    assert out2.column_names == ["z"]
    with pytest.raises(ValueError, match="error_mode"):
        Transform([], error_mode="loud")


def test_path_indexing_map_struct_list():
    """OTTL path indexing (pkg/ottl/grammar.go:236 Path+Keys,
    LANGUAGE.md "Paths"): attributes["k"] over map and struct columns,
    body[i] over list columns, nil for missing keys/out-of-range."""
    from opentelemetry_collector_contrib_ray.functions.expr import (
        compile_condition as cc,
        compile_value as cv,
    )

    t = pa.table({
        "attributes": pa.array(
            [[("et", "error"), ("uid", "u1")], [("et", "click")],
             [("uid", "u3")], None],
            pa.map_(pa.string(), pa.string())),
        "body": pa.array([[1, 2, 3], [4], [], None], pa.list_(pa.int64())),
        "st": pa.array([{"a": 1, "b": "x"}] * 4,
                       pa.struct([("a", pa.int64()), ("b", pa.string())])),
    })
    assert cc('attributes["et"] == "error"')(t).to_pylist() == \
        [True, False, False, False]
    assert cc('body[1] == 2')(t).to_pylist() == [True, False, False, False]
    assert cc('st["b"] == "x"')(t).to_pylist() == [True] * 4
    # missing map key / struct field / short list read as nil, not error
    assert cc('attributes["zz"] == nil')(t).to_pylist() == [True] * 4
    assert cc('st["zz"] == nil')(t).to_pylist() == [True] * 4
    assert cv('body[2]')(t).to_pylist() == [3, None, None, None]
    assert cv('attributes["uid"]')(t).to_pylist() == ["u1", None, "u3", None]
    # unknown COLUMN with an index still reads nil (nil-path semantics)
    assert cc('nope["k"] == nil')(t).to_pylist() == [True] * 4


def test_enum_symbols_and_list_literals():
    """LANGUAGE.md "Enums": uppercase symbols replaced by int64; the
    severity / status-code / span-kind sets the reference contexts
    register. "Lists": ["a", "b"] literals, usable with in."""
    from opentelemetry_collector_contrib_ray.functions.expr import (
        ENUMS,
        compile_condition as cc,
    )

    assert ENUMS["SEVERITY_NUMBER_WARN"] == 13
    assert ENUMS["SEVERITY_NUMBER_FATAL4"] == 24
    assert ENUMS["SEVERITY_NUMBER_TRACE"] == 1
    assert ENUMS["STATUS_CODE_ERROR"] == 2
    assert ENUMS["SPAN_KIND_CONSUMER"] == 5
    t = pa.table({"sev": pa.array([9, 13, 21, None], pa.int64()),
                  "kind": pa.array(["a", "b", "c", "d"])})
    assert cc("sev >= SEVERITY_NUMBER_WARN")(t).to_pylist() == \
        [False, True, True, False]
    assert cc('kind in ["a", "c"]')(t).to_pylist() == \
        [True, False, True, False]
    assert cc('kind in ["a", "c"] and sev == SEVERITY_NUMBER_FATAL')(
        t).to_pylist() == [False, False, True, False]


def test_compile_value_math_and_missing():
    from opentelemetry_collector_contrib_ray.functions.expr import (
        compile_value as cv,
    )

    t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    assert cv("a * 2 + 1")(t).to_pylist() == [3, 5, 7]
    assert cv("missing")(t).to_pylist() == [None] * 3
    assert cv('"k"')(t).to_pylist() == ["k"] * 3


def test_set_statement_with_compiled_value_and_indexed_where():
    """OTTL statements compose with the round-3 grammar: compile_value
    (a callable) drops into set_'s value position, and the where condition
    can index map columns — `set(uid, attributes["uid"]) where
    attributes["et"] == "error"`."""
    from opentelemetry_collector_contrib_ray.functions.expr import (
        compile_value,
    )
    from opentelemetry_collector_contrib_ray.stages.transform import (
        Transform,
        set_,
    )

    t = pa.table({
        "attributes": pa.array(
            [[("et", "error"), ("uid", "u1")], [("et", "click"),
                                                ("uid", "u2")]],
            pa.map_(pa.string(), pa.string())),
    })
    out = Transform([
        set_("uid", compile_value('attributes["uid"]'),
             where='attributes["et"] == "error"'),
    ])(t)
    assert out.column("uid").to_pylist() == ["u1", None]  # where-masked
    out2 = Transform([set_("uid", compile_value('attributes["uid"]'))])(t)
    assert out2.column("uid").to_pylist() == ["u1", "u2"]


def test_map_column_key_editors():
    """OTTL key editors over map-typed columns (the map-entry form of
    delete/keep_matching_keys and limit): vectorized rebuild, null and
    empty rows round-trip, sliced/chunked batches safe."""
    from opentelemetry_collector_contrib_ray.functions.maps import (
        map_delete_matching_keys,
        map_keep_matching_keys,
        map_limit,
    )

    col = pa.array(
        [[("et", "error"), ("sev", "17"), ("uid", "u1")], [("sx", "1")],
         [], None],
        pa.map_(pa.string(), pa.string()))
    assert map_delete_matching_keys(col, "^s").to_pylist() == \
        [[("et", "error"), ("uid", "u1")], [], [], None]
    assert map_keep_matching_keys(col, "^s").to_pylist() == \
        [[("sev", "17")], [("sx", "1")], [], None]
    # limit keeps priority key + first-seen, ORIGINAL order preserved
    assert map_limit(col, 2, ("uid",)).to_pylist() == \
        [[("et", "error"), ("uid", "u1")], [("sx", "1")], [], None]
    # sliced (zero-copy re-slicing hazard) and chunked inputs
    assert map_delete_matching_keys(col.slice(1, 3), "^s").to_pylist() == \
        [[], [], None]
    ch = pa.chunked_array([col.slice(0, 2), col.slice(2, 2)])
    assert map_keep_matching_keys(ch, "e").to_pylist() == \
        [[("et", "error"), ("sev", "17")], [], [], None]
    with pytest.raises(ValueError, match="cannot be less"):
        map_limit(col, 1, ("uid", "et"))


def test_map_editors_with_where_condition():
    """Map editors honor the statement's where: rows outside the mask keep
    their entries untouched (incl. under limit)."""
    from opentelemetry_collector_contrib_ray.stages.transform import (
        Transform,
        map_delete_keys,
        map_limit_keys,
    )

    t = pa.table({
        "kind": ["a", "b"],
        "attributes": pa.array(
            [[("s1", "x"), ("k", "1")], [("s2", "y"), ("k", "2")]],
            pa.map_(pa.string(), pa.string())),
    })
    out = Transform([
        map_delete_keys("attributes", "^s", where='kind == "a"'),
    ])(t)
    assert out.column("attributes").to_pylist() == \
        [[("k", "1")], [("s2", "y"), ("k", "2")]]
    out2 = Transform([
        map_limit_keys("attributes", 1, ("k",), where='kind == "b"'),
    ])(t)
    assert out2.column("attributes").to_pylist() == \
        [[("s1", "x"), ("k", "1")], [("k", "2")]]


class TestCachePath:
    """OTTL per-record scratch cache (ottllog/log.go:182): cache["k"]
    compiles to the cache.k scratch column; the namespace never leaves a
    Transform."""

    def _t(self):
        return pa.table({"body": ["x", "y"], "n": [1, 10]})

    def test_cache_write_read_and_drop(self):
        from opentelemetry_collector_contrib_ray.functions.expr import (
            compile_value,
        )
        from opentelemetry_collector_contrib_ray.stages.transform import (
            Transform,
            set_,
        )

        out = Transform([
            set_('cache["v"]', compile_value("n + n")),
            set_("doubled", compile_value('cache["v"]')),
            set_("big", True, where='cache["v"] >= 20'),
        ])(self._t())
        assert out.column("doubled").to_pylist() == [2, 20]
        assert out.column("big").to_pylist() == [None, True]
        assert not any(c.startswith("cache") for c in out.column_names)

    def test_unwritten_cache_key_reads_nil(self):
        from opentelemetry_collector_contrib_ray.functions.expr import (
            compile_value,
        )
        from opentelemetry_collector_contrib_ray.stages.transform import (
            Transform,
            set_,
        )

        out = Transform([set_("x", compile_value('cache["never"]'))])(
            self._t())
        assert out.column("x").to_pylist() == [None, None]

    def test_cache_condition_on_missing_key_matches_nothing(self):
        from opentelemetry_collector_contrib_ray.functions.expr import (
            compile_condition,
        )

        mask = compile_condition('cache["never"] == "x"')(self._t())
        assert mask.to_pylist() == [False, False]
