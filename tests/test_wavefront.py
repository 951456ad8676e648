"""wavefrontreceiver parse — parity with a literal restatement of
wavefront_parser.go Parse/buildLabels/injectCollectDLabels and the
reference's own test table (wavefront_parser_test.go:129-283)."""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.wavefront import (
    go_build_labels,
    inject_collectd_labels,
    labels_from_name,
    parse_wavefront_batch,
)


def _go_parse(line, extract=False):
    parts = line.split(" ", 2)
    if len(parts) < 3:
        return "err"
    name, valstr, rest = parts
    if len(name) >= 2 and name[0] == '"' and name[-1] == '"':
        name = name[1:-1]
    if name == "":
        return "err"
    sub = rest.split(" ", 1)
    tsstr = sub[0]
    tags = sub[1] if len(sub) == 2 else ""
    ts = None
    try:
        ts = int(tsstr)
        if not tsstr.lstrip("+-").isdigit() or tsstr in ("+", "-"):
            raise ValueError
    except ValueError:
        if "=" not in tsstr:
            return "err"
        ts = None
        tags = rest
    attrs = {}
    if tags != "":
        res = go_build_labels(tags)
        if isinstance(res, str):
            return "err"
        for k, v in res:
            attrs[k] = v
    if extract:
        name, ents = inject_collectd_labels(name)
        for k, v in ents:
            attrs[k] = v
    vi = vd = None
    try:
        if not valstr.lstrip("+-").isdigit() or valstr in ("+", "-"):
            raise ValueError
        vi = int(valstr)
    except ValueError:
        try:
            vd = float(valstr)
        except ValueError:
            return "err"
    return {"name": name, "tags": attrs, "value_int": vi,
            "value_double": vd, "timestamp_s": ts}


# the reference test table + extra edge lines
CASES = [
    ("no.tags 1 1582230020", False),
    ('"/and," 1 1582230020 source=tst', False),
    ("tst.int 1 1582230020 source=tst", False),
    ("tst.dbl 3.14 source=tst k0=v0", False),
    ("tst.int.3tags 128 1582230020 k0=v_0 k1=v_1 k2=v_2", False),
    ("tst.int.1tag 1.23 1582230020 k0=v_0", False),
    ("collectd.[cdk=cdv].tags 1 source=tst k0=v0", True),
    ("mult.[cdk0=cdv0].collectd.[cdk1=cdv1].groups 1 1582230020 source=tst",
     True),
    ("collectd.last[cdk0=cdv0] 1 1582230020 source=tst", True),
    ("incorrect.tags 1.23 1582230000 1582230020", False),   # err
    ("nan.value xyz 1582230000 source=tst", False),          # err
    (" 1.23 1582230000", False),                              # err
    ("invalid.timestamppb.not.tag 1.23 xyz source=tst", False),  # err
    ("missing.parts 3", False),                               # err
    ('quoted 1 1582230020 k="v with spaces" k2=plain', False),
    ('esc 1 1582230020 k="a\\"b\\nc"', False),
    ('partial 1 1582230020 k="unterminated', False),          # err
    ("spacekey 1 1582230020 a b=c", False),                   # key "a b"
    ("dup 1 1582230020 k=1 k=2", False),                      # last wins
    ("noeq 1 1582230020 justakey", False),                    # err
    ("k=v 5 1582230020", False),                              # name has '='
    ("tagonly 2 source=s", False),                            # omitted ts
]


@pytest.mark.parametrize("line,extract", CASES)
def test_parse_matches_go_restatement(line, extract):
    tbl = pa.table({"line": pa.array([line])})
    out = parse_wavefront_batch(tbl, "line",
                                extract_collectd_tags=extract).to_pylist()[0]
    e = _go_parse(line, extract)
    if e == "err":
        assert out["error"] is not None, (line, out)
        return
    assert out["error"] is None, (line, out["error"])
    assert out["name"] == e["name"], line
    assert dict(out["tags"]) == e["tags"], (line, out["tags"], e["tags"])
    assert out["value_int"] == e["value_int"], line
    if e["value_double"] is None:
        assert out["value_double"] is None
    else:
        assert out["value_double"] == pytest.approx(e["value_double"])
    assert out["timestamp_s"] == e["timestamp_s"], line


def test_batch_mixed_rows():
    lines = [c[0] for c in CASES]
    tbl = pa.table({"line": pa.array(lines)})
    out = parse_wavefront_batch(tbl, "line").to_pylist()
    for line, g in zip(lines, out):
        e = _go_parse(line, False)
        if e == "err":
            assert g["error"] is not None, line
        else:
            assert g["error"] is None, (line, g["error"])
            assert g["name"] == e["name"]
            assert dict(g["tags"]) == e["tags"], line


def test_labels_from_name():
    assert labels_from_name("name[k=v,f=x]-more") == (
        "name-more", {"k": "v", "f": "x"})
    assert labels_from_name("plain") == ("plain", None)
    assert labels_from_name("bad[k]x") == ("bad[k]x", None)
    assert labels_from_name("bad[k=v=w]x") == ("bad[k=v=w]x", None)


def test_collectd_dotdot_rule():
    # ".." collapses only when the ORIGINAL name had none
    n1, _ = inject_collectd_labels("a.[k=v].b")
    assert n1 == "a.b"
    n2, _ = inject_collectd_labels("a..b")
    assert n2 == "a..b"


def test_drop_stage(ray_session):
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.wavefront import (
        parse_wavefront,
    )

    ds = ray.data.from_items(
        [{"line": c[0]} for c in CASES]).repartition(3)
    out = parse_wavefront(ds, "line").take_all()
    ok = [c[0] for c in CASES if _go_parse(c[0], False) != "err"]
    assert len(out) == len(ok)
