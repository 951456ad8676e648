"""Syslog / container / URL parsers + OTLP-JSON source tests."""

import json

import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.functions.converters import get_converter
from opentelemetry_collector_contrib_ray.sources.otlpjson import (
    flatten_otlp_logs,
    read_otlp_json_logs,
)
from opentelemetry_collector_contrib_ray.stages.parsers import (
    ContainerParse,
    SyslogParse,
)


def test_syslog_rfc3164():
    batch = pa.table({"raw": [
        "<34>Oct 11 22:14:15 mymachine su[123]: 'su root' failed",
        "<13>Feb  5 17:32:18 host1 app: simple message",
        "not syslog at all",
    ]})
    out = SyslogParse(rfc="rfc3164")(batch)
    assert out.num_rows == 2  # on_error=drop
    assert out.column("facility").to_pylist() == [4, 1]   # 34>>3, 13>>3
    assert out.column("severity").to_pylist() == [2, 5]   # 34&7, 13&7
    assert out.column("hostname").to_pylist() == ["mymachine", "host1"]
    assert out.column("tag").to_pylist() == ["su", "app"]
    assert out.column("proc_id").to_pylist() == ["123", None]
    assert out.column("message").to_pylist() == ["'su root' failed", "simple message"]


def test_syslog_rfc5424():
    line = ('<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog '
            '- ID47 [exampleSDID@32473 iut="3"] An application event')
    out = SyslogParse(rfc="rfc5424")(pa.table({"raw": [line]}))
    assert out.column("facility").to_pylist() == [20]
    assert out.column("severity").to_pylist() == [5]
    assert out.column("appname").to_pylist() == ["evntslog"]
    assert out.column("structured_data").to_pylist() == ['[exampleSDID@32473 iut="3"]']
    assert out.column("message").to_pylist() == ["An application event"]


def test_container_docker_and_cri():
    docker = pa.table({"raw": [
        json.dumps({"log": "hello\n", "stream": "stdout",
                    "time": "2024-01-01T00:00:00.0Z"}),
        "corrupt",
    ]})
    out = ContainerParse("docker")(docker)
    assert out.num_rows == 1
    assert out.column("log").to_pylist() == ["hello\n"]
    assert out.column("stream").to_pylist() == ["stdout"]

    cri = pa.table({"raw": [
        "2024-01-01T00:00:01.000000000Z stderr F fatal error occurred",
    ]})
    out = ContainerParse("cri")(cri)
    assert out.column("stream").to_pylist() == ["stderr"]
    assert out.column("logtag").to_pylist() == ["F"]
    assert out.column("log").to_pylist() == ["fatal error occurred"]


def test_url_converter():
    out = get_converter("URL")(pa.array(
        ["https://user@example.com:8443/a/b?x=1#frag", "not a url", None]
    ))
    rows = out.to_pylist()
    assert rows[0]["scheme"] == "https"
    assert rows[0]["host"] == "example.com"
    assert rows[0]["port"] == 8443
    assert rows[0]["path"] == "/a/b"
    assert rows[0]["query"] == "x=1"
    assert rows[0]["fragment"] == "frag"
    assert rows[0]["user"] == "user"
    assert rows[1]["scheme"] is None and rows[1]["path"] == "not a url"
    assert rows[2] is None


OTLP_DOC = {
    "resourceLogs": [{
        "resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": "svc-a"}},
        ]},
        "scopeLogs": [{
            "scope": {"name": "lib1"},
            "logRecords": [
                {"timeUnixNano": "1704067200000000000", "severityNumber": 9,
                 "severityText": "Info", "body": {"stringValue": "started"},
                 "attributes": [{"key": "k", "value": {"intValue": "7"}}],
                 "traceId": "0af7651916cd43dd8448eb211c80319c",
                 "spanId": "b7ad6b7169203331"},
                {"timeUnixNano": "1704067201000000000", "severityNumber": 17,
                 "severityText": "Error", "body": {"stringValue": "boom"}},
            ],
        }],
    }]
}


def test_flatten_otlp_logs():
    rows = flatten_otlp_logs(OTLP_DOC)
    assert len(rows) == 2
    assert rows[0]["body"] == "started"
    assert rows[0]["severity_number"] == 9
    assert json.loads(rows[0]["attributes"]) == {"k": 7}
    assert json.loads(rows[0]["resource_attributes"]) == {"service.name": "svc-a"}
    assert rows[1]["severity_text"] == "Error"


def test_read_otlp_json_logs(tmp_path):
    p = tmp_path / "logs.otlpjson"
    with open(p, "w") as f:
        f.write(json.dumps(OTLP_DOC) + "\n")
        f.write(json.dumps(OTLP_DOC) + "\n")
    ds = read_otlp_json_logs(str(p))
    df = ds.to_pandas()
    assert len(df) == 4
    assert set(df["severity_text"]) == {"Info", "Error"}
    assert df["time_unix_nano"].max() == 1704067201000000000


def test_replicated_corpus_doc_ids_unique_past_rep10():
    """rep >= 10 shifts ids to 9+ digits; the old U8 format truncated them
    into collisions across replicas (ADVICE r1). U20 keeps all digits."""
    from opentelemetry_collector_contrib_ray.sources.corpus import corpus_dataset

    from .conftest import SF_SMOKE

    ds = corpus_dataset(SF_SMOKE, with_raw=False, replicate=12)
    df = ds.to_pandas()
    assert df["doc_id"].is_unique
    # base replica keeps the historical 8-digit zero-padded format
    assert df["doc_id"].str.startswith("doc-0000").any()
    # replica 11 carries full 9-digit ids (110_000_000 + i), untruncated
    assert df["doc_id"].str.len().max() >= len("doc-110000000")


def test_jsonl_and_csv_file_sources(tmp_path):
    """Structured-file sources: JSONL / CSV round-trip with projection and
    source_file attribution (the filelog + json/csv parser front door)."""
    import json

    from opentelemetry_collector_contrib_ray.sources.files import (
        read_csv_logs,
        read_jsonl_logs,
    )

    rows = [{"lvl": "INFO", "msg": f"m{i}", "n": i} for i in range(20)]
    jf = tmp_path / "a.jsonl"
    jf.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = read_jsonl_logs(str(jf), columns=["lvl", "n"],
                          include_path=True).to_pandas()
    assert len(out) == 20
    assert list(out.columns) == ["lvl", "n", "source_file"]
    assert out["n"].tolist() == list(range(20))
    assert out["source_file"].str.endswith("a.jsonl").all()

    cf = tmp_path / "b.csv"
    cf.write_text("lvl,msg,n\n" + "\n".join(
        f"{r['lvl']},{r['msg']},{r['n']}" for r in rows) + "\n")
    out2 = read_csv_logs(str(cf), columns=["msg", "n"]).to_pandas()
    assert len(out2) == 20 and list(out2.columns) == ["msg", "n"]
    assert out2["n"].sum() == sum(range(20))
