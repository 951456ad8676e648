"""honeycombmarkerexporter parity (logs_exporter.go:79-157)."""

import pyarrow as pa


def _run(markers, rows, api_url="https://api.honeycomb.io"):
    import ray

    from opentelemetry_collector_contrib_ray.stages.honeycomb import (
        honeycomb_markers,
    )

    t = pa.table({
        "severity_text": pa.array([r[0] for r in rows], pa.string()),
        "attributes": pa.array([r[1] for r in rows],
                               pa.map_(pa.string(), pa.string())),
    })
    return honeycomb_markers(ray.data.from_arrow(t), markers,
                             api_url=api_url).take_all()


MARKERS = [
    {"type": "error-marker", "message_key": "msg", "url_key": "url",
     "log_conditions": ['severity_text == "ERROR"']},
    {"type": "deploy", "dataset_slug": "prod",
     "log_conditions": ['attributes["deploy"] != nil']},
]


def test_match_and_request_shape(ray_session):
    out = _run(MARKERS, [
        ("ERROR", [("msg", "boom"), ("url", "http://x")]),
        ("INFO", [("deploy", "v2")]),
        ("ERROR", [("deploy", "v3")]),   # matches BOTH markers
        ("INFO", []),                    # matches neither
    ])
    got = sorted((r["marker_type"], r["marker_request"],
                  r["marker_url"]) for r in out)
    assert got == [
        ("deploy", '{"type":"deploy"}',
         "https://api.honeycomb.io/1/markers/prod"),
        ("deploy", '{"type":"deploy"}',
         "https://api.honeycomb.io/1/markers/prod"),
        ("error-marker",
         '{"message":"boom","type":"error-marker","url":"http://x"}',
         "https://api.honeycomb.io/1/markers/__all__"),
        ("error-marker", '{"type":"error-marker"}',
         "https://api.honeycomb.io/1/markers/__all__"),
    ]


def test_or_conditions_and_slug_default(ray_session):
    markers = [{"type": "t", "log_conditions": [
        'severity_text == "A"', 'severity_text == "B"']}]
    out = _run(markers, [("A", []), ("B", []), ("C", [])],
               api_url="https://h/")  # trailing slash trimmed
    assert len(out) == 2
    assert out[0]["marker_url"] == "https://h/1/markers/__all__"


def test_message_only_when_attr_present(ray_session):
    markers = [{"type": "t", "message_key": "m", "url_key": "u",
                "log_conditions": ["true"]}]
    out = _run(markers, [("X", [("m", "hello")])])
    assert out[0]["marker_request"] == \
        '{"message":"hello","type":"t"}'
