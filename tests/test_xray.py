"""awsxray exporter parity — segment typing/naming, http assembly,
error/fault/throttle table, cause stack parsers, LOCAL_ROOT fan-out;
pinned against the reference's own translator tests."""

import json

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.xray import (
    _IdGen,
    _parse_exception,
    convert_to_amazon_trace_id,
    fix_annotation_key,
    fix_segment_name,
    make_segment,
    make_segments_from_span,
    spans_to_xray,
)

RES = {"service.name": "signup_aggregator", "service.version": "semver:1.1.4",
       "container.name": "signup_aggregator",
       "container.image.name": "otel/signupaggregator",
       "container.image.tag": "v1", "k8s.cluster.name": "production",
       "k8s.namespace.name": "default",
       "k8s.deployment.name": "signup_aggregator",
       "k8s.pod.name": "signup_aggregator-x82ufje83",
       "cloud.provider": "aws", "cloud.account.id": "123456789",
       "cloud.region": "us-east-1",
       "cloud.availability_zone": "us-east-1c"}


def row(kind, name, attrs, status=0, msg=None,
        parent="beefcafe12345678", events="[]", res=RES):
    return {"trace_id": "5f84c7a1a006649127e371903a2de979",
            "span_id": "0102030405060708", "parent_span_id": parent,
            "span_name": name, "span_kind": kind,
            "start_time_unix_nano": 1681873445000000006,
            "end_time_unix_nano": 1681873446000000006,
            "status_code": status, "status_message": msg,
            "attributes": json.dumps(attrs),
            "resource_attributes": json.dumps(res),
            "events": events, "links": "[]"}


def test_amazon_trace_id():
    assert convert_to_amazon_trace_id(
        "5f84c7a1a006649127e371903a2de979") == \
        "1-5f84c7a1-a006649127e371903a2de979"
    # epoch validation: too old → error
    with pytest.raises(ValueError):
        convert_to_amazon_trace_id("00000000" + "ab" * 12,
                                   skip_validation=False,
                                   now=1_700_000_000)
    # fresh epoch passes
    convert_to_amazon_trace_id(f"{1_700_000_000 - 60:08x}" + "ab" * 12,
                               skip_validation=False, now=1_700_000_000)


def test_fix_segment_name_and_annotation_key():
    assert fix_segment_name("") == "span"
    assert fix_segment_name("a" * 300) == "a" * 200
    assert fix_segment_name("ok_name.1:/%&#=+-@") == "ok_name.1:/%&#=+-@"
    assert fix_segment_name('bad"$name') == "badname"
    assert fix_annotation_key("a.b-c") == "a.b_c"
    assert fix_annotation_key("a.b-c", allow_dot=False) == "a_b_c"


def test_server_error_fault_table():
    # TestServerSpanWithInternalServerError: 500 → fault, name from
    # resource service.name, enduser.id → user, cause present
    attrs = {"http.method": "POST",
             "http.url": "https://api.example.org/api/locations",
             "http.target": "/api/locations", "http.status_code": 500,
             "http.status_text": "java.lang.NullPointerException",
             "http.user_agent": "PostmanRuntime/7.21.0",
             "enduser.id": "go.tester@example.com"}
    seg = make_segment(row(2, "/api/locations", attrs, status=2,
                           msg="java.lang.NullPointerException"))
    assert seg["name"] == "signup_aggregator"
    assert seg["fault"] is True and seg["error"] is False
    assert "cause" in seg
    assert seg["user"] == "go.tester@example.com"
    assert "type" not in seg                      # server span = segment
    # 429 → error+throttle, not fault (TestServerSpanWithThrottle)
    attrs["http.status_code"] = 429
    seg = make_segment(row(2, "/api/locations", attrs, status=2, msg="x"))
    assert (seg["fault"], seg["error"], seg["throttle"]) == \
        (False, True, True)
    # no http code + error status → fault
    seg = make_segment(row(2, "x", {}, status=2, msg="oops"))
    assert seg["fault"] is True
    assert seg["cause"]["exceptions"][0]["message"] == "oops"
    assert seg["cause"]["exceptions"][0]["type"] == ""


def test_db_client_span():
    # TestClientSpanWithDbComponent
    attrs = {"db.system": "mysql", "db.name": "customers",
             "db.statement": "call update_user_preference( ?, ?, ? )",
             "db.user": "userprefsvc",
             "db.connection_string": "jdbc:mysql://db.dev.example.com:3306",
             "net.peer.name": "db.dev.example.com",
             "net.peer.port": "3306", "enterprise.app.id": "EAPP"}
    seg = make_segment(row(3, "call update_user_preference( ?, ?, ? )",
                           attrs))
    assert seg["name"] == "customers@db.dev.example.com"
    assert seg["namespace"] == "remote" and seg["type"] == "subsegment"
    assert "annotations" not in seg
    assert seg["metadata"]["default"]["enterprise.app.id"] == "EAPP"
    assert "cause" not in seg and "http" not in seg
    assert seg["sql"]["connection_string"] == \
        "jdbc:mysql://db.dev.example.com:3306/customers"
    assert seg["sql"]["database_type"] == "mysql"
    assert seg["sql"]["sanitized_query"] == \
        "call update_user_preference( ?, ?, ? )"


def test_naming_precedence():
    h = {"http.method": "GET", "http.scheme": "https",
         "net.peer.ip": "2607:f8b0:4000:80c::2004",
         "net.peer.port": "9443", "http.target": "/"}
    # http.host > net.peer.name (TestClientSpanWithHttpHost / Without)
    assert make_segment(row(3, "GET /", {**h, "http.host": "foo.com",
                                         "net.peer.name": "bar.com"})
                        )["name"] == "foo.com"
    assert make_segment(row(3, "GET /", {**h, "net.peer.name":
                                         "bar.com"}))["name"] == "bar.com"
    # rpc.service beats http.host (TestClientSpanWithRpcHost)
    assert make_segment(row(3, "GET /x", {**h, "net.peer.name": "b",
                                          "rpc.service":
                                          "com.foo.AnimalService"})
                        )["name"] == "com.foo.AnimalService"
    # aws.service sets name + aws namespace
    seg = make_segment(row(3, "x", {"aws.service": "DynamoDB"}))
    assert seg["name"] == "DynamoDB" and seg["namespace"] == "aws"
    # peer.service wins over all non-x-ray attrs
    seg = make_segment(row(3, "x", {"peer.service": "peer-svc",
                                    "aws.service": "DynamoDB"}))
    assert seg["name"] == "peer-svc"


def test_client_url_and_client_ip():
    h = {"http.method": "GET", "http.scheme": "https",
         "net.peer.ip": "2607:f8b0:4000:80c::2004",
         "net.peer.port": "9443", "http.target": "/",
         "net.peer.name": "bar.com"}
    seg = make_segment(row(3, "GET /", h))
    assert seg["http"]["request"]["url"] == "https://bar.com:9443/"
    assert seg["http"]["request"]["client_ip"] == \
        "2607:f8b0:4000:80c::2004"
    assert "x_forwarded_for" not in seg["http"]["request"]
    # default ports elided
    h2 = {"http.method": "GET", "http.scheme": "https",
          "net.peer.name": "x.com", "net.peer.port": "443",
          "http.target": "/t"}
    seg = make_segment(row(3, "g", h2))
    assert seg["http"]["request"]["url"] == "https://x.com/t"
    # http.client_ip without net.peer → x_forwarded_for true
    seg = make_segment(row(2, "g", {"http.method": "GET",
                                    "http.client_ip": "1.2.3.4"}))
    assert seg["http"]["request"]["client_ip"] == "1.2.3.4"
    assert seg["http"]["request"]["x_forwarded_for"] is True


def test_local_root_fanout():
    lr = {"aws.span.kind": "LOCAL_ROOT",
          "aws.remote.service": "AWS.SDK.S3",
          "aws.local.service": "my-svc", "rpc.system": "aws-api",
          "rpc.method": "GetObject"}
    dep, svc = make_segments_from_span(row(3, "S3.GetObject", lr))
    assert dep["type"] == "subsegment"
    assert dep["name"] == "S3"                    # AWS.SDK. trimmed
    assert dep["namespace"] == "aws"              # aws-api span
    assert dep["parent_id"] == svc["id"]
    assert svc["name"] == "my-svc"
    assert "type" not in svc and "namespace" not in svc
    assert "operation" not in svc.get("aws", {})
    assert dep["aws"]["operation"] == "GetObject"
    # local-root server span: single segment, type/namespace cleared
    segs = make_segments_from_span(
        row(2, "srv", {"aws.span.kind": "LOCAL_ROOT"}))
    assert len(segs) == 1 and "type" not in segs[0]


def test_parse_exception_java_with_cause():
    # TestParseExceptionWithJavaStacktraceAndCauseWithStacktrace
    st = ("java.lang.IllegalStateException: state is not legal\n"
          "\tat io.opentelemetry.sdk.trace.RecordEventsReadableSpanTest"
          ".recordException(RecordEventsReadableSpanTest.java:626)\n"
          "\tat java.base/jdk.internal.reflect.NativeMethodAccessorImpl"
          ".invoke0(Native Method)\n"
          "\tat java.base/jdk.internal.reflect.NativeMethodAccessorImpl"
          ".invoke(NativeMethodAccessorImpl.java:62)\n"
          "Caused by: java.lang.IllegalArgumentException: bad argument\n"
          "\tat org.junit.platform.engine.support.hierarchical."
          "ThrowableCollector.execute(ThrowableCollector.java:73)\n"
          "\tat org.junit.platform.engine.support.hierarchical."
          "NodeTestTask.executeRecursively(NodeTestTask.java)")
    exs = _parse_exception("com.foo.Exception", "Error happened", st,
                           True, "java", _IdGen("t", "s"))
    assert len(exs) == 2
    e0, e1 = exs
    assert e0["type"] == "com.foo.Exception"
    assert e0["message"] == "Error happened"
    assert [f["label"] for f in e0["stack"]] == [
        "io.opentelemetry.sdk.trace.RecordEventsReadableSpanTest"
        ".recordException",
        "jdk.internal.reflect.NativeMethodAccessorImpl.invoke0",
        "jdk.internal.reflect.NativeMethodAccessorImpl.invoke"]
    assert [f.get("path") for f in e0["stack"]] == [
        "RecordEventsReadableSpanTest.java", "Native Method",
        "NativeMethodAccessorImpl.java"]
    assert [f["line"] for f in e0["stack"]] == [626, 0, 62]
    assert e0["cause"] == e1["id"]
    assert e1["type"] == "java.lang.IllegalArgumentException"
    assert e1["message"] == "bad argument"
    assert [f["line"] for f in e1["stack"]] == [73, 0]
    assert e0["remote"] is True


def test_parse_exception_python_with_cause():
    # TestParseExceptionWithPythonStacktraceAndCause
    st = ("Traceback (most recent call last):\n"
          '  File "bar.py", line 10, in greet_many\n'
          "    greet(person)\n"
          '  File "foo.py", line 5, in greet\n'
          "    print(greeting + ', ' + who_to_greet(someone))\n"
          "ValueError: bad value\n"
          "\n"
          "During handling of the above exception, another exception"
          " occurred:\n"
          "\n"
          "Traceback (most recent call last):\n"
          '  File "main.py", line 14, in <module>\n'
          "    greet_many(['Chad', 'Dan', 1])\n"
          '  File "greetings.py", line 12, in greet_many\n'
          "    print('hi, ' + person)\n"
          "TypeError: must be str, not int")
    exs = _parse_exception("TypeError", "must be str, not int", st,
                           True, "python", _IdGen("t", "s"))
    assert len(exs) == 2
    e0, e1 = exs
    assert [(f["path"], f["line"], f["label"]) for f in e0["stack"]] == \
        [("greetings.py", 12, "greet_many"), ("main.py", 14, "<module>")]
    assert e1["type"] == "ValueError" and e1["message"] == "bad value"
    assert [(f["path"], f["line"], f["label"]) for f in e1["stack"]] == \
        [("foo.py", 5, "greet"), ("bar.py", 10, "greet_many")]
    assert e0["cause"] == e1["id"]


def test_parse_exception_js():
    # TestParseExceptionWithJavaScriptStacktrace: labels keep the
    # trailing space (Go slices line[7:parenIdx])
    st = ("TypeError: Cannot read property 'value' of null\n"
          "    at speedy (/home/gbusey/file.js:6:11)\n"
          "    at makeFaster (/home/gbusey/file.js:5:3)\n"
          "    at Object.<anonymous> (/home/gbusey/file.js:10:1)\n"
          "    at node.js:906:3\n"
          "    at Array.forEach (native)\n"
          "    at native")
    exs = _parse_exception("TypeError", "m", st, True, "javascript",
                           _IdGen("t", "s"))
    stack = exs[0]["stack"]
    assert len(stack) == 6
    assert (stack[0]["path"], stack[0]["line"], stack[0]["label"]) == \
        ("/home/gbusey/file.js", 6, "speedy ")
    assert (stack[2]["path"], stack[2]["line"], stack[2]["label"]) == \
        ("/home/gbusey/file.js", 10, "Object.<anonymous> ")
    assert (stack[3]["path"], stack[3]["line"]) == ("node.js", 906)
    assert "label" not in stack[3]
    assert (stack[4]["path"], stack[4]["label"]) == \
        ("native", "Array.forEach ")
    assert stack[5]["path"] == "native"
    # malformed lines (TestParseExceptionWithJavaScriptStacktrace
    # MalformedLines): no-colon path kept with line 0
    st = ("TypeError: x\n"
          "    at speedy (/home/gbusey/file.js)\n"
          "    at makeFaster (/home/gbusey/file.js:5:3)malformed123\n"
          "    at Object.<anonymous> (/home/gbusey/file.js:10")
    exs = _parse_exception("TypeError", "m", st, True, "javascript",
                           _IdGen("t", "s"))
    stack = exs[0]["stack"]
    assert len(stack) == 1
    assert (stack[0]["path"], stack[0]["line"], stack[0]["label"]) == \
        ("/home/gbusey/file.js", 0, "speedy ")


def test_aws_block_and_origin():
    attrs = {"rpc.system": "aws-api", "rpc.method": "GetItem",
             "aws.table_name": "t1", "aws.request_id": "r-1",
             "aws.region": "us-west-2"}
    res = {**RES, "cloud.platform": "aws_ecs",
           "aws.ecs.launchtype": "fargate"}
    seg = make_segment(row(3, "DynamoDB.GetItem", attrs, res=res))
    assert seg["origin"] == "AWS::ECS::Fargate"
    aws = seg["aws"]
    assert aws["operation"] == "GetItem"
    assert aws["table_name"] == "t1"
    assert aws["request_id"] == "r-1"
    assert aws["region"] == "us-west-2"
    assert aws["account_id"] == "123456789"
    assert "ecs" in aws
    assert seg["namespace"] == "aws"
    # non-AWS provider drops the whole aws block
    seg = make_segment(row(3, "x", {},
                           res={"cloud.provider": "gcp"}))
    assert "aws" not in seg and "origin" not in seg


def test_annotations_metadata_split():
    attrs = {"a.b": "v1", "plain": 7,
             "aws.xray.annotations": ["plain"],
             "aws.xray.metadata.custom": json.dumps({"k": 1}),
             "aws.xray.metadata.default": json.dumps({"dk": "dv"}),
             "aws.xray.metadata.bad": "not json"}
    seg = make_segment(row(2, "x", attrs), )
    assert seg["annotations"] == {"plain": 7}
    md = seg["metadata"]
    assert md["custom"] == {"k": 1}
    assert md["default"]["dk"] == "dv"
    assert md["default"]["aws.xray.metadata.bad"] == "not json"
    assert md["default"]["a.b"] == "v1"
    # indexed_attrs + allow_dot=False key scrub
    seg = make_segment(row(2, "x", {"a.b": "v"}),
                       indexed_attrs=("a.b",), allow_dot=False)
    assert seg["annotations"] == {"a_b": "v"}
    # index_all: resource attrs are annotated too (otel.resource.*)
    seg = make_segment(row(2, "x", {"a.b": "v", "n": 2},
                           res={"service.name": "s"}),
                       index_all_attrs=True)
    assert seg["annotations"] == {"a.b": "v", "n": 2,
                                  "otel.resource.service.name": "s"}


def test_spans_to_xray_dataset(ray_session):
    import ray

    r = row(2, "srv", {"http.method": "GET", "http.status_code": 200})
    t = pa.table({k: pa.array([v], pa.int64() if isinstance(v, int)
                              else pa.string())
                  for k, v in r.items()})
    out = spans_to_xray(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 1
    doc = json.loads(out["xray_json"].iloc[0])
    assert doc["trace_id"] == "1-5f84c7a1-a006649127e371903a2de979"
    assert doc["http"]["response"]["status"] == 200


# --- receiver direction (receiver/awsxrayreceiver) ------------------------

from opentelemetry_collector_contrib_ray.stages.xray import (  # noqa: E402
    parse_xray_segments,
    xray_doc_to_rows,
)


def _xdoc(**over):
    d = {"name": "svc", "id": "0102030405060708",
         "trace_id": "1-5f84c7a1-a006649127e371903a2de979",
         "start_time": 1681873445.0, "end_time": 1681873446.0}
    d.update(over)
    return d


def test_xray_decode_trace_id_and_kind_rules():
    rows = xray_doc_to_rows(_xdoc())
    assert rows[0]["trace_id"] == "5f84c7a1a006649127e371903a2de979"
    assert rows[0]["span_kind"] == 2          # root (no parent) → Server
    # parent present + nil namespace → Internal
    rows = xray_doc_to_rows(_xdoc(parent_id="1112131415161718"))
    assert rows[0]["span_kind"] == 1
    # remote namespace → Client
    rows = xray_doc_to_rows(_xdoc(parent_id="1112131415161718",
                                  namespace="remote"))
    assert rows[0]["span_kind"] == 3
    # aws namespace → Client + aws.service attr
    rows = xray_doc_to_rows(_xdoc(parent_id="1112131415161718",
                                  namespace="aws"))
    assert rows[0]["span_kind"] == 3
    assert json.loads(rows[0]["attributes"])["aws.service"] == "svc"
    # client_ip → Server even with a parent
    rows = xray_doc_to_rows(_xdoc(
        parent_id="1112131415161718",
        http={"request": {"client_ip": "1.2.3.4"}}))
    assert rows[0]["span_kind"] == 2
    # unknown namespace → error
    with pytest.raises(ValueError):
        xray_doc_to_rows(_xdoc(namespace="weird"))
    # short trace id → error
    with pytest.raises(ValueError):
        xray_doc_to_rows(_xdoc(trace_id="1-abc-def"))


def test_xray_decode_status_and_exception_events():
    rows = xray_doc_to_rows(_xdoc(
        http={"response": {"status": 503, "content_length": "12"}}))
    r = rows[0]
    assert r["status_code"] == 2
    attrs = json.loads(r["attributes"])
    assert attrs["http.status_code"] == 503
    assert attrs["http.response_content_length"] == "12"
    # 2xx → Unset
    assert xray_doc_to_rows(_xdoc(
        http={"response": {"status": 200}}))[0]["status_code"] == 0
    # cause exception-id string form → status message
    r = xray_doc_to_rows(_xdoc(cause="abcdefabcdefabcd"))[0]
    assert r["status_code"] == 2
    assert r["status_message"] == "abcdefabcdefabcd"
    # exception object with rebuilt stacktrace
    r = xray_doc_to_rows(_xdoc(cause={"exceptions": [{
        "id": "x1", "type": "E", "message": "m", "remote": True,
        "stack": [{"label": "fn", "path": "f.go", "line": 12},
                  {"label": "g", "path": "h.go"}]}]}))[0]
    ev = json.loads(r["events"])[0]
    assert ev["name"] == "exception"
    assert ev["attributes"]["exception.stacktrace"] == \
        "E: m\n\tat fn(f.go: 12)\n\tat g(h.go: <unknown>)\n"
    assert ev["attributes"]["aws.xray.exception.id"] == "x1"


def test_xray_decode_resource_and_sdk():
    doc = _xdoc(aws={"account_id": "1",
                     "xray": {"sdk": "X-Ray for Go",
                              "sdk_version": "2.0"}},
                service={"version": "v1"},
                resource_arn="arn:x")
    res = json.loads(xray_doc_to_rows(doc)[0]["resource_attributes"])
    assert res["cloud.provider"] == "aws"
    assert res["telemetry.sdk.language"] == "Go"
    assert res["telemetry.sdk.name"] == "X-Ray for Go"
    assert res["service.version"] == "v1"
    assert res["aws.xray.resource_arn"] == "arn:x"
    # a cause with exceptions forces language java (the receiver TODO)
    doc["cause"] = {"exceptions": [{"id": "x"}]}
    res = json.loads(xray_doc_to_rows(doc)[0]["resource_attributes"])
    assert res["telemetry.sdk.language"] == "java"
    # no aws block → unknown provider
    res = json.loads(xray_doc_to_rows(_xdoc())[0]["resource_attributes"])
    assert res["cloud.provider"] == "unknown"


def test_xray_decode_sql_and_subsegments():
    doc = _xdoc(sql={"url": "mysql://h:3306/mydb?x=1",
                     "database_type": "mysql",
                     "sanitized_query": "SELECT 1", "user": "u"})
    attrs = json.loads(xray_doc_to_rows(doc)[0]["attributes"])
    assert attrs["db.connection_string"] == "mysql://h:3306"
    assert attrs["db.name"] == "mydb"
    with pytest.raises(ValueError):
        xray_doc_to_rows(_xdoc(sql={"url": "no-slashes"}))
    # subsegments inherit trace id, parent = enclosing id
    doc = _xdoc(subsegments=[
        {"name": "inner", "id": "1112131415161718",
         "start_time": 1.0,
         "subsegments": [{"name": "leaf", "id": "2122232425262728",
                          "start_time": 2.0}]}])
    rows = xray_doc_to_rows(doc)
    assert [r["span_name"] for r in rows] == ["svc", "inner", "leaf"]
    assert rows[1]["parent_span_id"] == "0102030405060708"
    assert rows[2]["parent_span_id"] == "1112131415161718"
    assert rows[2]["trace_id"] == rows[0]["trace_id"]


def test_parse_xray_segments_dataset(ray_session):
    import ray

    good = json.dumps(_xdoc())
    ds = ray.data.from_arrow(pa.table({
        "xray_json": pa.array([good, '{"id": "x"}'], pa.string())}))
    out = parse_xray_segments(ds, "xray_json").to_pandas()
    assert len(out) == 1                 # invalid segment dropped
    kept = parse_xray_segments(ds, "xray_json",
                               on_error="keep").to_pandas()
    assert len(kept) == 2 and kept["error"].notna().sum() == 1
