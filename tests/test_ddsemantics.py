"""datadogsemanticsprocessor parity — vectors from processor_test.go
(complete test, overrideIncomingDatadogFields both ways, the
empty-span defaults) plus unit vectors for the naming restatements."""

import json

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.ddsemantics import (
    DatadogSemantics,
    operation_name_v2,
    resource_v2,
    span_type,
    status2_error,
    strip_protocol_from_url,
)


def run(rows, override=False):
    fields = {"doc_id": pa.int64(), "span_name": pa.string(),
              "span_kind": pa.int64(), "status_code": pa.int64(),
              "status_message": pa.string(), "attributes": pa.string(),
              "resource_attributes": pa.string(),
              "events": pa.string()}
    tab = pa.table({k: pa.array([r.get(k) for r in rows], t)
                    for k, t in fields.items()})
    out = DatadogSemantics(override)(tab)
    return [(json.loads(r), json.loads(a)) for r, a in
            zip(out.column("resource_attributes").to_pylist(),
                out.column("attributes").to_pylist())]


def test_complete_translation_vector():
    # "complete test" from processor_test.go:124-175
    rows = [{
        "doc_id": 0, "span_name": "span", "span_kind": 2,
        "status_code": 0,
        "attributes": json.dumps({"operation.name": "test-operation",
                                  "http.status_code": 200}),
        "resource_attributes": json.dumps({
            "service.name": "test-service",
            "resource.name": "test-resource",
            "deployment.environment.name": "spanenv2",
            "service.version": "v2", "host.name": "test-host-name"}),
        "events": "[]"}]
    (rattr, sattr), = run(rows)
    assert rattr["datadog.service"] == "test-service"
    assert rattr["datadog.env"] == "spanenv2"
    assert rattr["datadog.version"] == "v2"
    assert rattr["datadog.host.name"] == "test-host-name"
    assert sattr["datadog.name"] == "test-operation"
    assert sattr["datadog.resource"] == "test-resource"
    assert sattr["datadog.type"] == "web"
    assert sattr["datadog.span.kind"] == "server"
    assert sattr["datadog.http_status_code"] == "200"
    assert sattr["datadog.error"] == 0
    assert "datadog.error.msg" not in sattr


def test_no_override_keeps_incoming_fields():
    # second case (:176-259): incoming datadog.* wins without override
    rows = [{
        "doc_id": 0, "span_name": "", "span_kind": 2, "status_code": 2,
        "status_message": "overridden-error-msg",
        "attributes": json.dumps({
            "datadog.service": "specified-service",
            "datadog.resource": "specified-resource",
            "datadog.name": "specified-operation",
            "datadog.type": "specified-type",
            "datadog.span.kind": "specified-span-kind",
            "datadog.http_status_code": "500",
            "datadog.error": 1,
            "datadog.error.msg": "specified-error-msg",
            "operation.name": "test-operation",
            "http.status_code": 200}),
        "resource_attributes": json.dumps({
            "service.name": "test-service",
            "datadog.host.name": "specified-host-name",
            "datadog.version": "specified-version",
            "service.version": "overridden-version",
            "host.name": "overridden-host-name"}),
        "events": "[]"}]
    (rattr, sattr), = run(rows, override=False)
    assert rattr["datadog.host.name"] == "specified-host-name"
    assert rattr["datadog.version"] == "specified-version"
    assert sattr["datadog.name"] == "specified-operation"
    assert sattr["datadog.resource"] == "specified-resource"
    assert sattr["datadog.type"] == "specified-type"
    assert sattr["datadog.span.kind"] == "specified-span-kind"
    assert sattr["datadog.http_status_code"] == "500"
    assert sattr["datadog.error.msg"] == "specified-error-msg"


def test_override_recomputes():
    rows = [{
        "doc_id": 0, "span_name": "", "span_kind": 2, "status_code": 2,
        "status_message": "status-error-msg",
        "attributes": json.dumps({
            "datadog.name": "specified-operation",
            "datadog.error": 0,
            "operation.name": "test-operation",
            "http.status_code": 200}),
        "resource_attributes": json.dumps({
            "datadog.host.name": "specified-host-name",
            "host.name": "real-host"}),
        "events": json.dumps([{
            "name": "Exception",
            "attributes": {"exception.message": "boom",
                           "exception.type": "T",
                           "exception.stacktrace": "S"}}])}]
    (rattr, sattr), = run(rows, override=True)
    # incoming datadog.host.name removed before source resolution
    assert rattr["datadog.host.name"] == "real-host"
    assert rattr["datadog.service"] == "otlpresourcenoservicename"
    assert rattr["datadog.env"] == "default"
    assert sattr["datadog.name"] == "test-operation"
    assert sattr["datadog.error"] == 1
    # exception event wins over status message; name match is
    # case-insensitive
    assert sattr["datadog.error.msg"] == "boom"
    assert sattr["datadog.error.type"] == "T"
    assert sattr["datadog.error.stack"] == "S"


def test_empty_span_defaults():
    # third case (:260-330): no attrs at all
    rows = [{"doc_id": 0, "span_name": "", "span_kind": 2,
             "status_code": 0, "attributes": "{}",
             "resource_attributes": "{}", "events": "[]"}]
    (rattr, sattr), = run(rows)
    assert rattr["datadog.service"] == "otlpresourcenoservicename"
    assert sattr["datadog.name"] == "server.request"
    assert sattr["datadog.resource"] == ""
    assert sattr["datadog.type"] == "web"


def test_operation_name_rules():
    assert operation_name_v2(2, {"http.request.method": "GET"}) == \
        "http.server.request"
    assert operation_name_v2(3, {"http.method": "GET"}) == \
        "http.client.request"
    assert operation_name_v2(3, {"db.system": "Postgres"}) == \
        "postgres.query"
    assert operation_name_v2(5, {"messaging.system": "Kafka",
                                 "messaging.operation": "Receive"}) == \
        "kafka.receive"
    assert operation_name_v2(3, {"rpc.system": "aws-api",
                                 "rpc.service": "S3"}) == \
        "aws.s3.request"
    assert operation_name_v2(3, {"rpc.system": "grpc"}) == \
        "grpc.client.request"
    assert operation_name_v2(2, {"rpc.system": "grpc"}) == \
        "grpc.server.request"
    assert operation_name_v2(3, {"faas.invoked_provider": "aws",
                                 "faas.invoked_name": "fn"}) == \
        "aws.fn.invoke"
    assert operation_name_v2(2, {"faas.trigger": "http"}) == \
        "http.invoke"
    assert operation_name_v2(1, {"graphql.operation.type": "query"}) \
        == "graphql.server.request"
    assert operation_name_v2(2, {"network.protocol.name": "AMQP"}) == \
        "amqp.server.request"
    assert operation_name_v2(3, {}) == "client.request"
    assert operation_name_v2(4, {}) == "producer"
    assert operation_name_v2(0, {}) == "internal"


def test_resource_and_type_rules():
    assert resource_v2(2, {"http.request.method": "_OTHER",
                           "http.route": "/x"}, {}, "n") == "HTTP /x"
    assert resource_v2(2, {"messaging.operation": "send",
                           "messaging.destination.name": "q1"},
                       {}, "n") == "send q1"
    assert resource_v2(3, {"rpc.method": "Get", "rpc.service": "S"},
                       {}, "n") == "Get S"
    assert resource_v2(3, {"db.statement": "SELECT 1"}, {}, "n") == \
        "SELECT 1"
    assert resource_v2(3, {}, {}, "fallback") == "fallback"
    assert span_type(3, {"db.system": "redis"}, {}) == "cache"
    assert span_type(3, {"db.system": "mysql"}, {}) == "db"
    assert span_type(3, {}, {}) == "http"
    assert span_type(5, {}, {}) == "custom"


def test_status2_error_fallbacks():
    # status message fallback
    err, meta = status2_error(2, "msg", [], {})
    assert err == 1 and meta["error.msg"] == "msg"
    # http code fallback (+ status_text)
    err, meta = status2_error(2, "", [], {"http.status_code": 503,
                                          "http.status_text": "SU"})
    assert meta["error.msg"] == "503 SU"
    err, meta = status2_error(2, "", [], {"http.response.status_code":
                                          500})
    assert meta["error.msg"] == "500"
    assert status2_error(1, "m", [], {}) == (0, {})


def test_vcs_and_url_strip():
    assert strip_protocol_from_url("https://github.com/a/b") == \
        "github.com/a/b"
    assert strip_protocol_from_url("git+ssh://host/x") == "host/x"
    assert strip_protocol_from_url("not a url") == "not a url"
    rows = [{"doc_id": 0, "span_name": "", "span_kind": 1,
             "status_code": 0,
             "attributes": json.dumps({
                 "vcs.ref.head.revision": "abc123",
                 "vcs.repository.url.full": "https://gh.io/r"}),
             "resource_attributes": json.dumps({
                 "vcs.ref.head.revision": "def456",
                 "vcs.repository.url.full": "ssh://git.host/r2"}),
             "events": "[]"}]
    (rattr, sattr), = run(rows)
    assert rattr["git.commit.sha"] == "def456"
    assert rattr["git.repository_url"] == "git.host/r2"
    assert sattr["git.commit.sha"] == "abc123"
    assert sattr["git.repository_url"] == "gh.io/r"
