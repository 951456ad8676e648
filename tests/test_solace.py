"""solacereceiver parity — topic multiplexing, receive/egress/move
unmarshallers (unmarshaller*.go)."""

import base64
import json

from opentelemetry_collector_contrib_ray.stages.solace import (
    decode_solace_message,
    is_anonymous_queue,
    is_anonymous_topic_endpoint,
    parse_baggage,
    rgmid_to_string,
)


def b64(raw: bytes) -> str:
    return base64.b64encode(raw).decode()


RECEIVE_TOPIC = "_telemetry/broker/trace/receive/v1"
EGRESS_TOPIC = "_telemetry/broker/trace/egress/v1"
MOVE_TOPIC = "_telemetry/broker/trace/move/v1"


def test_topic_multiplexing_errors():
    assert decode_solace_message("some/topic", "{}")[1] == \
        "unknown topic"
    assert "upgrade required" in decode_solace_message(
        "_telemetry/broker/trace/receive/v2", "{}")[1]
    assert "upgrade required" in decode_solace_message(
        "_telemetry/other/v1", "{}")[1]
    assert decode_solace_message(RECEIVE_TOPIC, "")[1] == \
        "no binary attachment"


def test_rgmid_and_anonymous_rules():
    rgmid = bytes([1]) + bytes(range(16))
    assert rgmid_to_string(rgmid) == \
        "rmid1:00010-20304050607-08090a0b-0c0d0e0f"
    # wrong version/length → plain hex
    assert rgmid_to_string(bytes([2, 3])) == "0203"
    assert rgmid_to_string(b"") == ""
    assert is_anonymous_queue("#P2P/QTMP/v:1/abc")
    assert not is_anonymous_queue("my-queue")
    assert is_anonymous_topic_endpoint("0123456789abcdef" * 2)
    assert not is_anonymous_topic_endpoint("0123456789ABCDEF" * 2)
    assert not is_anonymous_topic_endpoint("abc")


def test_receive_span_full():
    sd = {
        "traceId": b64(bytes(range(16))),
        "spanId": b64(bytes(range(8))),
        "parentSpanId": b64(bytes([9] * 8)),
        "startTimeUnixNano": 1234, "endTimeUnixNano": 2345,
        "routerName": "router1", "solosVersion": "10.5",
        "messageVpnName": "vpn1",
        "topic": "orders/created", "protocol": "MQTT",
        "protocolVersion": "3.1.1",
        "applicationMessageId": "mid",
        "correlationId": "cid",
        "binaryAttachmentSize": 10, "xmlAttachmentSize": 5,
        "metadataSize": 3,
        "clientUsername": "user", "clientName": "client",
        "brokerReceiveTimeUnixNano": 999,
        "deliveryMode": "PERSISTENT",
        "replicationGroupMessageId":
        b64(bytes([1]) + bytes(range(16))),
        "priority": 4, "ttl": 86000, "replyToTopic": "reply",
        "dmqEligible": True,
        "droppedEnqueueEventsSuccess": 2,
        "droppedEnqueueEventsFailed": 1,
        "hostIp": b64(bytes([10, 0, 0, 1])), "hostPort": 55555,
        "peerIp": b64(bytes([16] * 16)), "peerPort": 12345,
        "baggage": "k1=v1;p1;p2=pv,k2=v2",
        "droppedApplicationMessageProperties": False,
        "userProperties": {
            "s": {"stringValue": "x"}, "b": {"boolValue": True},
            "i": {"int32Value": 7}, "n": {"nullValue": None},
            "c": {"characterValue": 65}},
        "enqueueEvents": [
            {"queueName": "q1", "timeUnixNano": 11,
             "rejectsAllEnqueues": False, "partitionNumber": 3},
            {"topicEndpointName": "te1", "timeUnixNano": 12,
             "rejectsAllEnqueues": True,
             "errorDescription": "full", "ttl": 60}],
        "transactionEvent": {
            "timeUnixNano": 13, "type": "COMMIT",
            "initiator": "CLIENT",
            "xid": {"formatId": -1,
                    "branchQualifier": b64(bytes([0, 8, 20, 254])),
                    "globalId": b64(bytes([128, 56, 66]))}},
        "errorDescription": "",
    }
    rows, err = decode_solace_message(RECEIVE_TOPIC, json.dumps(sd))
    assert err == "" and len(rows) == 1
    r = rows[0]
    assert r["span_name"] == "orders/created receive"
    assert r["span_kind"] == 5 and r["status_code"] == 0
    assert r["trace_id"] == bytes(range(16)).hex()
    assert r["parent_span_id"] == "09" * 8
    res = json.loads(r["resource_attributes"])
    assert res == {"service.name": "router1",
                   "service.version": "10.5",
                   "service.instance.id": "vpn1"}
    a = json.loads(r["attributes"])
    assert a["messaging.system"] == "SolacePubSub+"
    assert a["messaging.message.body.size"] == 15
    assert a["messaging.message.envelope.size"] == 18
    assert a["messaging.solace.delivery_mode"] == "persistent"
    assert a["messaging.solace.replication_group_message_id"] == \
        "rmid1:00010-20304050607-08090a0b-0c0d0e0f"
    assert a["server.address"] == "10.0.0.1"
    assert a["network.peer.address"] == \
        "1010:1010:1010:1010:1010:1010:1010:1010"
    assert a["messaging.solace.message.baggage.k1"] == "v1"
    assert a["messaging.solace.message.baggage_metadata.k1"] == \
        "p1;p2=pv"
    assert a["messaging.solace.message.baggage.k2"] == "v2"
    assert a["messaging.solace.user_properties.s"] == "x"
    assert a["messaging.solace.user_properties.b"] is True
    assert a["messaging.solace.user_properties.i"] == 7
    assert a["messaging.solace.user_properties.n"] is None
    assert a["messaging.solace.user_properties.c"] == "A"
    evs = json.loads(r["events"])
    assert evs[0]["name"] == "q1 enqueue"
    assert evs[0]["attributes"][
        "messaging.solace.destination.type"] == "queue"
    assert evs[0]["attributes"][
        "messaging.solace.partition_number"] == 3
    assert evs[1]["name"] == "te1 enqueue"
    assert evs[1]["attributes"][
        "messaging.solace.enqueue_error_message"] == "full"
    assert evs[1]["attributes"][
        "messaging.solace.ttl_override"] == 60
    # xid: %08x of int32 -1, then hex branch/global
    assert evs[2]["name"] == "commit"
    assert evs[2]["attributes"][
        "messaging.solace.transaction_xid"] == \
        "ffffffff-000814fe-803842"
    assert evs[2]["attributes"][
        "messaging.solace.transaction_initiator"] == "client"


def test_receive_defaults_and_errors():
    rows, _ = decode_solace_message(RECEIVE_TOPIC, json.dumps({
        "errorDescription": "boom", "parentSpanId": b64(b"\x01")}))
    r = rows[0]
    assert r["span_name"] == "(unknown) receive"
    assert r["status_code"] == 2
    assert r["status_message"] == "boom"
    assert r["parent_span_id"] == ""  # not exactly 8 bytes
    a = json.loads(r["attributes"])
    assert a["messaging.solace.delivery_mode"] == "direct"
    assert "server.address" not in a
    # malformed baggage → whole baggage skipped
    rows, _ = decode_solace_message(RECEIVE_TOPIC, json.dumps(
        {"baggage": "novalue"}))
    a = json.loads(rows[0]["attributes"])
    assert not any("baggage" in k for k in a)


def test_egress_send_delete_and_drop():
    sd = {
        "routerName": "r", "solosVersion": "10",
        "egressSpans": [
            {"traceId": b64(bytes([1] * 16)),
             "spanId": b64(bytes([2] * 8)),
             "startTimeUnixNano": 1, "endTimeUnixNano": 2,
             "sendSpan": {"queueName": "#P2P/QTMP/x",
                          "protocol": "AMQP",
                          "consumerClientUsername": "u",
                          "consumerClientName": "c",
                          "replayedMsg": True,
                          "outcome": "REJECTED"}},
            {"traceId": b64(bytes([3] * 16)),
             "spanId": b64(bytes([4] * 8)),
             "errorDescription": "",
             "deleteSpan": {
                 "topicEndpointName": "0123456789abcdef" * 2,
                 "adminActionInfo": {
                     "username": "admin",
                     "sempSessionInfo": {
                         "sempVersion": 2,
                         "peerIp": b64(bytes([10, 1, 1, 1]))}}}},
            {"traceId": b64(bytes([5] * 16)),
             "spanId": b64(bytes([6] * 8))},  # no type → dropped
        ],
    }
    rows, err = decode_solace_message(EGRESS_TOPIC, json.dumps(sd))
    assert err == "" and len(rows) == 2
    send, delete = rows
    assert send["span_name"] == "(anonymous) send"
    assert send["span_kind"] == 4
    a = json.loads(send["attributes"])
    assert a["messaging.source.kind"] == "queue"
    assert a["messaging.solace.send.outcome"] == "rejected"
    assert a["messaging.solace.message_replayed"] is True
    # egress errorDescription is a *string: PRESENT-but-empty → Error
    assert delete["status_code"] == 2
    assert delete["span_name"] == "(anonymous) delete"
    assert delete["span_kind"] == 1
    a = json.loads(delete["attributes"])
    assert a["messaging.solace.operation.reason"] == "admin_action"
    assert a["enduser.id"] == "admin"
    assert a["messaging.solace.admin.interface"] == "semp"
    assert a["client.address"] == "10.1.1.1"


def test_move_span():
    sd = {
        "routerName": "r", "solosVersion": "10",
        "traceId": b64(bytes([7] * 16)),
        "spanId": b64(bytes([8] * 8)),
        "startTimeUnixNano": 5, "endTimeUnixNano": 6,
        "sourceQueueName": "srcq",
        "destinationTopicEndpointName": "dte",
        "maxRedeliveriesInfo": {},
        "sourcePartitionNumber": 2,
    }
    rows, err = decode_solace_message(MOVE_TOPIC, json.dumps(sd))
    assert err == "" and len(rows) == 1
    r = rows[0]
    assert r["span_name"] == "srcq move"
    assert r["span_kind"] == 1
    a = json.loads(r["attributes"])
    assert a["messaging.source.name"] == "srcq"
    assert a["messaging.solace.source.kind"] == "queue"
    assert a["messaging.destination.name"] == "dte"
    assert a["messaging.solace.destination.type"] == "topic-endpoint"
    assert a["messaging.solace.operation.reason"] == \
        "max_redeliveries_exceeded"
    assert a["messaging.solace.source.partition_number"] == 2


def test_baggage_parser():
    assert parse_baggage("a=1,b=2;x") == {
        "messaging.solace.message.baggage.a": "1",
        "messaging.solace.message.baggage.b": "2",
        "messaging.solace.message.baggage_metadata.b": "x"}
    for bad in ("", "noeq", "=v", "k=v;;"):
        try:
            parse_baggage(bad)
            raise AssertionError(bad)
        except ValueError:
            pass
