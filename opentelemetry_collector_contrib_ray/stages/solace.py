"""solacereceiver analog: Solace broker trace messages (receive /
egress / move v1) → flat span rows.

Parity with receiver/solacereceiver (unmarshaller.go,
unmarshaller_receive.go, unmarshaller_egress.go,
unmarshaller_move.go):

- topic multiplexing (unmarshaller.go:71-119): ``_telemetry/broker/
  trace/{receive,egress,move}/…`` with a required ``v1`` suffix;
  non-telemetry topics error errUnknownTopic, telemetry topics with
  an unknown type or version error errUpgradeRequired; an empty
  payload errors errEmptyPayload.
- shared semantics: resource = service.name/router, service.version/
  solosVersion, service.instance.id/VPN (only when present); trace id
  copies (zero-pads) to 16 bytes, span to 8, parent only when EXACTLY
  8 bytes; rgmid renders ``rmid1:aaaaa-bbbbbbbbbbb-cccccccc-dddddddd``
  for version-1 17-byte ids and plain hex otherwise
  (unmarshaller.go:192-208).
- receive spans (consumer kind, "<topic> receive" names with the
  "(unknown)" fallback): the full messaging.solace.* attribute set,
  delivery-mode names with the "Unknown Delivery Mode (…)" fallback,
  4/16-byte-only host/peer IPs, W3C baggage members as
  baggage./baggage_metadata. attrs (all-or-nothing on parse errors),
  typed user properties under messaging.solace.user_properties.
  (chars become 1-rune strings, bytes hex here), enqueue events
  ("<dest> enqueue" with queue/topic-endpoint types) and transaction
  events (commit/rollback/…, client/administrator/broker initiators,
  local-id triple or xid ``%08x-branch-global`` hex).
- egress spans (one OTel span per EgressSpan, spans with NO type
  dropped): send spans = producer kind, "<source> send" with the
  anonymous-queue (#P2P/QTMP prefix) and 32-hex anonymous
  topic-endpoint rules, outcome enum table; delete spans = internal
  kind, delete reasons incl. admin-action info (cli_terminal/
  cli_ssh/semp interfaces, enduser.id, 4/16-byte client addresses).
- move spans (internal kind, "<source> move"): source/destination
  endpoint pairs and the three move reasons.
- carrier: proto3-JSON of the model messages (base64 byte fields,
  enum names) — the real transport is AMQP-over-SMF via the external
  solace messaging library, the same transport-variant convention as
  the jaeger/sapm rows.

Execution: per-message decode in a task map, egress fan-out per
EgressSpan, block-local, zero shuffle.
"""

from __future__ import annotations

import base64
import ipaddress
import json

import pyarrow as pa

SYSTEM_ATTRS = {"messaging.system": "SolacePubSub+"}

_DELIVERY_MODES = {0: "direct", 1: "persistent", 2: "non_persistent",
                   "DIRECT": "direct", "PERSISTENT": "persistent",
                   "NON_PERSISTENT": "non_persistent"}
_TXN_TYPES = {0: "commit", 1: "rollback", 2: "end", 3: "prepare",
              4: "session_timeout", 5: "rollback_only",
              "COMMIT": "commit", "ROLLBACK": "rollback",
              "END": "end", "PREPARE": "prepare",
              "SESSION_TIMEOUT": "session_timeout",
              "ROLLBACK_ONLY": "rollback_only"}
_TXN_INITIATORS = {0: "client", 1: "administrator", 2: "broker",
                   "CLIENT": "client", "ADMIN": "administrator",
                   "BROKER": "broker"}
_SEND_OUTCOMES = {0: "accepted", 1: "rejected", 2: "released",
                  3: "delivery failed", 4: "flow unbound",
                  5: "transaction commit",
                  6: "transaction commit failed",
                  7: "transaction rollback",
                  "ACCEPTED": "accepted", "REJECTED": "rejected",
                  "RELEASED": "released",
                  "DELIVERY_FAILED": "delivery failed",
                  "FLOW_UNBOUND": "flow unbound",
                  "TRANSACTION_COMMIT": "transaction commit",
                  "TRANSACTION_COMMIT_FAILED":
                  "transaction commit failed",
                  "TRANSACTION_ROLLBACK": "transaction rollback"}


def _b(v) -> bytes:
    if v is None:
        return b""
    if isinstance(v, bytes):
        return v
    return base64.b64decode(v)


def _id_hex(v, width: int) -> str:
    """Go copy(id[:n], bytes) — zero-padded to n, then hex."""
    raw = _b(v)[:width]
    return (raw + b"\x00" * (width - len(raw))).hex()


def rgmid_to_string(rgmid: bytes) -> str:
    """unmarshaller.go:192-208."""
    if len(rgmid) != 17 or rgmid[0] != 1:
        return rgmid.hex()
    enc = rgmid[1:].hex()
    return ("rmid1:" + enc[0:5] + "-" + enc[5:16] + "-"
            + enc[16:24] + "-" + enc[24:32])


def is_anonymous_queue(name: str) -> bool:
    return name.startswith("#P2P/QTMP")


def is_anonymous_topic_endpoint(name: str) -> bool:
    return len(name) == 32 and all(
        ("0" <= c <= "9") or ("a" <= c <= "f") for c in name)


def _ip_str(raw: bytes) -> str | None:
    if len(raw) not in (4, 16):
        return None
    return str(ipaddress.ip_address(raw))


def _resource(sd: dict) -> str:
    res = {"service.name": sd.get("routerName") or "",
           "service.version": sd.get("solosVersion") or ""}
    if sd.get("messageVpnName") is not None:
        res["service.instance.id"] = sd["messageVpnName"]
    return json.dumps(res)


def parse_baggage(s: str) -> dict:
    """Minimal W3C baggage parse, all-or-nothing on malformed input
    (the otel-go baggage.Parse behavior the reference relies on)."""
    out = {}
    for member in s.split(","):
        member = member.strip()
        if not member:
            raise ValueError("empty member")
        parts = member.split(";")
        kv = parts[0].split("=", 1)
        if len(kv) != 2 or not kv[0].strip():
            raise ValueError("malformed member")
        key, value = kv[0].strip(), kv[1].strip()
        if any(c in key for c in ' "(),/:;<=>?@[\\]{}'):
            raise ValueError("invalid key")
        props = [p.strip() for p in parts[1:]]
        if any(not p for p in props):
            raise ValueError("empty property")
        out["messaging.solace.message.baggage." + key] = value
        if props:
            out["messaging.solace.message.baggage_metadata." + key] \
                = ";".join(props)
    return out


def _user_property(value: dict):
    """receive unmarshaller insertUserProperty:377-420."""
    if not isinstance(value, dict) or not value:
        return None, False
    k, v = next(iter(value.items()))
    if k == "nullValue":
        return None, True
    if k == "boolValue":
        return bool(v), True
    if k in ("doubleValue", "floatValue"):
        return float(v), True
    if k == "byteArrayValue":
        return _b(v).hex(), True  # pdata bytes; hex form here
    if k in ("int8Value", "int16Value", "int32Value", "int64Value",
             "uint8Value", "uint16Value", "uint32Value"):
        return int(v), True
    if k == "uint64Value":
        v = int(v)
        return v - (1 << 64) if v >= (1 << 63) else v, True
    if k in ("stringValue", "destinationValue"):
        return str(v), True
    if k == "characterValue":
        return chr(int(v)), True
    return None, False  # unknown type skipped


def _txn_event(ev: dict) -> dict:
    name = _TXN_TYPES.get(ev.get("type") or 0)
    if name is None:
        name = f"Unknown Transaction Event ({ev.get('type')})"
    attrs: dict = {}
    initiator = _TXN_INITIATORS.get(ev.get("initiator") or 0)
    if initiator is None:
        initiator = f"Unknown Transaction Initiator " \
                    f"({ev.get('initiator')})"
    attrs["messaging.solace.transaction_initiator"] = initiator
    if ev.get("errorDescription") is not None:
        attrs["messaging.solace.transaction_error_message"] = \
            ev["errorDescription"]
    if "localId" in ev:
        lid = ev["localId"] or {}
        attrs["messaging.solace.transaction_id"] = \
            int(lid.get("transactionId") or 0)
        attrs["messaging.solace.transacted_session_name"] = \
            lid.get("sessionName") or ""
        attrs["messaging.solace.transacted_session_id"] = \
            int(lid.get("sessionId") or 0)
    elif "xid" in ev:
        xid = ev["xid"] or {}
        fid = int(xid.get("formatId") or 0) & 0xFFFFFFFF
        attrs["messaging.solace.transaction_xid"] = (
            f"{fid:08x}-" + _b(xid.get("branchQualifier")).hex()
            + "-" + _b(xid.get("globalId")).hex())
    return {"name": name,
            "timeUnixNano": int(ev.get("timeUnixNano") or 0),
            "attributes": attrs}


def _receive_span(sd: dict) -> dict:
    topic = sd.get("topic") or ""
    attrs: dict = dict(SYSTEM_ATTRS)
    attrs["messaging.operation.name"] = "receive"
    attrs["messaging.operation.type"] = "receive"
    attrs["network.protocol.name"] = sd.get("protocol") or ""
    if sd.get("protocolVersion") is not None:
        attrs["network.protocol.version"] = sd["protocolVersion"]
    if sd.get("applicationMessageId") is not None:
        attrs["messaging.message.id"] = sd["applicationMessageId"]
    if sd.get("correlationId") is not None:
        attrs["messaging.message.conversation_id"] = \
            sd["correlationId"]
    binsz = int(sd.get("binaryAttachmentSize") or 0)
    xmlsz = int(sd.get("xmlAttachmentSize") or 0)
    metasz = int(sd.get("metadataSize") or 0)
    attrs["messaging.message.body.size"] = binsz + xmlsz
    attrs["messaging.message.envelope.size"] = binsz + xmlsz + metasz
    attrs["messaging.solace.client_username"] = \
        sd.get("clientUsername") or ""
    attrs["messaging.solace.client_name"] = sd.get("clientName") or ""
    attrs["messaging.solace.broker_receive_time_unix_nano"] = \
        int(sd.get("brokerReceiveTimeUnixNano") or 0)
    attrs["messaging.destination.name"] = topic
    dm = _DELIVERY_MODES.get(sd.get("deliveryMode") or 0)
    if dm is None:
        dm = f"Unknown Delivery Mode ({sd.get('deliveryMode')})"
    attrs["messaging.solace.delivery_mode"] = dm
    rgmid = rgmid_to_string(_b(sd.get("replicationGroupMessageId")))
    if rgmid:
        attrs["messaging.solace.replication_group_message_id"] = rgmid
    if sd.get("priority") is not None:
        attrs["messaging.solace.priority"] = int(sd["priority"])
    if sd.get("ttl") is not None:
        attrs["messaging.solace.ttl"] = int(sd["ttl"])
    if sd.get("replyToTopic") is not None:
        attrs["messaging.solace.reply_to_topic"] = sd["replyToTopic"]
    attrs["messaging.solace.dmq_eligible"] = \
        bool(sd.get("dmqEligible"))
    attrs["messaging.solace.dropped_enqueue_events_success"] = \
        int(sd.get("droppedEnqueueEventsSuccess") or 0)
    attrs["messaging.solace.dropped_enqueue_events_failed"] = \
        int(sd.get("droppedEnqueueEventsFailed") or 0)
    hip = _ip_str(_b(sd.get("hostIp")))
    if hip is not None:
        attrs["server.address"] = hip
        attrs["server.port"] = int(sd.get("hostPort") or 0)
    pip = _ip_str(_b(sd.get("peerIp")))
    if pip is not None:
        attrs["network.peer.address"] = pip
        attrs["network.peer.port"] = int(sd.get("peerPort") or 0)
    if sd.get("baggage") is not None:
        try:
            attrs.update(parse_baggage(sd["baggage"]))
        except ValueError:
            pass  # malformed baggage warned + skipped whole
    attrs["messaging.solace.dropped_application_message_properties"] \
        = bool(sd.get("droppedApplicationMessageProperties"))
    for key, value in (sd.get("userProperties") or {}).items():
        v, ok = _user_property(value)
        if ok:
            attrs["messaging.solace.user_properties." + key] = v

    events = []
    for eq in sd.get("enqueueEvents") or []:
        if "topicEndpointName" in eq:
            dest, kind = eq["topicEndpointName"], "topic-endpoint"
        elif "queueName" in eq:
            dest, kind = eq["queueName"], "queue"
        else:
            continue  # unknown destination type skipped
        eattrs: dict = {
            "messaging.solace.destination.type": kind,
            "messaging.solace.rejects_all_enqueues":
            bool(eq.get("rejectsAllEnqueues"))}
        if eq.get("errorDescription") is not None:
            eattrs["messaging.solace.enqueue_error_message"] = \
                eq["errorDescription"]
        if eq.get("partitionNumber") is not None:
            eattrs["messaging.solace.partition_number"] = \
                int(eq["partitionNumber"])
        if eq.get("ttl") is not None:
            eattrs["messaging.solace.ttl_override"] = int(eq["ttl"])
        events.append({"name": dest + " enqueue",
                       "timeUnixNano":
                       int(eq.get("timeUnixNano") or 0),
                       "attributes": eattrs})
    if sd.get("transactionEvent") is not None:
        events.append(_txn_event(sd["transactionEvent"]))

    err = sd.get("errorDescription") or ""
    return {
        "trace_id": _id_hex(sd.get("traceId"), 16),
        "span_id": _id_hex(sd.get("spanId"), 8),
        "parent_span_id": (_id_hex(sd["parentSpanId"], 8)
                           if len(_b(sd.get("parentSpanId"))) == 8
                           else ""),
        "trace_state": (sd.get("traceState")
                        if sd.get("traceState") is not None else ""),
        "span_name": (topic + " receive") if topic
        else "(unknown) receive",
        "span_kind": 5,  # consumer
        "start_time_unix_nano": int(sd.get("startTimeUnixNano") or 0),
        "end_time_unix_nano": int(sd.get("endTimeUnixNano") or 0),
        "status_code": 2 if err else 0,
        "status_message": err,
        "attributes": json.dumps(attrs),
        "resource_attributes": _resource(sd),
        "scope_name": "", "scope_version": "",
        "events": json.dumps(events), "links": "[]",
    }


def _egress_spans(sd: dict) -> list[dict]:
    res = _resource(sd)
    out = []
    for es in sd.get("egressSpans") or []:
        send, delete = es.get("sendSpan"), es.get("deleteSpan")
        if send is None and delete is None:
            continue  # no type → dropped
        attrs: dict = dict(SYSTEM_ATTRS)
        if send is not None:
            kind = 4  # producer
            attrs["messaging.operation.name"] = "send"
            attrs["messaging.operation.type"] = "publish"
            attrs["network.protocol.name"] = send.get("protocol") or ""
            if send.get("protocolVersion") is not None:
                attrs["network.protocol.version"] = \
                    send["protocolVersion"]
            if "topicEndpointName" in send:
                src = send["topicEndpointName"]
                name = ("(anonymous)"
                        if is_anonymous_topic_endpoint(src) else src)
                attrs["messaging.source.name"] = src
                attrs["messaging.source.kind"] = "topic-endpoint"
            elif "queueName" in send:
                src = send["queueName"]
                name = ("(anonymous)" if is_anonymous_queue(src)
                        else src)
                attrs["messaging.source.name"] = src
                attrs["messaging.source.kind"] = "queue"
            else:
                name = "(unknown)"
            span_name = name + " send"
            attrs["messaging.solace.client_username"] = \
                send.get("consumerClientUsername") or ""
            attrs["messaging.solace.client_name"] = \
                send.get("consumerClientName") or ""
            attrs["messaging.solace.message_replayed"] = \
                bool(send.get("replayedMsg"))
            if send.get("partitionNumber") is not None:
                attrs["messaging.solace.partition_number"] = \
                    int(send["partitionNumber"])
            attrs["messaging.solace.send.outcome"] = \
                _SEND_OUTCOMES.get(send.get("outcome") or 0, "")
        else:
            kind = 1  # internal
            attrs["messaging.operation.name"] = "delete"
            attrs["messaging.operation.type"] = "delete"
            if delete.get("partitionNumber") is not None:
                attrs["messaging.solace.partition_number"] = \
                    int(delete["partitionNumber"])
            if "topicEndpointName" in delete:
                ep = delete["topicEndpointName"]
                name = ("(anonymous)"
                        if is_anonymous_topic_endpoint(ep) else ep)
                attrs["messaging.destination.name"] = ep
                attrs["messaging.solace.destination.type"] = \
                    "topic-endpoint"
            elif "queueName" in delete:
                ep = delete["queueName"]
                name = ("(anonymous)" if is_anonymous_queue(ep)
                        else ep)
                attrs["messaging.destination.name"] = ep
                attrs["messaging.solace.destination.type"] = "queue"
            else:
                name = "(unknown)"
            span_name = name + " delete"
            reason_key = "messaging.solace.operation.reason"
            if "ttlExpiredInfo" in delete:
                attrs[reason_key] = "ttl_expired"
            elif "rejectedOutcomeInfo" in delete:
                attrs[reason_key] = "rejected_nack"
            elif "maxRedeliveriesInfo" in delete:
                attrs[reason_key] = "max_redeliveries_exceeded"
            elif "hopCountExceededInfo" in delete:
                attrs[reason_key] = "hop_count_exceeded"
            elif "ingressSelectorInfo" in delete:
                attrs[reason_key] = "ingress_selector"
            elif "adminActionInfo" in delete:
                attrs[reason_key] = "admin_action"
                aai = delete["adminActionInfo"] or {}
                attrs["enduser.id"] = aai.get("username") or ""
                if "cliSessionInfo" in aai:
                    cli = aai["cliSessionInfo"] or {}
                    if "localSession" in cli:
                        attrs["messaging.solace.admin.interface"] = \
                            "cli_terminal"
                        attrs["messaging.solace.admin.cli."
                              "terminal.name"] = \
                            (cli["localSession"]
                             or {}).get("terminalName") or ""
                    attrs["messaging.solace.admin.cli."
                          "session_number"] = \
                        int(cli.get("sessionNumber") or 0)
                    if "remoteSession" in cli:
                        attrs["messaging.solace.admin.interface"] = \
                            "cli_ssh"
                        ip = _ip_str(_b((cli["remoteSession"]
                                         or {}).get("peerIp")))
                        if ip is not None:
                            attrs["client.address"] = ip
                elif "sempSessionInfo" in aai:
                    semp = aai["sempSessionInfo"] or {}
                    attrs["messaging.solace.admin.interface"] = "semp"
                    attrs["messaging.solace.admin.semp.version"] = \
                        int(semp.get("sempVersion") or 0)
                    ip = _ip_str(_b(semp.get("peerIp")))
                    if ip is not None:
                        attrs["client.address"] = ip
        events = []
        if es.get("transactionEvent") is not None:
            events.append(_txn_event(es["transactionEvent"]))
        err = es.get("errorDescription")
        out.append({
            "trace_id": _id_hex(es.get("traceId"), 16),
            "span_id": _id_hex(es.get("spanId"), 8),
            "parent_span_id": (_id_hex(es["parentSpanId"], 8)
                               if len(_b(es.get("parentSpanId"))) == 8
                               else ""),
            "trace_state": "", "span_name": span_name,
            "span_kind": kind,
            "start_time_unix_nano":
            int(es.get("startTimeUnixNano") or 0),
            "end_time_unix_nano": int(es.get("endTimeUnixNano") or 0),
            "status_code": 2 if err is not None else 0,
            "status_message": err or "",
            "attributes": json.dumps(attrs),
            "resource_attributes": res,
            "scope_name": "", "scope_version": "",
            "events": json.dumps(events), "links": "[]",
        })
    return out


def _move_span(sd: dict) -> dict:
    attrs: dict = dict(SYSTEM_ATTRS)
    attrs["messaging.operation.name"] = "move"
    attrs["messaging.operation.type"] = "move"
    rgmid = rgmid_to_string(_b(sd.get("replicationGroupMessageId")))
    if rgmid:
        attrs["messaging.solace.replication_group_message_id"] = rgmid
    if sd.get("sourcePartitionNumber") is not None:
        attrs["messaging.solace.source.partition_number"] = \
            int(sd["sourcePartitionNumber"])
    if sd.get("destinationPartitionNumber") is not None:
        attrs["messaging.solace.destination.partition_number"] = \
            int(sd["destinationPartitionNumber"])
    if "sourceTopicEndpointName" in sd:
        src = sd["sourceTopicEndpointName"]
        name = "(anonymous)" if is_anonymous_topic_endpoint(src) \
            else src
        attrs["messaging.source.name"] = src
        attrs["messaging.solace.source.kind"] = "topic-endpoint"
    elif "sourceQueueName" in sd:
        src = sd["sourceQueueName"]
        name = "(anonymous)" if is_anonymous_queue(src) else src
        attrs["messaging.source.name"] = src
        attrs["messaging.solace.source.kind"] = "queue"
    else:
        name = "(unknown)"
    if "destinationTopicEndpointName" in sd:
        attrs["messaging.destination.name"] = \
            sd["destinationTopicEndpointName"]
        attrs["messaging.solace.destination.type"] = "topic-endpoint"
    elif "destinationQueueName" in sd:
        attrs["messaging.destination.name"] = sd["destinationQueueName"]
        attrs["messaging.solace.destination.type"] = "queue"
    reason_key = "messaging.solace.operation.reason"
    if "ttlExpiredInfo" in sd:
        attrs[reason_key] = "ttl_expired"
    elif "rejectedOutcomeInfo" in sd:
        attrs[reason_key] = "rejected_nack"
    elif "maxRedeliveriesInfo" in sd:
        attrs[reason_key] = "max_redeliveries_exceeded"
    return {
        "trace_id": _id_hex(sd.get("traceId"), 16),
        "span_id": _id_hex(sd.get("spanId"), 8),
        "parent_span_id": (_id_hex(sd["parentSpanId"], 8)
                           if len(_b(sd.get("parentSpanId"))) == 8
                           else ""),
        "trace_state": "", "span_name": name + " move",
        "span_kind": 1,  # internal
        "start_time_unix_nano": int(sd.get("startTimeUnixNano") or 0),
        "end_time_unix_nano": int(sd.get("endTimeUnixNano") or 0),
        "status_code": 0, "status_message": "",
        "attributes": json.dumps(attrs),
        "resource_attributes": _resource(sd),
        "scope_name": "", "scope_version": "",
        "events": json.dumps([]), "links": "[]",
    }


def decode_solace_message(topic: str,
                          payload: str) -> tuple[list[dict], str]:
    """One (topic, proto3-JSON payload) → (span rows, error)."""
    prefix = "_telemetry/"
    if not topic or not topic.startswith(prefix):
        return [], "unknown topic"
    rest = topic[len(prefix):]
    if not (rest.startswith("broker/trace/receive/")
            or rest.startswith("broker/trace/egress/")
            or rest.startswith("broker/trace/move/")) \
            or not topic.endswith("v1"):
        return [], "unsupported trace message, upgrade required"
    if not payload:
        return [], "no binary attachment"
    try:
        sd = json.loads(payload)
    except ValueError as e:
        return [], str(e)
    if not isinstance(sd, dict):
        return [], "malformed span data"
    if rest.startswith("broker/trace/receive/"):
        return [_receive_span(sd)], ""
    if rest.startswith("broker/trace/egress/"):
        return _egress_spans(sd), ""
    return [_move_span(sd)], ""


_COLS = ("trace_id", "span_id", "parent_span_id", "trace_state",
         "span_name", "span_kind", "start_time_unix_nano",
         "end_time_unix_nano", "status_code", "status_message",
         "attributes", "resource_attributes", "scope_name",
         "scope_version", "events", "links")


class _ParseSolace:
    def __init__(self, topic_col, payload_col, on_error):
        self.topic_col = topic_col
        self.payload_col = payload_col
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        topics = batch.column(self.topic_col).to_pylist()
        payloads = batch.column(self.payload_col).to_pylist()
        parent, cols = [], {k: [] for k in _COLS}
        for i, (topic, payload) in enumerate(zip(topics, payloads)):
            rows, err = decode_solace_message(topic or "",
                                              payload or "")
            if err and self.on_error == "raise":
                raise ValueError(err)
            for row in rows:
                parent.append(i)
                for k in _COLS:
                    cols[k].append(row[k])
        out = batch.take(pa.array(parent, pa.int64()))
        for k in _COLS:
            typ = pa.int64() if k in (
                "span_kind", "start_time_unix_nano",
                "end_time_unix_nano", "status_code") else pa.string()
            out = out.append_column(k, pa.array(cols[k], typ))
        return out


def parse_solace(ds, topic_col: str = "topic",
                 payload_col: str = "payload", *,
                 on_error: str = "drop"):
    """Solace broker trace messages → flat span rows."""
    return ds.map_batches(_ParseSolace(topic_col, payload_col,
                                       on_error),
                          batch_format="pyarrow", zero_copy_batch=True)
