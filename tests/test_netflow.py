"""netflowreceiver stage parity (stages/netflow.py)."""

import json

from opentelemetry_collector_contrib_ray.stages.netflow import (
    netflow_log_row)


def test_flow_row():
    r = netflow_log_row({
        "srcAddr": "0a000001", "srcPort": 80,
        "dstAddr": "20010db8000000000000000000000001",
        "dstPort": 443, "proto": 132, "etype": 0x86dd,
        "bytes": 100, "packets": 2, "type": 4,
        "sequenceNum": 7, "timeReceivedNs": 15,
        "timeFlowStartNs": 10, "timeFlowEndNs": 20,
        "samplingRate": 1, "samplerAddress": "7f000001",
        "tcpFlags": 16,
    })
    assert r["time_unix_nano"] == 10
    assert r["observed_time_unix_nano"] == 15
    a = json.loads(r["attributes"])
    assert a["source.address"] == "10.0.0.1"
    assert a["destination.address"] == "2001:db8::1"
    assert a["network.transport"] == "sctp"
    assert a["network.type"] == "ipv6"
    assert a["flow.type"] == "ipfix"
    assert a["flow.sampler_address"] == "127.0.0.1"


def test_invalid_slice_and_unknowns():
    # netip.AddrFromSlice error ignored -> zero Addr String()
    r = netflow_log_row({"srcAddr": "ffff00", "dstAddr": "",
                         "proto": 999, "etype": 5, "type": 42})
    a = json.loads(r["attributes"])
    assert a["source.address"] == "invalid IP"
    assert a["destination.address"] == "invalid IP"
    assert a["network.transport"] == "unknown"
    assert a["network.type"] == "unknown"
    assert a["flow.type"] == "unknown"
