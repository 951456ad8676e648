"""netflowreceiver analogs: decoded goflow2 flow messages → flat log
rows.

Parity with receiver/netflowreceiver (parser.go addMessageAttributes
+ the etype/transport/flowtype IANA name tables, producer.go
otelLogsProducerWrapper):

- one log record per flow message: Timestamp = TimeFlowStartNs,
  ObservedTimestamp = TimeReceivedNs; attributes source.address/
  source.port/destination.address/destination.port,
  network.transport/network.type via the IANA name tables
  ("unknown" fallback), and the flow.* block (io bytes/packets,
  type name, sequence_num, time_received/start/end ns,
  sampling_rate, sampler_address, tcp_flags).
- addresses are netip.AddrFromSlice of the raw bytes with the error
  IGNORED — an invalid byte length renders the zero Addr's String()
  "invalid IP" (parser.go:222-225).
- scope name = the receiver metadata scope with a
  receiver=netflow scope attribute (producer.go:44-46).
- the send_raw mode bodies are the goflow2 %+v proto-struct
  rendering of an EXTERNAL type — same scope boundary as envoyals;
  the UDP listener + goflow2 wire decode are ingest transport.

Execution: per-row decode task map over a JSON flow column
(fan-out one row per flow message), block-local, zero shuffle.
"""

from __future__ import annotations

import ipaddress
import json

import pyarrow as pa

SCOPE_NAME = ("github.com/open-telemetry/opentelemetry-collector-"
              "contrib/receiver/netflowreceiver")

ETYPE_NAMES = {0x806: "arp", 0x800: "ipv4", 0x814c: "snmp",
               0x86dd: "ipv6", 0x8847: "mpls", 0x888e: "eapol",
               0x88cc: "lldp", 0x88e5: "macsec", 0x88f5: "mvrp",
               0x88f7: "ptp", 0xa0ed: "6lowpan"}

TRANSPORT_NAMES = {
    0: "hopopt", 1: "icmp", 2: "igmp", 3: "ggp", 4: "ipv4",
    5: "st", 6: "tcp", 7: "cbt", 8: "egp", 9: "igp",
    10: "bbn-rcc-mon", 11: "nvp-ii", 12: "pup", 13: "argus",
    14: "emcon", 15: "xnet", 16: "chaos", 17: "udp", 18: "mux",
    19: "dcn-meas", 20: "hmp", 21: "prm", 22: "xns-idp",
    23: "trunk-1", 24: "trunk-2", 25: "leaf-1", 26: "leaf-2",
    27: "rdp", 28: "irtp", 29: "iso-tp4", 30: "netblt",
    31: "mfe-nsp", 32: "merit-inp", 33: "dccp", 34: "3pc",
    35: "idpr", 36: "xtp", 37: "ddp", 38: "idpr-cmtp", 39: "tp++",
    40: "il", 41: "ipv6", 42: "sdrp", 43: "ipv6-route",
    44: "ipv6-frag", 45: "idrp", 46: "rsvp", 47: "gre", 48: "dsr",
    49: "bna", 50: "esp", 51: "ah", 52: "i-nlsp", 53: "swipe",
    54: "narp", 55: "min-ipv4", 56: "tlsp", 57: "skip",
    58: "ipv6-icmp", 59: "ipv6-nonxt", 60: "ipv6-opts",
    61: "any-host-internal-protocol", 62: "cftp",
    63: "any-local-network", 64: "sat-expak", 65: "kryptolan",
    66: "rvd", 67: "ippc", 68: "any-distributed-file-system",
    69: "sat-mon", 70: "visa", 71: "ipcv", 72: "cpnx", 73: "cphb",
    74: "wsn", 75: "pvp", 76: "br-sat-mon", 77: "sun-nd",
    78: "wb-mon", 79: "wb-expak", 80: "iso-ip", 81: "vmtp",
    82: "secure-vmtp", 83: "vines", 84: "iptm", 85: "nsfnet-igp",
    86: "dgp", 87: "tcf", 88: "eigrp", 89: "ospfigp",
    90: "sprite-rpc", 91: "larp", 92: "mtp", 93: "ax.25",
    94: "ipip", 95: "micp", 96: "scc-sp", 97: "etherip",
    98: "encap", 99: "any-private-encryption-scheme", 100: "gmtp",
    101: "ifmp", 102: "pnni", 103: "pim", 104: "aris", 105: "scps",
    106: "qnx", 107: "a/n", 108: "ipcomp", 109: "snp",
    110: "compaq-peer", 111: "ipx-in-ip", 112: "vrrp", 113: "pgm",
    114: "any-0-hop-protocol", 115: "l2tp", 116: "ddx", 117: "iatp",
    118: "stp", 119: "srp", 120: "uti", 121: "smp", 122: "sm",
    123: "ptp", 124: "isis over ipv4", 125: "fire", 126: "crtp",
    127: "crudp", 128: "sscopmce", 129: "iplt", 130: "sps",
    131: "pipe", 132: "sctp", 133: "fc", 134: "rsvp-e2e-ignore",
    135: "mobility header", 136: "udplite", 137: "mpls-in-ip",
    138: "manet", 139: "hip", 140: "shim6", 141: "wesp",
    142: "rohc", 143: "ethernet", 144: "aggfrag", 145: "nsh"}

FLOW_TYPE_NAMES = {0: "unknown", 1: "sflow_5", 2: "netflow_v5",
                   3: "netflow_v9", 4: "ipfix"}


def _addr_string(b: bytes | None) -> str:
    """netip.AddrFromSlice + String(): 4/16-byte slices render the
    address; anything else leaves the zero Addr whose String() is
    "invalid IP" (the error is discarded, parser.go:222-225)."""
    if b is not None and len(b) in (4, 16):
        return str(ipaddress.ip_address(b))
    return "invalid IP"


def netflow_log_row(flow: dict) -> dict:
    """parser.go:216-258 addMessageAttributes over one decoded flow
    message (bytes fields hex-encoded in the JSON carrier)."""
    def addr(key):
        h = flow.get(key) or ""
        try:
            return _addr_string(bytes.fromhex(h))
        except ValueError:
            return "invalid IP"

    def i(key):
        return int(flow.get(key) or 0)

    attrs = {
        "source.address": addr("srcAddr"),
        "source.port": i("srcPort"),
        "destination.address": addr("dstAddr"),
        "destination.port": i("dstPort"),
        "network.transport":
            TRANSPORT_NAMES.get(i("proto"), "unknown"),
        "network.type": ETYPE_NAMES.get(i("etype"), "unknown"),
        "flow.io.bytes": i("bytes"),
        "flow.io.packets": i("packets"),
        "flow.type": FLOW_TYPE_NAMES.get(i("type"), "unknown"),
        "flow.sequence_num": i("sequenceNum"),
        "flow.time_received": i("timeReceivedNs"),
        "flow.start": i("timeFlowStartNs"),
        "flow.end": i("timeFlowEndNs"),
        "flow.sampling_rate": i("samplingRate"),
        "flow.sampler_address": addr("samplerAddress"),
        "flow.tcp_flags": i("tcpFlags"),
    }
    return {
        "time_unix_nano": i("timeFlowStartNs"),
        "observed_time_unix_nano": i("timeReceivedNs"),
        "scope_name": SCOPE_NAME,
        "attributes": json.dumps(attrs, sort_keys=True,
                                 separators=(",", ":")),
    }


class _NetflowParse:
    def __init__(self, flows_col: str):
        self.col = flows_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent, recs = [], []
        for i, js in enumerate(batch.column(self.col).to_pylist()):
            try:
                flows = json.loads(js or "[]")
            except ValueError:
                continue
            for flow in flows:
                if isinstance(flow, dict):
                    parent.append(i)
                    recs.append(netflow_log_row(flow))
        out = batch.take(pa.array(parent, pa.int64()))
        fields = (("time_unix_nano", pa.int64()),
                  ("observed_time_unix_nano", pa.int64()),
                  ("scope_name", pa.string()),
                  ("attributes", pa.string()))
        collide = [k for k, _ in fields if k in out.schema.names]
        if collide:
            out = out.drop_columns(collide)
        for k, typ in fields:
            out = out.append_column(
                k, pa.array([r[k] for r in recs], typ))
        return out


def parse_netflow(ds, *, flows_col: str = "flows"):
    """Decoded flow-message packets (JSON array column) → flat log
    rows (fan-out, one per flow message)."""
    return ds.map_batches(_NetflowParse(flows_col),
                          batch_format="pyarrow",
                          zero_copy_batch=True)
