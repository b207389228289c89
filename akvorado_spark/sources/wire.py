"""Binary wire-format parsers for flow datagrams (SURVEY §2.1 S5/S6/S8).

Pure-Python decoders for the three datagram families the reference
understands (reference: outlet/flow/decoder/netflow/decode.go,
outlet/flow/decoder/sflow/decode.go), written from the public wire
specs — NetFlow v5 (Cisco), NetFlow v9 (RFC 3954), IPFIX (RFC 7011),
sFlow v5 (sflow.org/sflow_version_5.txt):

- ``parse_netflow(payload, exporter, ts, cache)`` — dispatches on the
  2-byte version field (5 / 9 / 10) and returns a list of wire rows.
  v9/IPFIX template state lives in a :class:`TemplateCache` keyed by
  (exporter, observation domain, template id), matching the
  reference's per-exporter template store
  (outlet/flow/decoder/netflow/templates.go).
- ``parse_sflow(payload, exporter, ts)`` — flow samples + expanded
  flow samples; raw-packet-header records are parsed down to
  Ethernet → (VLAN) → IPv4/IPv6 → TCP/UDP ports, and the extended
  switch / router / gateway records contribute VLANs, masks,
  next-hop, AS path and communities (reference sflow decode at
  outlet/flow/decoder/sflow/decode.go:146-227).

Spark integration: :func:`netflow_batch_parser` /
:func:`sflow_batch_parser` produce ``parse_batch`` callables for
``decode.decode_binary`` (mapInPandas over RawFlow batches).  The
template cache is held in the parser closure — per-task state, so
partition the raw stream by exporter (Kafka keys datagrams by
exporter in the reference) and templates decoded earlier in a batch
serve data records later in it.  For cross-batch template survival in
Structured Streaming, hand the same cache object to a
``foreachBatch`` driver-side decode, or key an
``applyInPandasWithState`` run by ``source_address``.

Scale: decoding is embarrassingly parallel per datagram; everything
here is bytes→rows with no shuffle.  At 100 TB this is the one hot
Python path of the ingest job; the batch parsers amortize through
Arrow and the per-record loops touch only the few dozen bytes of
each record.  (The reference's Go decoder has the same slow-path
shape: a per-record imperative parse, outlet/flow/decoder/netflow/
decode.go:123-200.)
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from pyspark.sql import types as T

_V4MAP = b"\x00" * 10 + b"\xff\xff"
ETYPE_IPV4 = 0x0800
ETYPE_IPV6 = 0x86DD

# Decoder output: the reference's FlowMessage fixed fields
# (common/schema/message.go:14-44).  InIf/OutIf are ifindexes; the
# metadata join (J6) turns them into names downstream.
WIRE_SCHEMA = T.StructType(
    [
        T.StructField("TimeReceived", T.LongType()),       # epoch seconds
        T.StructField("ExporterAddress", T.BinaryType()),  # 16 bytes
        T.StructField("SamplingRate", T.LongType()),
        T.StructField("InIf", T.LongType()),
        T.StructField("OutIf", T.LongType()),
        T.StructField("SrcAddr", T.BinaryType()),
        T.StructField("DstAddr", T.BinaryType()),
        T.StructField("NextHop", T.BinaryType()),
        T.StructField("EType", T.IntegerType()),
        T.StructField("Proto", T.IntegerType()),
        T.StructField("SrcPort", T.IntegerType()),
        T.StructField("DstPort", T.IntegerType()),
        T.StructField("SrcAS", T.LongType()),
        T.StructField("DstAS", T.LongType()),
        T.StructField("SrcNetMask", T.IntegerType()),
        T.StructField("DstNetMask", T.IntegerType()),
        T.StructField("SrcVlan", T.IntegerType()),
        T.StructField("DstVlan", T.IntegerType()),
        T.StructField("TCPFlags", T.IntegerType()),
        T.StructField("ForwardingStatus", T.IntegerType()),
        T.StructField("FlowDirection", T.IntegerType()),
        T.StructField("Bytes", T.LongType()),
        T.StructField("Packets", T.LongType()),
        T.StructField("DstASPath", T.ArrayType(T.LongType())),
        T.StructField("DstCommunities", T.ArrayType(T.LongType())),
        # optional registry columns (decode.go:296-381): NAT, L2, misc
        # L3/L4, ICMP, MPLS, VRF — carried when the datagram has them
        T.StructField("SrcAddrNAT", T.BinaryType()),
        T.StructField("DstAddrNAT", T.BinaryType()),
        T.StructField("SrcPortNAT", T.IntegerType()),
        T.StructField("DstPortNAT", T.IntegerType()),
        T.StructField("SrcMAC", T.LongType()),
        T.StructField("DstMAC", T.LongType()),
        T.StructField("IPTTL", T.IntegerType()),
        T.StructField("IPTos", T.IntegerType()),
        T.StructField("IPv6FlowLabel", T.LongType()),
        T.StructField("IPFragmentID", T.LongType()),
        T.StructField("IPFragmentOffset", T.IntegerType()),
        T.StructField("ICMPv4Type", T.IntegerType()),
        T.StructField("ICMPv4Code", T.IntegerType()),
        T.StructField("ICMPv6Type", T.IntegerType()),
        T.StructField("ICMPv6Code", T.IntegerType()),
        T.StructField("MPLSLabels", T.ArrayType(T.LongType())),
        T.StructField("IngressVRFID", T.LongType()),
        T.StructField("EgressVRFID", T.LongType()),
    ]
)

_WIRE_NAMES = [f.name for f in WIRE_SCHEMA.fields]


def ip16(raw: bytes) -> bytes:
    """Canonical 16-byte address; IPv4 stored as ::ffff:v4 (reference
    stores every address as IPv6, common/schema/definition.go IPv6
    columns)."""
    return _V4MAP + raw if len(raw) == 4 else raw


# Canonical timestamp-source names (pb.RawFlow.TimestampSource,
# common/pb/rawflow.proto:22-26).  The transport codec emits the
# proto-style dashed names; the parsers historically took
# "first_switched" — accept both spellings.
_TS_CANON = {
    "input": "input",
    "netflow-packet": "packet",
    "netflow_packet": "packet",
    "packet": "packet",
    "netflow-first-switched": "first_switched",
    "netflow_first_switched": "first_switched",
    "first_switched": "first_switched",
}


def _row(ts: int, exporter: bytes, rate: int) -> dict:
    r = dict.fromkeys(_WIRE_NAMES)
    r["TimeReceived"] = ts
    r["ExporterAddress"] = ip16(exporter)
    r["SamplingRate"] = rate
    r["Bytes"] = 0
    r["Packets"] = 0
    return r


# --------------------------------------------------------------------------
# NetFlow v5 — fixed 48-byte records (Cisco public format)
# --------------------------------------------------------------------------

_V5_HEADER = struct.Struct(">HHIIIIBBH")
_V5_RECORD = struct.Struct(">4s4s4sHHIIIIHHBBBBHHBBH")


def parse_netflow_v5(payload: bytes, exporter: bytes, ts: int,
                     ts_source: str = "input") -> list[dict]:
    ver, count, sysuptime_ms, unix_secs, _ns, _seq, _et, _eid, sampling = _V5_HEADER.unpack_from(payload, 0)
    if ver != 5:
        raise ValueError(f"not a NetFlow v5 packet (version={ver})")
    # low 14 bits = interval, top 2 bits = mode (0: none)
    rate = sampling & 0x3FFF or 1
    ts_source = _TS_CANON.get(ts_source, "input")
    # TS_NETFLOW_PACKET and TS_NETFLOW_FIRST_SWITCHED both rebase onto
    # the datagram header's own clock (root.go:133-136: ts = UnixSecs)
    base = unix_secs if ts_source in ("packet", "first_switched") else (ts or unix_secs)
    rows = []
    off = _V5_HEADER.size
    for _ in range(count):
        (src, dst, nh, inif, outif, pkts, octets, first, _last, sp, dp,
         _pad, flags, proto, tos, sas, das, smask, dmask, _pad2) = _V5_RECORD.unpack_from(payload, off)
        off += _V5_RECORD.size
        t = base
        if ts_source == "first_switched":
            # decode.go:60-62, ms deltas converted to seconds
            t = base + (first - sysuptime_ms) // 1000
        r = _row(t, exporter, rate)
        r.update(
            SrcAddr=ip16(src), DstAddr=ip16(dst), NextHop=ip16(nh),
            InIf=inif, OutIf=outif, Packets=pkts, Bytes=octets,
            SrcPort=sp, DstPort=dp, TCPFlags=flags, Proto=proto,
            SrcAS=sas, DstAS=das, SrcNetMask=smask, DstNetMask=dmask,
            EType=ETYPE_IPV4, IPTos=tos,
        )
        rows.append(r)
    return rows


# --------------------------------------------------------------------------
# NetFlow v9 (RFC 3954) / IPFIX (RFC 7011) — templated records
# --------------------------------------------------------------------------

# IANA IPFIX information elements → (wire column, decode kind).
# kinds: u = unsigned int (1/2/4/8 bytes), ip = address bytes.
_IE_MAP = {
    1: ("Bytes", "u"),            # octetDeltaCount
    2: ("Packets", "u"),          # packetDeltaCount
    4: ("Proto", "u"),            # protocolIdentifier
    6: ("TCPFlags", "u"),         # tcpControlBits
    7: ("SrcPort", "u"),          # sourceTransportPort
    8: ("SrcAddr", "ip"),         # sourceIPv4Address
    9: ("SrcNetMask", "u"),       # sourceIPv4PrefixLength
    10: ("InIf", "u"),            # ingressInterface
    11: ("DstPort", "u"),         # destinationTransportPort
    12: ("DstAddr", "ip"),        # destinationIPv4Address
    13: ("DstNetMask", "u"),      # destinationIPv4PrefixLength
    14: ("OutIf", "u"),           # egressInterface
    15: ("NextHop", "ip"),        # ipNextHopIPv4Address
    16: ("SrcAS", "u"),           # bgpSourceAsNumber
    17: ("DstAS", "u"),           # bgpDestinationAsNumber
    18: ("NextHop", "ip"),        # bgpNextHopIPv4Address
    23: ("Bytes", "u"),           # postOctetDeltaCount
    24: ("Packets", "u"),         # postPacketDeltaCount
    231: ("Bytes", "u"),          # initiatorOctets
    232: ("Bytes", "u"),          # responderOctets
    27: ("SrcAddr", "ip"),        # sourceIPv6Address
    28: ("DstAddr", "ip"),        # destinationIPv6Address
    29: ("SrcNetMask", "u"),      # sourceIPv6PrefixLength
    30: ("DstNetMask", "u"),      # destinationIPv6PrefixLength
    61: ("FlowDirection", "u"),   # flowDirection
    62: ("NextHop", "ip"),        # ipNextHopIPv6Address
    63: ("NextHop", "ip"),        # bgpNextHopIPv6Address
    89: ("ForwardingStatus", "u"),
    34: ("SamplingRate", "u"),    # samplingInterval (v9)
    50: ("SamplingRate", "u"),    # samplerRandomInterval
    # NAT (decode.go:296-306)
    225: ("SrcAddrNAT", "ip"),    # postNATSourceIPv4Address
    226: ("DstAddrNAT", "ip"),    # postNATDestinationIPv4Address
    227: ("SrcPortNAT", "u"),     # postNAPTSourceTransportPort
    228: ("DstPortNAT", "u"),     # postNAPTDestinationTransportPort
    # L2 (decode.go:310-325): source/post-source MAC land on SrcMAC,
    # destination/post-destination on DstMAC
    56: ("SrcMAC", "u"),          # sourceMacAddress
    81: ("SrcMAC", "u"),          # postSourceMacAddress
    80: ("DstMAC", "u"),          # destinationMacAddress
    57: ("DstMAC", "u"),          # postDestinationMacAddress
    # misc L3/L4 (decode.go:328-341)
    5: ("IPTos", "u"),            # ipClassOfService
    192: ("IPTTL", "u"),          # ipTTL
    52: ("IPTTL", "u"),           # minimumTTL
    31: ("IPv6FlowLabel", "u"),   # flowLabelIPv6
    54: ("IPFragmentID", "u"),    # fragmentIdentification
    88: ("IPFragmentOffset", "u"),
    # VRF (decode.go:263-267)
    234: ("IngressVRFID", "u"),
    235: ("EgressVRFID", "u"),
}

_SAMPLING_IES = (34, 50)
# samplingPacketInterval/-Space combine into one rate (decode.go:91-99)
_PKT_INTERVAL_IE, _PKT_SPACE_IE = 305, 306
_SAMPLER_ID_IES = (48, 302)       # FLOW_SAMPLER_ID (v9) / selectorId (IPFIX)
# vlanId/dot1qVlanId + ingress/egressPhysicalInterface fill their
# column only when it is still unset (decode.go:239-247, 310-319)
_FILL_IF_UNSET = {
    58: "SrcVlan", 243: "SrcVlan", 59: "DstVlan", 254: "DstVlan",
    252: "InIf", 253: "OutIf",
}
_MPLS_IES = frozenset(range(70, 80))  # mplsTopLabelStackSection..10
_ICMP_BOTH = {32: 4, 139: 6}          # icmpTypeCode (type<<8 | code)
_ICMP_TYPE = (176, 178)               # icmpTypeIPv4 / icmpTypeIPv6
_ICMP_CODE = (177, 179)
_ADDR_IES = (8, 12, 27, 28)           # all-zero guard (decode.go:190-209)
# template-field flag encodings (negative/offset IEs in TemplateCache):
_SCOPE_BASE = -0x10000                # scope field: stored as ie + _SCOPE_BASE
_REVERSE_BASE = 0x20000               # RFC 5103 PEN 29305: ie + _REVERSE_BASE
_REVERSE_PEN = 29305
_JUNIPER_BASE = 0x40000               # Juniper PEN 2636: ie + _JUNIPER_BASE
_JUNIPER_PEN = 2636


@dataclass
class TemplateCache:
    """Per-(exporter, observation domain) template + sampling state.

    The reference persists this across restarts
    (outlet/flow/decoder/netflow/persist.go); here it is a plain dict
    so callers may pickle it between micro-batches."""

    templates: dict = field(default_factory=dict)  # (exp, dom, tid) -> [(ie, len)]
    sampling: dict = field(default_factory=dict)   # (exp, dom) -> rate
    missing: int = 0  # data flowsets dropped for want of a template


# Bump whenever the encoding below changes (persist.go:23
# currentStateVersionNumber): a restore from another version starts
# empty rather than misreading state.  v2: scope/reverse field flags
# in template IEs, per-sampler-id sampling keys.
TEMPLATE_STATE_VERSION = 2


class TemplateStateError(ValueError):
    """Unreadable or version-mismatched template state file
    (persist.go:19 ErrStateVersion + the decode-failure path)."""


def save_template_cache(cache: TemplateCache, path: str) -> None:
    """Write the template + sampling state as versioned JSON, via a
    same-directory temp file and atomic rename so a crash mid-write
    never leaves a truncated state (persist.go:26-42, which uses
    renameio for the same guarantee)."""
    import json
    import os
    import tempfile

    doc = {
        "version": TEMPLATE_STATE_VERSION,
        "templates": [
            [exp.hex(), dom, tid, [[ie, ln] for ie, ln in fields]]
            for (exp, dom, tid), fields in cache.templates.items()
        ],
        "sampling": [
            [key[0].hex(), *key[1:], rate] for key, rate in cache.sampling.items()
        ],
    }
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)))
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, path)
    except BaseException:
        os.unlink(tmp)
        raise


def load_template_cache(path: str) -> TemplateCache:
    """Read back a saved state; raises :class:`TemplateStateError` on
    corruption or version mismatch (persist.go:44-70)."""
    import json

    with open(path) as f:
        try:
            doc = json.load(f)
        except ValueError as e:
            raise TemplateStateError(f"corrupt template state: {e}") from e
    if not isinstance(doc, dict) or doc.get("version") != TEMPLATE_STATE_VERSION:
        raise TemplateStateError(
            f"template state version mismatch: {doc.get('version') if isinstance(doc, dict) else doc!r}"
        )
    cache = TemplateCache()
    for exp_hex, dom, tid, fields in doc["templates"]:
        cache.templates[(bytes.fromhex(exp_hex), dom, tid)] = [
            (ie, ln) for ie, ln in fields
        ]
    for exp_hex, *rest in doc["sampling"]:
        # [exp, dom, rate] or [exp, dom, sampler_id, rate]
        cache.sampling[(bytes.fromhex(exp_hex), *rest[:-1])] = rest[-1]
    return cache


def restore_template_cache(path: str) -> TemplateCache:
    """The component-start behavior (outlet/flow/root.go wraps
    RestoreState): a missing, corrupt, or version-mismatched file
    yields an EMPTY cache — the decoder re-learns templates from the
    stream — instead of failing startup."""
    try:
        return load_template_cache(path)
    except (OSError, TemplateStateError, KeyError, TypeError):
        return TemplateCache()


def _u(data: bytes) -> int:
    return int.from_bytes(data, "big")


def _parse_v9_templates(payload: bytes, off: int, end: int, key, cache: TemplateCache) -> None:
    while off + 4 <= end:
        tid, nfields = struct.unpack_from(">HH", payload, off)
        off += 4
        fields = []
        for _ in range(nfields):
            ie, ln = struct.unpack_from(">HH", payload, off)
            off += 4
            fields.append((ie & 0x7FFF, ln))
        cache.templates[(*key, tid)] = fields


def _parse_v9_options_template(payload: bytes, off: int, end: int, key, cache: TemplateCache) -> None:
    # RFC 3954 §6.1: scope and option lengths are in BYTES.
    tid, scope_bytes, option_bytes = struct.unpack_from(">HHH", payload, off)
    off += 6
    fields = []
    for _ in range(scope_bytes // 4):
        ie, ln = struct.unpack_from(">HH", payload, off)
        off += 4
        fields.append((_SCOPE_BASE + (ie & 0x7FFF), ln))
    for _ in range(option_bytes // 4):
        ie, ln = struct.unpack_from(">HH", payload, off)
        off += 4
        fields.append((ie & 0x7FFF, ln))
    cache.templates[(*key, tid)] = fields


def _parse_ipfix_templates(payload: bytes, off: int, end: int, key, cache: TemplateCache,
                           options: bool) -> None:
    while off + 4 <= end:
        if options:
            tid, nfields, nscope = struct.unpack_from(">HHH", payload, off)
            off += 6
        else:
            tid, nfields = struct.unpack_from(">HH", payload, off)
            off += 4
            nscope = 0
        if tid == 0:  # padding
            break
        fields = []
        for i in range(nfields):
            ie, ln = struct.unpack_from(">HH", payload, off)
            off += 4
            if ie & 0x8000:  # enterprise bit → 4-byte PEN follows (RFC 7011 §3.2)
                pen = struct.unpack_from(">I", payload, off)[0]
                off += 4
                if pen == _REVERSE_PEN:
                    # RFC 5103 biflow: the reverse-direction twin of
                    # the base IE (decoder helpers_test.go RFC5103)
                    ie = _REVERSE_BASE + (ie & 0x7FFF)
                elif pen == _JUNIPER_PEN:
                    ie = _JUNIPER_BASE + (ie & 0x7FFF)
                else:
                    ie = -2  # unknown enterprise IE: skip its bytes
            else:
                ie &= 0x7FFF
            fields.append((_SCOPE_BASE + ie if i < nscope else ie, ln))
        cache.templates[(*key, tid)] = fields


def _decode_data_records(payload: bytes, off: int, end: int, fields, ts: int,
                         exporter: bytes, rate: int, key, cache: TemplateCache,
                         sysuptime_ms: int = 0,
                         ts_source: str = "input",
                         decapsulate: bool = False) -> list[dict]:
    # Records shorter than the residual padding (< 4 bytes total) are
    # ambiguous on the wire — RFC 3954 padding cannot be told apart
    # from data.  Real templates are always wider; we stop when fewer
    # than one full record remains.
    rec_len = sum(ln for _, ln in fields if ln != 0xFFFF)
    fixed_only = all(ln != 0xFFFF for _, ln in fields)
    # smallest possible record: fixed widths + 1 length byte per
    # variable-length field; RFC 7011 set padding is shorter than this
    # (floor of 4 guards the all-varlen case against 0x00 pad bytes)
    min_rec = max(rec_len + sum(1 for _, ln in fields if ln == 0xFFFF), 4)
    # a template whose records consume ZERO bytes (no fields, or all
    # fields zero-length and fixed) would never advance `off` — an
    # attacker-controlled datagram must not wedge the decode task in an
    # unbounded loop (ValueError keeps the strict/drop-malformed
    # contract)
    if fixed_only and rec_len == 0:
        raise ValueError("data template with zero-byte records")
    rows = []
    while off < end:
        if off + min_rec > end:
            break  # padding
        r = _row(ts, exporter, rate)
        rr: dict = {}  # RFC 5103 reverse-direction overrides
        v6 = False
        v4 = False
        sampling_seen = None
        sid_seen = None
        pkt_interval = pkt_space = 0
        icmp_type = icmp_code = 0
        icmp_found = False
        frame_seen = decap_ok = False
        for ie, ln in fields:
            if ln == 0xFFFF:  # variable length (RFC 7011 §7)
                ln = payload[off]
                off += 1
                if ln == 255:
                    ln = _u(payload[off:off + 2])
                    off += 2
            data = payload[off:off + ln]
            off += ln
            target = r
            if ie < 0:  # scope field (options templates)
                sie = ie - _SCOPE_BASE
                if sie in _SAMPLER_ID_IES:
                    sid_seen = _u(data)
                continue
            if ie >= _JUNIPER_BASE:
                # Juniper commonPropertiesId (decode.go:145-162): a
                # forwardingExceptionCode property (type 2) reports
                # whether the platform dropped the packet
                if ie - _JUNIPER_BASE == 137 and len(data) == 2 \
                        and (data[0] & 0xFC) >> 2 == 0x02:
                    code = _u(data) & 0x03FF
                    r["ForwardingStatus"] = 64 if code == 0 else 128
                continue
            if ie >= _REVERSE_BASE:  # RFC 5103 reverse twin
                ie -= _REVERSE_BASE
                target = rr
            if ie in _ADDR_IES and not any(data):
                continue  # all-zero address: leave unset (decode.go:190-209)
            m = _IE_MAP.get(ie)
            if m is not None:
                col, kind = m
                if kind == "ip":
                    if col in ("SrcAddr", "DstAddr") and target is r:
                        if len(data) == 16:
                            v6 = True
                        else:
                            v4 = True
                    target[col] = ip16(data)
                else:
                    val = _u(data)
                    if ie in _SAMPLING_IES:
                        sampling_seen = val
                        if val:
                            target[col] = val
                    else:
                        target[col] = val
                continue
            # unmapped specials
            if ie in _FILL_IF_UNSET:
                col = _FILL_IF_UNSET[ie]
                if not target.get(col):
                    target[col] = _u(data)
            elif ie in _SAMPLER_ID_IES:
                sid_seen = _u(data)
            elif ie == _PKT_INTERVAL_IE:
                pkt_interval = _u(data)
            elif ie == _PKT_SPACE_IE:
                pkt_space = _u(data)
            elif ie == 315:
                # RFC 7133 dataLinkFrameSection: a raw Ethernet frame
                # inside the record, optionally decapsulated
                # (decode.go:249-255 → decoder.ParseEthernet)
                frame_seen = True
                l3 = _ph_eth(bytes(data), r, decapsulate)
                if l3 > 0:
                    r["Bytes"] = l3
                    r["Packets"] = 1
                    decap_ok = True
            elif ie in _MPLS_IES:
                label = _u(data) >> 4
                if label:
                    if target.get("MPLSLabels") is None:
                        target["MPLSLabels"] = []
                    target["MPLSLabels"].append(label)
            elif ie in _ICMP_BOTH:
                tc = _u(data)
                icmp_type, icmp_code, icmp_found = tc >> 8, tc & 0xFF, True
            elif ie in _ICMP_TYPE:
                icmp_type, icmp_found = _u(data), True
            elif ie in _ICMP_CODE:
                icmp_code, icmp_found = _u(data), True
            elif ts_source == "first_switched":
                # decode.go:281-292 TS_NETFLOW_FIRST_SWITCHED; the
                # sysuptime/first deltas are milliseconds, converted to
                # seconds here (the reference subtracts raw ms from an
                # epoch-seconds clock — we keep the units coherent)
                if ie == 22:  # FIRST_SWITCHED (v9, ms of sysuptime)
                    r["TimeReceived"] = ts + (_u(data) - sysuptime_ms) // 1000
                elif ie == 150:  # flowStartSeconds
                    r["TimeReceived"] = _u(data)
                elif ie == 152:  # flowStartMilliseconds
                    r["TimeReceived"] = _u(data) // 1000
                elif ie == 154:  # flowStartMicroseconds
                    r["TimeReceived"] = _u(data) // 1_000_000
        r["EType"] = ETYPE_IPV6 if v6 and not v4 else ETYPE_IPV4
        if pkt_interval > 0:
            # 1-in-N random sampling: N = (interval + space) / interval
            sampling_seen = (pkt_interval + pkt_space) // pkt_interval
        if sampling_seen and r["SrcAddr"] is None and r["DstAddr"] is None:
            # options data record carrying the exporter's sampling rate,
            # keyed per sampler/selector id when the record scopes one
            # (decode.go:87-93 + GetSamplingRate)
            if sid_seen is not None:
                cache.sampling[(*key, sid_seen)] = sampling_seen
            else:
                cache.sampling[key] = sampling_seen
            continue
        if sampling_seen is None and sid_seen is not None:
            # data record referencing a sampler id (decode.go:186-188)
            r["SamplingRate"] = cache.sampling.get(
                (*key, sid_seen), r["SamplingRate"]
            )
        if decapsulate and frame_seen and not decap_ok:
            continue  # non-encapsulated packet under decap (decode.go:394-400)
        if r["Proto"] in (1, 58):
            # ICMP type/code columns (decode.go:360-380), with the
            # v5-era dst-port fallback heuristic
            if not icmp_found and not r.get("SrcPort"):
                dp = r.get("DstPort") or 0
                icmp_type, icmp_code = dp >> 8, dp & 0xFF
            side = "ICMPv4" if r["Proto"] == 1 else "ICMPv6"
            r[f"{side}Type"] = icmp_type
            r[f"{side}Code"] = icmp_code
        rows.append(r)
        if rr:
            if rr.get("Packets") == 0:
                continue  # empty reverse flow (decode.go:176-182)
            rev = dict(r)
            for a, b in (
                ("SrcAddr", "DstAddr"), ("SrcPort", "DstPort"),
                ("SrcAS", "DstAS"), ("SrcNetMask", "DstNetMask"),
                ("SrcVlan", "DstVlan"), ("SrcMAC", "DstMAC"),
                ("InIf", "OutIf"), ("SrcAddrNAT", "DstAddrNAT"),
                ("SrcPortNAT", "DstPortNAT"),
            ):
                rev[a], rev[b] = rev[b], rev[a]
            rev.update(rr)
            rows.append(rev)
    return rows


def parse_netflow_templated(payload: bytes, exporter: bytes, ts: int,
                            cache: TemplateCache,
                            ts_source: str = "input",
                            decapsulate: bool = False) -> list[dict]:
    """NetFlow v9 / IPFIX datagram → wire rows (template-stateful).

    ``ts_source``: "input" stamps every flow with the datagram time;
    "first_switched" uses the flow's own start time (NFv9
    FIRST_SWITCHED against the header sysuptime, IPFIX
    flowStartSeconds/Milliseconds/Microseconds — decode.go:281-292,
    root_test.go TestDecodeTimestampFromFirstSwitched)."""
    version = _u(payload[0:2])
    sysuptime_ms = 0
    if version == 9:
        _v, count, sysuptime_ms, unix_secs, _seq, domain = struct.unpack_from(">HHIIII", payload, 0)
        off, total = 20, len(payload)
        tset, oset = 0, 1
    elif version == 10:
        _v, total, export_time, _seq, domain = struct.unpack_from(">HHIII", payload, 0)
        if total > len(payload):
            # the message length is attacker-controlled input; trusting
            # it would walk sets past the buffer (RFC 7011 §3.1: it must
            # equal the datagram length)
            raise ValueError(
                f"IPFIX length {total} exceeds datagram size {len(payload)}"
            )
        unix_secs = export_time
        off = 16
        tset, oset = 2, 3
    else:
        raise ValueError(f"unsupported NetFlow version {version}")
    ts_source = _TS_CANON.get(ts_source, "input")
    # TS_NETFLOW_PACKET uses the datagram header's export clock; for v9
    # TS_NETFLOW_FIRST_SWITCHED also rebases ts/sysuptime onto the
    # header (root.go:152-155); IPFIX has no sysuptime so only PACKET
    # overrides there (root.go:171-173) — flowStart* IEs are absolute.
    if ts_source == "packet" or (ts_source == "first_switched" and version == 9):
        ts = unix_secs
    else:
        ts = ts or unix_secs
    key = (bytes(exporter), domain)
    rows: list[dict] = []
    # Three passes over the datagram's sets, so ordering within one
    # datagram never matters (goflow2 parses all templates up front —
    # root_test.go TestTemplatesMixedWithData — and the reference
    # applies options sampling before decoding any data,
    # decode.go:71-103): 1. templates, 2. options data (sampling),
    # 3. data records.
    data_sets: list[tuple[int, int, int]] = []
    while off + 4 <= total:
        set_id, set_len = struct.unpack_from(">HH", payload, off)
        if set_len < 4:
            break
        body, end = off + 4, off + set_len
        if set_id == tset:
            if version == 9:
                _parse_v9_templates(payload, body, end, key, cache)
            else:
                _parse_ipfix_templates(payload, body, end, key, cache, options=False)
        elif set_id == oset:
            if version == 9:
                _parse_v9_options_template(payload, body, end, key, cache)
            else:
                _parse_ipfix_templates(payload, body, end, key, cache, options=True)
        elif set_id >= 256:
            data_sets.append((set_id, body, end))
        off = end
    # options data first: a template with scope fields is an options
    # template, its records carry sampling state, not flows
    for opts in (True, False):
        for set_id, body, end in data_sets:
            fields = cache.templates.get((*key, set_id))
            if fields is None:
                if not opts:
                    cache.missing += 1
                continue
            if any(ie < -2 for ie, _ in fields) != opts:
                continue
            rate = cache.sampling.get(key, 1)
            rows.extend(
                _decode_data_records(payload, body, end, fields, ts, exporter,
                                     rate, key, cache,
                                     sysuptime_ms=sysuptime_ms,
                                     ts_source=ts_source,
                                     decapsulate=decapsulate)
            )
    return rows


def parse_netflow(payload: bytes, exporter: bytes, ts: int = 0,
                  cache: TemplateCache | None = None,
                  ts_source: str = "input",
                  decapsulate: bool = False) -> list[dict]:
    """Public entry point.  Error contract: malformed or truncated
    datagrams raise ``ValueError`` — never a bare ``struct.error`` /
    ``IndexError`` from an out-of-bounds read (fuzz-asserted)."""
    try:
        version = _u(payload[0:2])
        if version == 5:
            return parse_netflow_v5(payload, exporter, ts, ts_source=ts_source)
        return parse_netflow_templated(payload, exporter, ts,
                                       cache or TemplateCache(),
                                       ts_source=ts_source,
                                       decapsulate=decapsulate)
    except ValueError:
        raise
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated or malformed NetFlow datagram: {e}") from e


# --------------------------------------------------------------------------
# sFlow v5 (sflow.org/sflow_version_5.txt)
# --------------------------------------------------------------------------


_VXLAN_PORT = 4789


# sFlow interface-format constants + the published discard-reason →
# IPFIX ForwardingStatus mapping (sflow/decode.go:20-60; codes from
# sflow.org/sflow_drops.txt, statuses from RFC 7270 §4.12)
_SFLOW_LOCAL_IF = 0x3FFFFFFF
_SFLOW_DISCARD_STATUS = {
    0: 131, 1: 131, 2: 131, 3: 131, 4: 133, 5: 131, 6: 131, 7: 131,
    8: 132, 9: 129, 10: 129, 257: 137, 258: 130, 259: 143, 260: 139,
    261: 138, 262: 135, 263: 131, 269: 130, 302: 140,
}
_ETYPE_MPLS = 0x8847


def _mac(b: bytes) -> int:
    return int.from_bytes(b, "big")


def _ph_eth(data: bytes, r: dict, decap: bool) -> int:
    """Ethernet layer → L3 length (helpers.go ParseEthernet).  With
    ``decap`` the outer layers set no fields; the first decapsulated
    inner layer is parsed with ``decap=False`` and wins."""
    if len(data) < 14:
        return 0
    if not decap:
        r["DstMAC"] = _mac(data[0:6])
        r["SrcMAC"] = _mac(data[6:12])
    etype = _u(data[12:14])
    data = data[14:]
    vlan = 0
    while etype in (0x8100, 0x88A8):  # 802.1Q / 802.1ad outer tag
        if len(data) < 4:
            return 0
        if not decap:
            vlan = _u(data[0:2]) & 0x0FFF
        etype = _u(data[2:4])
        data = data[4:]
    if vlan and not decap:
        if not r.get("SrcVlan"):
            r["SrcVlan"] = vlan
        if not r.get("DstVlan"):
            r["DstVlan"] = vlan
    if etype == _ETYPE_MPLS:
        # label stack walk + payload heuristic (helpers.go:228-295)
        labels: list[int] = []
        while True:
            if len(data) < 5:
                return 0
            label = (_u(data[0:3])) >> 4
            bottom = data[2] & 1
            data = data[4:]
            labels.append(label)
            if not bottom:
                continue
            if label == 0:
                etype = ETYPE_IPV4
            elif label == 2:
                etype = ETYPE_IPV6
            else:
                nibble = data[0] >> 4
                if nibble == 4:
                    etype = ETYPE_IPV4
                elif nibble == 6:
                    etype = ETYPE_IPV6
                elif nibble == 0:
                    if len(data) < 4 or _u(data[0:4]) != 0:
                        return 0
                    if labels and not decap:
                        r["MPLSLabels"] = labels
                    return _ph_eth(data[4:], r, decap)
                else:
                    return 0
            break
        if labels and not decap:
            r["MPLSLabels"] = labels
    if etype == ETYPE_IPV4:
        return _ph_ip4(data, r, decap)
    if etype == ETYPE_IPV6:
        return _ph_ip6(data, r, decap)
    return 0


def _ph_ip4(data: bytes, r: dict, decap: bool) -> int:
    """IPv4 layer → L3 length = the header's total-length field
    (helpers.go ParseIPv4 — NOT the sampled frame length)."""
    if len(data) < 20:
        return 0
    l3 = _u(data[2:4])
    fragoff = _u(data[6:8]) & 0x1FFF
    proto = data[9]
    if not decap:
        r["EType"] = ETYPE_IPV4
        r["SrcAddr"] = ip16(data[12:16])
        r["DstAddr"] = ip16(data[16:20])
        r["IPTos"] = data[1]
        r["IPTTL"] = data[8]
        r["IPFragmentID"] = _u(data[4:6])
        r["IPFragmentOffset"] = fragoff
        r["Proto"] = proto
    ihl = (data[0] & 0x0F) * 4
    data = data[ihl:] if len(data) >= ihl else b""
    if fragoff == 0:
        inner = _ph_l4(data, r, decap, proto)
        if decap:
            return inner
        return l3
    return 0 if decap else l3


def _ph_ip6(data: bytes, r: dict, decap: bool) -> int:
    if len(data) < 40:
        return 0
    l3 = _u(data[4:6]) + 40
    proto = data[6]
    if not decap:
        r["EType"] = ETYPE_IPV6
        r["SrcAddr"] = data[8:24]
        r["DstAddr"] = data[24:40]
        r["Proto"] = proto
        r["IPTos"] = (_u(data[0:2]) & 0x0FF0) >> 4
        r["IPTTL"] = data[7]
        r["IPv6FlowLabel"] = _u(data[0:4]) & 0xFFFFF
    inner = _ph_l4(data[40:], r, decap, proto)
    return inner if decap else l3


def _ph_l4(data: bytes, r: dict, decap: bool, proto: int) -> int:
    """L4 / tunnel layer (helpers.go ParseL4).  The reference
    decapsulates only the configured protocol; here ``decap`` hunts
    every supported tunnel kind (VXLAN, RFC 2890 GRE, IPIP, SRv6) —
    the union of the reference's per-config behaviors."""
    if decap:
        if proto == 17 and len(data) > 16 and _u(data[2:4]) == _VXLAN_PORT:
            return _ph_eth(data[16:], r, False)
        if proto == 47 and len(data) > 4:
            flags = _u(data[0:2])
            inner = _u(data[2:4])
            if flags & 0x4FFF:
                return 0  # only RFC 2890
            skip = 4 + bin(flags).count("1") * 4
            if len(data) >= skip:
                if inner == ETYPE_IPV4:
                    return _ph_ip4(data[skip:], r, False)
                if inner == ETYPE_IPV6:
                    return _ph_ip6(data[skip:], r, False)
            return 0
        if proto == 4:
            return _ph_ip4(data, r, False)
        if proto == 41:
            return _ph_ip6(data, r, False)
        while proto == 43:  # SRv6 routing headers
            if len(data) < 8 or data[2] != 4:
                return 0
            skip = 8 + data[1] * 8
            if len(data) < skip:
                return 0
            proto = data[0]
            data = data[skip:]
            if proto == 4:
                return _ph_ip4(data, r, False)
            if proto == 41:
                return _ph_ip6(data, r, False)
        return 0
    if proto in (6, 17) and len(data) > 4:
        r["SrcPort"] = _u(data[0:2])
        r["DstPort"] = _u(data[2:4])
    if proto == 6 and len(data) > 13:
        r["TCPFlags"] = data[13]
    elif proto == 1 and len(data) > 2:
        r["ICMPv4Type"] = data[0]
        r["ICMPv4Code"] = data[1]
    elif proto == 58 and len(data) > 2:
        r["ICMPv6Type"] = data[0]
        r["ICMPv6Code"] = data[1]
    return 0


def _parse_sampled_header(data: bytes, r: dict, decap: bool = False) -> int:
    """Raw packet header record (format 1) → L3 length.  Mirrors the
    reference's header-protocol dispatch (sflow/decode.go:232-245):
    Ethernet (1), raw IPv4 (11), raw IPv6 (12)."""
    protocol, _frame_len, _stripped, hdr_len = struct.unpack_from(">IIII", data, 0)
    r["Packets"] = 1
    h = data[16:16 + hdr_len]
    if protocol == 1:
        return _ph_eth(h, r, decap)
    if protocol == 11:
        return _ph_ip4(h, r, decap)
    if protocol == 12:
        return _ph_ip6(h, r, decap)
    return 0


def _read_addr(data: bytes, off: int) -> tuple[bytes | None, int]:
    atype = _u(data[off:off + 4])
    off += 4
    if atype == 1:
        return ip16(data[off:off + 4]), off + 4
    if atype == 2:
        return data[off:off + 16], off + 16
    return None, off


def parse_sflow(payload: bytes, exporter: bytes, ts: int = 0,
                decapsulate: bool = False,
                use_source_address: bool = False) -> list[dict]:
    """Same ValueError-only error contract as :func:`parse_netflow`.

    ``use_source_address`` (pb.RawFlow field 4, applied at
    outlet/flow/decoder.go:47): the transport source address wins over
    the in-payload sFlow agent address as ExporterAddress."""
    try:
        return _parse_sflow5(payload, exporter, ts, decapsulate,
                             use_source_address)
    except ValueError:
        raise
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated or malformed sFlow datagram: {e}") from e


def _parse_sflow5(payload: bytes, exporter: bytes, ts: int,
                  decapsulate: bool,
                  use_source_address: bool = False) -> list[dict]:
    version = _u(payload[0:4])
    if version != 5:
        raise ValueError(f"unsupported sFlow version {version}")
    agent, off = _read_addr(payload, 4)
    _sub, _seq, _uptime, nsamples = struct.unpack_from(">IIII", payload, off)
    off += 16
    if not use_source_address:
        exporter = agent or exporter  # agent address identifies the exporter
    rows: list[dict] = []
    for _ in range(nsamples):
        stype, slen = struct.unpack_from(">II", payload, off)
        body, send = off + 8, off + 8 + slen
        fmt = stype & 0xFFF
        if (stype >> 12) == 0 and fmt in (1, 3):  # flow sample / expanded
            p = body
            _sseq = _u(payload[p:p + 4]); p += 4
            p += 8 if fmt == 3 else 4  # source id (type+index when expanded)
            rate = _u(payload[p:p + 4]); p += 4
            p += 8  # sample_pool, drops
            # interface formats (sflow/decode.go:66-103): only format 0
            # is an ifindex; format 1 on the output is a discard whose
            # reason maps to ForwardingStatus; format 2 means multiple
            fwd_status = 0
            if fmt == 3:
                in_fmt, in_val, out_fmt, out_val = struct.unpack_from(
                    ">IIII", payload, p)
                p += 16
            else:
                in_raw = _u(payload[p:p + 4])
                out_raw = _u(payload[p + 4:p + 8])
                p += 8
                in_fmt, in_val = in_raw >> 30, in_raw & 0x3FFFFFFF
                out_fmt, out_val = out_raw >> 30, out_raw & 0x3FFFFFFF
            inif = in_val if in_fmt == 0 else 0
            outif = out_val if out_fmt == 0 else 0
            if out_fmt == 1:
                fwd_status = _SFLOW_DISCARD_STATUS.get(out_val, 128)
            if inif == _SFLOW_LOCAL_IF:
                inif = 0
            if outif == _SFLOW_LOCAL_IF:
                outif = 0
            nrec = _u(payload[p:p + 4]); p += 4
            r = _row(ts, exporter, rate or 1)
            r.update(InIf=inif, OutIf=outif, ForwardingStatus=fwd_status)
            l3len = 0
            for _ in range(nrec):
                rfmt, rlen = struct.unpack_from(">II", payload, p)
                rdata = payload[p + 8:p + 8 + rlen]
                p += 8 + rlen
                code = rfmt & 0xFFF
                if (rfmt >> 12) != 0:
                    continue
                if code == 1:
                    l3 = _parse_sampled_header(rdata, r, decap=decapsulate)
                    if l3:
                        l3len = l3
                elif decapsulate:
                    # tunnel mode only trusts the raw header
                    # (sflow/decode.go: every other record `continue`s
                    # under needDecap)
                    continue
                elif code == 2:  # sampled ethernet (XDR-padded MACs)
                    if l3len == 0 and len(rdata) >= 4:
                        # best guess per the sFlow spec note
                        l3len = max(_u(rdata[0:4]) - 16, 0)
                    if len(rdata) >= 20:
                        r["SrcMAC"] = _mac(rdata[4:10])
                        r["DstMAC"] = _mac(rdata[12:18])
                elif code == 3 and len(rdata) >= 32:  # sampled IPv4
                    l3len = _u(rdata[0:4])
                    r.update(
                        Proto=rdata[7], SrcAddr=ip16(rdata[8:12]),
                        DstAddr=ip16(rdata[12:16]),
                        SrcPort=_u(rdata[16:20]), DstPort=_u(rdata[20:24]),
                        EType=ETYPE_IPV4, IPTos=_u(rdata[28:32]),
                    )
                elif code == 4 and len(rdata) >= 56:  # sampled IPv6
                    l3len = _u(rdata[0:4])
                    r.update(
                        Proto=rdata[7], SrcAddr=bytes(rdata[8:24]),
                        DstAddr=bytes(rdata[24:40]),
                        SrcPort=_u(rdata[40:44]), DstPort=_u(rdata[44:48]),
                        EType=ETYPE_IPV6, IPTos=_u(rdata[52:56]),
                    )
                elif code == 1001:  # extended switch
                    src_vlan, dst_vlan = _u(rdata[0:4]), _u(rdata[8:12])
                    if src_vlan < 4096:
                        r["SrcVlan"] = src_vlan
                    if dst_vlan < 4096:
                        r["DstVlan"] = dst_vlan
                elif code == 1002:  # extended router
                    nh, q = _read_addr(rdata, 0)
                    r["NextHop"] = nh
                    r["SrcNetMask"] = _u(rdata[q:q + 4])
                    r["DstNetMask"] = _u(rdata[q + 4:q + 8])
                elif code == 1003:  # extended gateway
                    nh, q = _read_addr(rdata, 0)
                    r["NextHop"] = nh
                    ras = _u(rdata[q:q + 4])
                    src_as = _u(rdata[q + 4:q + 8])
                    # AS fallbacks (sflow/decode.go:198-213): the
                    # router's AS backstops both directions
                    r["SrcAS"] = src_as or ras
                    r["DstAS"] = ras
                    q += 12  # as, src_as, src_peer_as
                    nseg = _u(rdata[q:q + 4]); q += 4
                    path: list[int] = []
                    for _ in range(nseg):
                        _segtype = _u(rdata[q:q + 4])
                        seglen = _u(rdata[q + 4:q + 8]); q += 8
                        for k in range(seglen):
                            path.append(_u(rdata[q:q + 4])); q += 4
                    ncom = _u(rdata[q:q + 4]); q += 4
                    coms = []
                    for _ in range(ncom):
                        coms.append(_u(rdata[q:q + 4])); q += 4
                    if path:
                        r["DstASPath"] = path
                        r["DstAS"] = path[-1]
                    if coms:
                        r["DstCommunities"] = coms
            if l3len:
                r["Bytes"] = l3len
                rows.append(r)
            elif not decapsulate:
                # a non-IP frame still reports (Bytes 0); in decap mode
                # a non-encapsulated sample is dropped
                rows.append(r)
        off = send
    return rows


# --------------------------------------------------------------------------
# decode_binary adapters
# --------------------------------------------------------------------------


def _batch_frame(rows: list[dict]):
    import pandas as pd

    return pd.DataFrame(rows if rows else [], columns=_WIRE_NAMES)


class DecodeErrors:
    """Per-task malformed-datagram counter (the reference increments
    a metric and drops the datagram rather than killing the worker,
    outlet/core/worker.go error path)."""

    def __init__(self):
        self.count = 0
        self.last: str | None = None

    def note(self, exc: Exception) -> None:
        self.count += 1
        self.last = f"{type(exc).__name__}: {exc}"


def _per_message(series, default, n):
    """Repeat ``default`` when a per-row option column is absent."""
    import itertools

    return itertools.repeat(default, n) if series is None else series


def _epoch(value) -> int:
    """time_received cell (pd.Timestamp | epoch int | None) → epoch s."""
    if value is None:
        return 0
    try:  # pandas Timestamp / NaT
        import pandas as pd

        if value is pd.NaT:
            return 0
        if isinstance(value, pd.Timestamp):
            return int(value.value // 1_000_000_000)
    except Exception:  # pragma: no cover - pandas always present
        pass
    return int(value)


def netflow_batch_parser(cache: TemplateCache | None = None, strict: bool = True,
                         errors: DecodeErrors | None = None,
                         ts_source: str = "input"):
    """``parse_batch`` for ``decode_binary(..., kind="netflow")``.

    One TemplateCache per task closure; pass a shared cache for
    driver-side (foreachBatch) decoding to persist templates across
    batches.  ``strict=False`` drops malformed datagrams (counted in
    ``errors``) instead of failing the task — the production-stream
    setting: one corrupt packet must not kill the micro-batch.

    Per-message options: the optional Series mirror pb.RawFlow fields
    1/6/7 (outlet/core/worker.go applies them per RawFlow, not per
    batch, via decoder.Options — outlet/flow/decoder.go:40-44); a null
    cell falls back to the factory-level default."""
    state = cache or TemplateCache()
    errs = errors or DecodeErrors()

    def parse_batch(payloads, source_addresses, times=None, ts_sources=None,
                    decaps=None):
        rows: list[dict] = []
        n = len(payloads)
        for p, a, t, tsrc, dec in zip(
            payloads, source_addresses,
            _per_message(times, None, n),
            _per_message(ts_sources, None, n),
            _per_message(decaps, None, n),
        ):
            try:
                rows.extend(parse_netflow(
                    bytes(p), bytes(a), ts=_epoch(t), cache=state,
                    ts_source=(tsrc if tsrc in _TS_CANON else ts_source),
                    decapsulate=bool(dec) and dec != "none",
                ))
            except Exception as e:  # truncated/garbage datagram
                if strict:
                    raise
                errs.note(e)
        return _batch_frame(rows)

    return parse_batch


def sflow_batch_parser(decapsulate: bool = False, strict: bool = True,
                       errors: DecodeErrors | None = None):
    errs = errors or DecodeErrors()

    def parse_batch(payloads, source_addresses, times=None, ts_sources=None,
                    decaps=None, use_src=None):
        rows: list[dict] = []
        n = len(payloads)
        for p, a, t, dec, u in zip(
            payloads, source_addresses,
            _per_message(times, None, n),
            _per_message(decaps, None, n),
            _per_message(use_src, None, n),
        ):
            try:
                rows.extend(parse_sflow(
                    bytes(p), bytes(a), ts=_epoch(t),
                    decapsulate=(bool(dec) and dec != "none") if dec is not None
                    else decapsulate,
                    use_source_address=bool(u),
                ))
            except Exception as e:
                if strict:
                    raise
                errs.note(e)
        return _batch_frame(rows)

    return parse_batch
