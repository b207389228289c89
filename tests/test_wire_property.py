"""Property-based round-trips for the binary sources (hypothesis):
random records survive build→parse bit-exactly, and random MMDB trees
agree with an independent longest-prefix model.  Complements the
golden-datagram tests the way the reference's fuzz corpus complements
its pcap fixtures."""

from __future__ import annotations

import ipaddress

from hypothesis import given, settings
from hypothesis import strategies as st

from test_mmdb import MMDBWriter
from test_wire import EXP, build_v5, build_v9, v9_flowset

from akvorado_spark.sources.mmdb import MMDBReader
from akvorado_spark.sources.rawflow_pb import decode_raw_flow, encode_raw_flow
from akvorado_spark.sources.wire import TemplateCache, ip16, parse_netflow

# ---- NetFlow v5 ----------------------------------------------------------

v5_record = st.fixed_dictionaries(
    {
        "src": st.binary(min_size=4, max_size=4),
        "dst": st.binary(min_size=4, max_size=4),
        "nh": st.binary(min_size=4, max_size=4),
        "inif": st.integers(0, 0xFFFF),
        "outif": st.integers(0, 0xFFFF),
        "pkts": st.integers(0, 0xFFFFFFFF),
        "bytes": st.integers(0, 0xFFFFFFFF),
        "sp": st.integers(0, 0xFFFF),
        "dp": st.integers(0, 0xFFFF),
        "flags": st.integers(0, 255),
        "proto": st.integers(0, 255),
        "sas": st.integers(0, 0xFFFF),
        "das": st.integers(0, 0xFFFF),
        "smask": st.integers(0, 32),
        "dmask": st.integers(0, 32),
    }
)


@settings(max_examples=40, deadline=None)
@given(recs=st.lists(v5_record, min_size=1, max_size=12),
       sampling=st.integers(0, 0x3FFF))
def test_v5_roundtrip(recs, sampling):
    rows = parse_netflow(build_v5(recs, sampling=sampling), EXP)
    assert len(rows) == len(recs)
    for rec, row in zip(recs, rows):
        assert row["SrcAddr"] == ip16(rec["src"])
        assert row["DstAddr"] == ip16(rec["dst"])
        assert row["NextHop"] == ip16(rec["nh"])
        for a, b in [("inif", "InIf"), ("outif", "OutIf"), ("pkts", "Packets"),
                     ("bytes", "Bytes"), ("sp", "SrcPort"), ("dp", "DstPort"),
                     ("flags", "TCPFlags"), ("proto", "Proto"), ("sas", "SrcAS"),
                     ("das", "DstAS"), ("smask", "SrcNetMask"), ("dmask", "DstNetMask")]:
            assert row[b] == rec[a], (a, b)
        assert row["SamplingRate"] == (sampling or 1)


# ---- NetFlow v9 with a random template -----------------------------------

# candidate (IE, length) pairs the engine maps; value ranges respect length
_V9_FIELD_POOL = [
    (1, 4), (2, 4), (4, 1), (6, 1), (7, 2), (11, 2),
    (9, 1), (13, 1), (10, 4), (14, 4), (16, 4), (17, 4), (58, 2), (59, 2),
]
_IE_COL = {1: "Bytes", 2: "Packets", 4: "Proto", 6: "TCPFlags", 7: "SrcPort",
           11: "DstPort", 9: "SrcNetMask", 13: "DstNetMask", 10: "InIf",
           14: "OutIf", 16: "SrcAS", 17: "DstAS", 58: "SrcVlan", 59: "DstVlan"}


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_v9_random_template_roundtrip(data):
    import struct as _s

    from hypothesis import assume

    fields = data.draw(
        st.lists(st.sampled_from(_V9_FIELD_POOL), min_size=1, max_size=10, unique=True)
    )
    # a record shorter than the 4-byte flowset padding is ambiguous on
    # the wire (RFC 3954 padding is indistinguishable from data then)
    assume(sum(ln for _, ln in fields) >= 4)
    values = {
        ie: data.draw(st.integers(0, (1 << (8 * ln)) - 1)) for ie, ln in fields
    }
    tpl_body = _s.pack(">HH", 256, len(fields))
    for ie, ln in fields:
        tpl_body += _s.pack(">HH", ie, ln)
    rec = b"".join(values[ie].to_bytes(ln, "big") for ie, ln in fields)
    pkt_body = v9_flowset(0, tpl_body) + v9_flowset(256, rec)
    pkt = _s.pack(">HHIIII", 9, 2, 0, 1700000100, 0, 0) + pkt_body
    rows = parse_netflow(pkt, EXP, cache=TemplateCache())
    assert len(rows) == 1
    for ie, _ln in fields:
        assert rows[0][_IE_COL[ie]] == values[ie], _IE_COL[ie]


# ---- RawFlow protobuf ----------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    tr=st.integers(0, 2**63 - 1),
    payload=st.binary(max_size=200),
    addr=st.binary(max_size=16),
    usa=st.booleans(),
    dec=st.sampled_from(["netflow", "sflow", "gob"]),
    ts=st.sampled_from(["input", "netflow-packet", "netflow-first-switched"]),
    decap=st.sampled_from(["none", "ipip", "gre", "vxlan", "srv6"]),
    rl=st.integers(0, 2**32),
)
def test_rawflow_pb_roundtrip(tr, payload, addr, usa, dec, ts, decap, rl):
    m = decode_raw_flow(
        encode_raw_flow(time_received=tr, payload=payload, source_address=addr,
                        use_source_address=usa, decoder=dec, timestamp_source=ts,
                        decapsulation=decap, rate_limit=rl)
    )
    assert m["time_received"] == tr and m["payload"] == payload
    assert m["source_address"] == addr and m["use_source_address"] == usa
    assert (m["decoder"] if payload or dec != "netflow" else dec) in (dec, "unspecified")
    assert m["timestamp_source"] == ts and m["decapsulation"] == decap
    assert m["rate_limit"] == rl


# ---- MMDB vs independent LPM model ---------------------------------------

_prefix = st.integers(0, 2**32 - 1).flatmap(
    lambda a: st.integers(8, 30).map(
        lambda p: str(ipaddress.ip_network((a & (0xFFFFFFFF << (32 - p)), p)))
    )
)


@settings(max_examples=25, deadline=None)
@given(cidrs=st.lists(_prefix, min_size=1, max_size=12, unique=True),
       probes=st.lists(st.integers(0, 2**32 - 1), min_size=5, max_size=20))
def test_mmdb_matches_reference_lpm(cidrs, probes):
    nets = [(ipaddress.ip_network(c), i) for i, c in enumerate(cidrs)]
    w = MMDBWriter()
    # insert shortest-first so nested prefixes split enclosing leaves
    for net, i in sorted(nets, key=lambda x: x[0].prefixlen):
        w.insert(str(net), {"i": i})
    reader = MMDBReader(w.build())
    for p in probes:
        addr = ipaddress.IPv4Address(p)
        containing = [(n, i) for n, i in nets if addr in n]
        expect = max(containing, key=lambda x: x[0].prefixlen)[1] if containing else None
        got = reader.lookup(addr.packed)
        assert (got["i"] if got else None) == expect, str(addr)


def test_fuzz_garbage_datagrams_raise_only_valueerror():
    """Error contract under fuzzing: random garbage (including
    truncations with plausible headers) either parses to rows or
    raises ValueError — never struct.error/IndexError from an
    out-of-bounds read.  The non-strict batch parsers rely on typed
    errors staying inside the decoder."""
    import random
    import struct as _s

    from akvorado_spark.sources.wire import TemplateCache, parse_netflow, parse_sflow

    rnd = random.Random(20260813)
    for i in range(4000):
        n = rnd.randint(0, 220)
        b = bytearray(rnd.getrandbits(8) for _ in range(n))
        if n >= 4 and i % 3 == 0:
            # plant plausible version words so header walks go deeper
            _s.pack_into(">H", b, 0, rnd.choice([5, 9, 10]))
            if i % 6 == 0:
                _s.pack_into(">I", b, 0, 5)
        b = bytes(b)
        try:
            parse_netflow(b, b"x", cache=TemplateCache())
        except ValueError:
            pass
        try:
            parse_sflow(b, b"\0" * 4)
        except ValueError:
            pass


def test_fuzz_bmp_and_rawflow_raise_only_valueerror():
    """Same typed-error contract for the other binary inputs: the BMP
    stream walker (attacker-controlled common-header length: must
    neither stall nor overrun) and the RawFlow proto decoder (varint
    bounds, wire-type confusion must not trigger huge allocations)."""
    import random

    from akvorado_spark.sources.bmp import parse_bmp
    from akvorado_spark.sources.rawflow_pb import decode_raw_flow

    rnd = random.Random(20260814)
    for i in range(4000):
        n = rnd.randint(0, 260)
        b = bytearray(rnd.getrandbits(8) for _ in range(n))
        if n >= 6 and i % 3 == 0:
            b[0] = 3  # plant the BMP version so the walk goes deeper
        b = bytes(b)
        try:
            parse_bmp(b)
        except ValueError:
            pass
        try:
            decode_raw_flow(b)
        except ValueError:
            pass
