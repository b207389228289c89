"""Custom dictionary tests (§2.10): CSV-loaded hashed and ip_trie
layouts appending generated columns to flow frames."""

from __future__ import annotations

from akvorado_spark.sources.custom_dict import (
    CustomDictionary,
    apply_custom_dicts,
    load_csv_dict,
)


def _v4(b):
    return b"\x00" * 10 + b"\xff\xff" + bytes(b)


def test_hashed_dict_from_csv(spark, tmp_path):
    csv = tmp_path / "services.csv"
    csv.write_text("port,service,tier\n443,https,frontend\n5432,postgres,db\n")
    d = CustomDictionary(
        name="services",
        data=load_csv_dict(spark, str(csv)),
        attributes=["service", "tier"],
        match={"port": ["DstPort", "SrcPort"]},
    )
    assert set(d.output_columns()) == {
        "DstPortService", "DstPortTier", "SrcPortService", "SrcPortTier"
    }
    flows = spark.createDataFrame(
        [(443, 55000), (5432, 443), (80, 80)], "DstPort int, SrcPort int"
    )
    out = {r["DstPort"]: r for r in d.apply(flows).collect()}
    assert out[443]["DstPortService"] == "https" and out[443]["DstPortTier"] == "frontend"
    assert out[5432]["DstPortService"] == "postgres"
    assert out[5432]["SrcPortService"] == "https"  # same dict, Src side
    assert out[80]["DstPortService"] == ""  # default fill


def test_ip_trie_dict_longest_match(spark, tmp_path):
    csv = tmp_path / "owners.csv"
    csv.write_text("prefix,owner\n10.0.0.0/8,corp\n10.1.0.0/16,lab\n")
    d = CustomDictionary(
        name="owners",
        data=load_csv_dict(spark, str(csv)),
        attributes=["owner"],
        match={"prefix": ["SrcAddr", "DstAddr"]},
        layout="ip_trie",
        default="unknown",
    )
    flows = spark.createDataFrame(
        [(_v4([10, 1, 2, 3]), _v4([10, 9, 9, 9])),
         (_v4([192, 0, 2, 1]), _v4([10, 1, 0, 1]))],
        "SrcAddr binary, DstAddr binary",
    )
    rows = apply_custom_dicts(flows, [d]).collect()
    by_src = {bytes(r["SrcAddr"])[-4:]: r for r in rows}
    assert by_src[bytes([10, 1, 2, 3])]["SrcAddrOwner"] == "lab"      # /16 beats /8
    assert by_src[bytes([10, 1, 2, 3])]["DstAddrOwner"] == "corp"
    assert by_src[bytes([192, 0, 2, 1])]["SrcAddrOwner"] == "unknown"
    assert by_src[bytes([192, 0, 2, 1])]["DstAddrOwner"] == "lab"


def test_custom_dict_joins_broadcast(spark, tmp_path):
    csv = tmp_path / "s.csv"
    csv.write_text("port,service\n443,https\n")
    d = CustomDictionary(
        name="s", data=load_csv_dict(spark, str(csv)),
        attributes=["service"], match={"port": ["DstPort"]},
    )
    from test_plans import plan

    flows = spark.createDataFrame([(443,)], "DstPort int")
    p = plan(d.apply(flows))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_custom_dict_attribute_completion(spark):
    """Reference TestFilterHandlersCustomDict: DISTINCT values of a
    generated attribute column over recent flows, startsWith-matched,
    ordered, limited."""
    from datetime import datetime, timezone

    from akvorado_spark.query.complete import complete_dimension_attribute

    old = datetime(2024, 1, 1, tzinfo=timezone.utc)
    now = datetime(2024, 1, 2, tzinfo=timezone.utc)
    flows = spark.createDataFrame(
        [(now, "a-role"), (now, "b-role"), (now, "c-role"), (now, None),
         (old, "stale-role")],
        "TimeReceived timestamp, DstAddrRole string",
    )
    got = [r["label"] for r in
           complete_dimension_attribute(flows, "DstAddrRole").collect()]
    assert got == ["a-role", "b-role", "c-role"]  # stale + null excluded
    got_a = [r["label"] for r in
             complete_dimension_attribute(flows, "DstAddrRole", prefix="a").collect()]
    assert got_a == ["a-role"]
