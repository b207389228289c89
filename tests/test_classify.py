"""Classifier cascade + rate limiter tests (SURVEY §2.9 T1/T3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from akvorado_spark.operators.classify import ClassifierRule, classify, rate_limit


def test_classify_first_match_wins_and_reject(spark):
    df = spark.createDataFrame(
        [("r1", "Gi0"), ("r2", "Gi1"), ("bad", "Gi2")],
        "ExporterName string, InIfName string",
    )
    rules = [
        ClassifierRule(when="ExporterName = 'bad'", reject=True),
        ClassifierRule(when="ExporterName = 'r1'", sets={"Role": "'edge'"}),
        ClassifierRule(when="ExporterName LIKE 'r%'", sets={"Role": "'core'", "Site": "'par'"}),
    ]
    out = classify(df, rules, {"Role": "'unknown'", "Site": "'unknown'"}).collect()
    by = {r["ExporterName"]: r for r in out}
    assert "bad" not in by  # rejected
    assert by["r1"]["Role"] == "edge"  # first matching rule wins
    assert by["r1"]["Site"] == "par"  # later rule still fills unset attrs
    assert by["r2"]["Role"] == "core"


def test_rate_limit_keeps_aggregate_unbiased(spark):
    # 25 flows in one tick from one exporter, limit 50/s → 10 per tick
    rows = [("e1", "2024-01-01 00:00:00", i, 100, 10) for i in range(25)]
    df = spark.createDataFrame(
        rows, "ExporterAddress string, TimeReceived string, SrcPort int, Bytes long, SamplingRate long"
    ).withColumn("TimeReceived", F.col("TimeReceived").cast("timestamp"))
    out = rate_limit(df, 50, key="ExporterAddress", tiebreak=("SrcPort",))
    rows_out = out.collect()
    assert len(rows_out) == 10
    # SamplingRate inflated 10 → 25 (total/kept = 25/10 → floor(10*25/10))
    assert all(r["SamplingRate"] == 25 for r in rows_out)
    # estimated total bytes preserved: 25 flows * 100 B * 10 = 25000
    est = out.agg(F.sum(F.col("Bytes") * F.col("SamplingRate"))).collect()[0][0]
    assert est == 25 * 100 * 10


def test_rate_limit_under_limit_untouched(spark):
    rows = [("e1", "2024-01-01 00:00:00", i, 100, 10) for i in range(5)]
    df = spark.createDataFrame(
        rows, "ExporterAddress string, TimeReceived string, SrcPort int, Bytes long, SamplingRate long"
    ).withColumn("TimeReceived", F.col("TimeReceived").cast("timestamp"))
    out = rate_limit(df, 50, key="ExporterAddress", tiebreak=("SrcPort",)).collect()
    assert len(out) == 5
    assert all(r["SamplingRate"] == 10 for r in out)


def test_rate_limit_per_message_column(spark):
    """RawFlow field 8 shape: each row carries its exporter's limit;
    0 means no limit (common/pb/rawflow.proto:14, worker.go:71)."""
    rows = (
        [("e1", "2024-01-01 00:00:00", i, 100, 10, 25) for i in range(25)]
        + [("e2", "2024-01-01 00:00:00", i, 100, 10, 0) for i in range(25)]
    )
    df = spark.createDataFrame(
        rows,
        "ExporterAddress string, TimeReceived string, SrcPort int, "
        "Bytes long, SamplingRate long, rate_limit long",
    ).withColumn("TimeReceived", F.col("TimeReceived").cast("timestamp"))
    out = rate_limit(
        df, "rate_limit", key="ExporterAddress", tiebreak=("SrcPort",)
    )
    by = {}
    for r in out.collect():
        by.setdefault(r["ExporterAddress"], []).append(r)
    # e1: limit 25/s -> 5 per tick, compensation 25/5 = 5x
    assert len(by["e1"]) == 5
    assert all(r["SamplingRate"] == 50 for r in by["e1"])
    # e2: limit 0 = unlimited, untouched
    assert len(by["e2"]) == 25
    assert all(r["SamplingRate"] == 10 for r in by["e2"])


# --- T2 provider precedence (reference enricher.go:202-249, 389-398) -------

def test_as_number_provider_precedence(spark):
    from akvorado_spark.streaming.ingest import as_number, net_mask

    # (flow_as, routing_as, net_as, flow_mask) → expected per provider list
    rows = [
        # public flow AS wins immediately
        (3356, 64601, 65000, 24, 3356),
        # private flow AS (64512) skipped → routing
        (64512, 64601, 65000, 24, 64601),
        # AS_TRANS (23456) is private → routing
        (23456, 64601, 65000, 24, 64601),
        # 4-byte private range skipped → routing
        (4200000001, 64601, 65000, 24, 64601),
        # boundary: 64495 is public
        (64495, 64601, 65000, 24, 64495),
        # boundary: 65552 is public
        (65552, 64601, 65000, 24, 65552),
        # routing unset (NULL) → networks
        (64512, None, 65000, 24, 65000),
        # everything unset → 0
        (64512, None, None, 24, 0),
    ]
    df = spark.createDataFrame(
        [(f, r, n, m) for f, r, n, m, _ in rows],
        "flow_as long, routing_as long, net_as long, flow_mask int",
    )
    out = df.select(
        as_number(
            ("flow-except-private", "routing", "networks"),
            F.col("flow_as"),
            routing_as=F.col("routing_as"),
            net_as=F.col("net_as"),
        ).alias("asn")
    ).collect()
    assert [r["asn"] for r in out] == [exp for *_, exp in rows]

    # flow-except-default-route: mask 0 disqualifies the flow AS
    df2 = spark.createDataFrame(
        [(3356, 64601, 0), (3356, 64601, 24)],
        "flow_as long, routing_as long, flow_mask int",
    )
    out2 = df2.select(
        as_number(
            ("flow-except-default-route", "routing"),
            F.col("flow_as"),
            routing_as=F.col("routing_as"),
            flow_netmask=F.col("flow_mask"),
        ).alias("asn")
    ).collect()
    assert [r["asn"] for r in out2] == [64601, 3356]

    # routing-except-private skips a private RIB answer
    out3 = df2.select(
        as_number(
            ("routing-except-private",),
            F.col("flow_as"),
            routing_as=F.lit(64512).cast("long"),
        ).alias("asn")
    ).collect()
    assert [r["asn"] for r in out3] == [0, 0]

    # net_mask: first non-zero of the provider order
    df3 = spark.createDataFrame([(0, 22), (24, 22)], "fm int, rm int")
    out4 = df3.select(
        net_mask(("flow", "routing"), F.col("fm"), routing_mask=F.col("rm")).alias("m")
    ).collect()
    assert [r["m"] for r in out4] == [22, 24]


def test_next_hop_provider_precedence(spark):
    from akvorado_spark.streaming.ingest import next_hop

    zero = bytes(16)
    a = bytes(15) + b"\x01"
    b = bytes(15) + b"\x02"
    df = spark.createDataFrame(
        [(zero, b), (a, b), (zero, None)], "fnh binary, rnh binary"
    )
    out = df.select(
        next_hop(("flow", "routing"), F.col("fnh"), routing_nh=F.col("rnh")).alias("nh")
    ).collect()
    assert [bytes(r["nh"]) for r in out] == [b, a, zero]


def test_exporter_classifier_reference_cases(spark):
    """The reference's TestExporterClassifier table
    (outlet/core/classifier_test.go:13-140), re-expressed as SQL rules:
    constant classification, startsWith/matches conditions, Format,
    ClassifyRegex with $N capture templates (incl. regex classes and
    the non-matching case), and selective Reject."""
    from akvorado_spark.operators.classify import (
        ClassifierRule,
        classify,
        classify_regex_sql,
    )

    exporters = spark.createDataFrame(
        [("exporter",), ("roger",), ("nothing-here",)], "Name string"
    )
    rules = [
        # Exporter.Name startsWith "expo" && Classify("europe")
        ClassifierRule(when="startswith(Name, 'expo')", sets={"Group": "'europe'"}),
        # Exporter.Name matches "^e.p.r" && ClassifySite("paris")
        ClassifierRule(when="Name RLIKE '^e.p.r'", sets={"Site": "'paris'"}),
        # ClassifyTenant(Format("tenant-%s", Exporter.Name))
        ClassifierRule(when="true", sets={"Tenant": "format_string('tenant-%s', Name)"}),
        # ClassifyRegex(Exporter.Name, "^(e.p+).r", "europe-$1")
        ClassifierRule(
            when="true",
            sets={"RegexGroup": classify_regex_sql("Name", r"^(e.p+).r", "europe-$1")},
        ),
        # regex with class: ClassifyRegex(..., "^(\\w+).r", "europe-$1")
        ClassifierRule(
            when="true",
            sets={"ClassGroup": classify_regex_sql("Name", r"^(\w+).r", "europe-$1")},
        ),
        # selective reject: Exporter.Name startsWith "nothing" && Reject()
        ClassifierRule(when="startswith(Name, 'nothing')", reject=True),
    ]
    out = {r["Name"]: r for r in classify(exporters, rules).collect()}
    assert set(out) == {"exporter", "roger"}  # 'nothing-here' rejected
    e = out["exporter"]
    assert e["Group"] == "europe"
    assert e["Site"] == "paris"
    assert e["Tenant"] == "tenant-exporter"
    assert e["RegexGroup"] == "europe-exp"       # "^(e.p+).r" → $1 = "exp"
    assert e["ClassGroup"] == "europe-export"    # "^(\w+).r" → $1 = "export"
    r = out["roger"]
    assert r["Group"] is None and r["Site"] is None  # conditions don't match
    assert r["Tenant"] == "tenant-roger"
    assert r["RegexGroup"] is None  # non-matching regex classifies nothing


def test_classify_regex_context_assertions(spark):
    """Template expansion must match IN CONTEXT: a lookahead pattern
    sees the full subject, not just the extracted match (code-review
    finding: extract-then-replace silently returned the raw match)."""
    from akvorado_spark.operators.classify import classify_regex_sql

    df = spark.createDataFrame([("core-paris",), ("core-berlin",)], "Name string")
    expr = classify_regex_sql("Name", r"core(?=-paris)", "eu-$0")
    got = {r["Name"]: r["g"] for r in df.selectExpr("Name", f"{expr} AS g").collect()}
    assert got["core-paris"] == "eu-core"
    assert got["core-berlin"] is None


def test_classify_regex_literal_dollar(spark):
    """A template `$` that is not a `$N`/`${N}` group reference must
    come through as a literal instead of crashing Java's replacement
    parser (review finding: 'US$ rate' threw IllegalArgumentException)."""
    from akvorado_spark.operators.classify import classify_regex_sql

    df = spark.createDataFrame([("rate-42",)], "Name string")
    expr = classify_regex_sql("Name", r"rate-(\d+)", "US$ costs ${1}$")
    got = df.selectExpr(f"{expr} AS g").collect()[0]["g"]
    assert got == "US$ costs 42$"
    # ${name} (non-numeric braced ref) degrades to a literal, documented
    expr2 = classify_regex_sql("Name", r"rate-(\d+)", "x-${tag}-$1")
    got2 = df.selectExpr(f"{expr2} AS g").collect()[0]["g"]
    assert got2 == "x-${tag}-42"


def test_classify_output_normalization(spark):
    """Classify* outputs are normalized — lowercase, strip
    [^a-z0-9.+-] — mirroring outlet/core/classifier.go:266-271 and the
    enricher cases 'Othello'→'othello', 'P$1'→'p100'
    (enricher_test.go:433-504)."""
    from akvorado_spark.operators.classify import (
        classify_regex_norm_sql,
        classify_str_sql,
    )

    df = spark.createDataFrame(
        [("Interface 100",), ("no match here",)], "Description string"
    )
    prov = classify_str_sql("'Othello'")
    conn = classify_regex_norm_sql("Description", r" (1\d+)$", "P$1")
    rows = {
        r["Description"]: (r["p"], r["c"])
        for r in df.selectExpr("Description", f"{prov} AS p", f"{conn} AS c").collect()
    }
    assert rows["Interface 100"] == ("othello", "p100")
    # non-matching regex yields NULL (rule skipped), normalization rides
    assert rows["no match here"] == ("othello", None)
    # strip set keeps dot/plus/minus, drops slash/space/colon
    kept = classify_str_sql("'A b/C:d.e+f-g'")
    assert df.selectExpr(f"{kept} AS k").collect()[0]["k"] == "abcd.e+f-g"


# --- T1 token-bucket variant (rate.go:37-63, pinned by rate_test.go) -------


def _tb_frame(spark, rows):
    return spark.createDataFrame(
        rows,
        "ExporterAddress string, TimeReceived double, SrcPort int, SamplingRate long",
    )


def test_token_bucket_initial_burst_and_refill(spark):
    """rate_test.go:15-44: limit 100/s → burst 10; 20 flows at t=0
    admit exactly 10, and one second later 20 more admit 10 again
    (refill capped at burst)."""
    from akvorado_spark.operators.classify import rate_limit_token_bucket

    rows = [("e1", 0.0, i, 1000) for i in range(20)]
    rows += [("e1", 1.0, i, 1000) for i in range(20)]
    out = rate_limit_token_bucket(
        _tb_frame(spark, rows), 100, tiebreak=("SrcPort",)
    ).collect()
    by_t = {}
    for r in out:
        by_t.setdefault(r["TimeReceived"], []).append(r["SrcPort"])
    assert sorted(by_t) == [0.0, 1.0]
    assert sorted(by_t[0.0]) == list(range(10))  # first 10 in order
    assert sorted(by_t[1.0]) == list(range(10))


def test_token_bucket_drop_rate_compensation(spark):
    """rate_test.go:46-66 + worker.go:97-100: 20 flows in tick 0 drop
    50%; the first flow of the next tick observes dropRate=0.5 and its
    survivors' sampling doubles."""
    from akvorado_spark.operators.classify import rate_limit_token_bucket

    rows = [("e1", 0.0, i, 1000) for i in range(20)]
    rows += [("e1", 0.2, 99, 1000)]
    out = rate_limit_token_bucket(
        _tb_frame(spark, rows), 100, tiebreak=("SrcPort",)
    ).collect()
    tick0 = [r for r in out if r["TimeReceived"] == 0.0]
    tick1 = [r for r in out if r["TimeReceived"] == 0.2]
    assert len(tick0) == 10 and all(r["SamplingRate"] == 1000 for r in tick0)
    assert [r["SamplingRate"] for r in tick1] == [2000]


def test_token_bucket_per_exporter_isolation(spark):
    """rate_test.go:68-91: exhausting exporter1's burst leaves
    exporter2's full burst intact."""
    from akvorado_spark.operators.classify import rate_limit_token_bucket

    rows = [("e1", 0.0, i, 1000) for i in range(20)]
    rows += [("e2", 0.0, i, 1000) for i in range(20)]
    out = rate_limit_token_bucket(
        _tb_frame(spark, rows), 100, tiebreak=("SrcPort",)
    ).collect()
    per = {}
    for r in out:
        per[r["ExporterAddress"]] = per.get(r["ExporterAddress"], 0) + 1
    assert per == {"e1": 10, "e2": 10}


def test_token_bucket_steady_state(spark):
    """rate_test.go:93-118: after the burst drains, 10 flows/s under a
    100/s limit are all admitted for 5 seconds.  The t=1 flows still
    observe the burst tick's 50% drop rate (the counters only roll
    over on the next tick *with traffic*, rate.go:48-53), so exactly
    that second is compensated x2; afterwards dropRate is 0."""
    from akvorado_spark.operators.classify import rate_limit_token_bucket

    rows = [("e1", 0.0, i, 1000) for i in range(20)]
    for sec in range(1, 6):
        rows += [("e1", float(sec), i, 1000) for i in range(10)]
    out = rate_limit_token_bucket(
        _tb_frame(spark, rows), 100, tiebreak=("SrcPort",)
    ).collect()
    for sec in range(1, 6):
        kept = [r for r in out if r["TimeReceived"] == float(sec)]
        assert len(kept) == 10, sec
        want = 2000 if sec == 1 else 1000
        assert all(r["SamplingRate"] == want for r in kept), sec


def test_token_bucket_below_ten_admits_nothing(spark):
    """burst = limit//10 exactly as the reference constructs it
    (rate.go:44): a limit under 10/s has burst 0 and AllowN(1) can
    never succeed — rate_limit() is the variant with a floor."""
    from akvorado_spark.operators.classify import rate_limit_token_bucket

    rows = [("e1", float(i), i, 1000) for i in range(5)]
    out = rate_limit_token_bucket(_tb_frame(spark, rows), 5).collect()
    assert out == []
