"""Over-cap gate validity for the certification-sample twins.

The driver SFs keep every cert corpus under `_EMBED_CERT_CAP` /
`_MH_CERT_CAP`, so the md5-order LIMIT in the registered DuckDB oracles
is the identity there and a cap-mismatch bug would stay invisible until
a larger SF turned the gate red by construction (ADVICE r12, medium).
These tests force the OVER-cap regime on synthetic parquet corpora with
a tiny cap and assert Spark and DuckDB still produce identical rows —
i.e. both engines select the SAME md5-ordered sample before the
quadratic members run.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def cert_sf_dir(tmp_path_factory):
    """A miniature sf dir: 30 cert-sampled documents and 60 cert-
    sampled embeddings — both far above the test cap of 7."""
    d = tmp_path_factory.mktemp("cert_sf")
    words = [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
        "golf", "hotel", "india", "juliet", "kilo", "lima",
    ]
    doc_ids, texts = [], []
    for i in range(60):
        doc_ids.append(i * 5)  # half hit doc_id % 10 = 0
        # ≥ 6 words so trigram shingling has real grams; vary content
        texts.append(" ".join(words[(i + j) % len(words)] for j in range(8)))
    pq.write_table(
        pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        os.path.join(d, "documents.parquet"),
    )
    rng = np.random.RandomState(13)
    vec_ids = [i * 5 for i in range(60)]  # all hit vec_id % 5 = 0
    vecs = rng.rand(60, 8).astype(np.float32)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }),
        os.path.join(d, "embeddings.parquet"),
    )
    return str(d)


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_minhash_certified_gate_holds_over_cap(spark, cert_sf_dir):
    from akvorado_spark.operators.dedup import portable_seeded_hash
    from akvorado_spark.oracle.pipeline_queries import (
        _MH_CERT_SAMPLE,
        _minhash_oracle,
        _minhash_pipeline,
    )

    cap = 7  # corpus has 30 docs matching the sample ⇒ genuinely over-cap
    got = [
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in _minhash_pipeline(
            spark, cert_sf_dir, hash_fn=portable_seeded_hash,
            sample=_MH_CERT_SAMPLE, max_bucket=None, cert_cap=cap,
        ).collect()
    ]
    want = _duck(cert_sf_dir).execute(
        _minhash_oracle(sample=_MH_CERT_SAMPLE, cap=cap)
    ).fetchall()
    # the seeded perturbed twins guarantee a non-trivial pair set even
    # after sampling (they derive FROM the sampled base on both sides)
    assert got, "over-cap cert run produced no pairs — sample lost the twins"
    assert got == [tuple(r) for r in want]


def test_embed_neardup_gate_holds_over_cap(spark, cert_sf_dir, monkeypatch):
    import akvorado_spark.oracle.pipeline_queries as pqm

    cap = 7  # 60 vecs pass the % 5 filter ⇒ genuinely over-cap
    prod_cap = pqm._EMBED_CERT_CAP
    monkeypatch.setattr(pqm, "_EMBED_CERT_CAP", cap)
    got = [tuple(r) for r in pqm._embed_neardup(spark, cert_sf_dir).collect()]
    sql = pqm._NEARDUP_ORACLE.replace(f"LIMIT {prod_cap}", f"LIMIT {cap}")
    assert f"LIMIT {cap}" in sql  # the registered oracle carries the cap
    want = [tuple(r) for r in _duck(cert_sf_dir).execute(sql).fetchall()]
    assert got == want


def test_registered_oracles_carry_the_cap():
    """The REGISTERED oracle strings (what the driver actually runs)
    embed the md5-order LIMIT with the production cap values."""
    import akvorado_spark.oracle.pipeline_queries as pqm
    from akvorado_spark.oracle.registry import QUERIES, resolve_oracle

    neardup = resolve_oracle(QUERIES["embed_neardup_pairs"])
    assert (
        f"ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {pqm._EMBED_CERT_CAP}"
        in neardup
    )
    certified = resolve_oracle(QUERIES["dedup_minhash_certified"])
    assert (
        f"ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {pqm._MH_CERT_CAP}"
        in certified
    )
