"""Quantizer artifact store: bit-exact parquet roundtrip, data/spec
fingerprinting, train-once-serve-many."""

from __future__ import annotations

import numpy as np

from etl_transparencia_sergipe_spark.operators import quantizer_store as qs


def test_roundtrip_bit_exact(tmp_path):
    cmat = np.random.default_rng(7).normal(size=(16, 64))
    books = np.random.default_rng(8).normal(size=(8, 16, 8))
    p = tmp_path / "a.parquet"
    qs._save(p, {"cmat": cmat, "books": books})
    back = qs._load(p)
    assert np.array_equal(back["cmat"], cmat)
    assert np.array_equal(back["books"], books)
    assert back["books"].shape == (8, 16, 8)


def test_key_changes_with_spec_and_data(tmp_path):
    src = tmp_path / "emb.parquet"
    src.write_bytes(b"x" * 100)
    k1 = qs.artifact_key("pq", str(src), {"m": 8, "ksub": 16})
    k2 = qs.artifact_key("pq", str(src), {"m": 8, "ksub": 64})
    assert k1 != k2
    # rewriting the source (size or mtime change) invalidates the key
    src.write_bytes(b"y" * 101)
    k3 = qs.artifact_key("pq", str(src), {"m": 8, "ksub": 16})
    assert k3 != k1
    # kind participates too
    assert qs.artifact_key("ivfpq", str(src), {"m": 8, "ksub": 16}) != k3


def test_get_or_train_trains_once(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", str(tmp_path / "store"))
    src = tmp_path / "emb.parquet"
    src.write_bytes(b"data")
    calls = []

    def trainer():
        calls.append(1)
        return {"cmat": np.arange(12.0).reshape(3, 4)}

    a = qs.get_or_train("kmeans", str(src), {"n_cells": 3}, trainer)
    b = qs.get_or_train("kmeans", str(src), {"n_cells": 3}, trainer)
    assert len(calls) == 1  # second call served from parquet
    assert np.array_equal(a["cmat"], b["cmat"])
    # a crashed write never leaves a half-artifact: tmp suffix cleaned
    leftovers = list((tmp_path / "store").glob("*.tmp.parquet"))
    assert leftovers == []
