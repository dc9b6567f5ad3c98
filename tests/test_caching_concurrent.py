"""checkpoint_rdd_id (round-11, r10 VERDICT item 5): per-checkpoint
eviction in the iterative operators must track EXACT RDD ids read off
the checkpointed Dataset, so a concurrent query's checkpoints can never
be evicted out from under it. The former before/after
getPersistentRDDs snapshot diffing read session-global state: a foreign
localCheckpoint registering inside a tracked window was unpersisted a
round later with NO lineage to recompute from — the concurrent job
failed, not slowed (round-9 ADVICE low; documented single-threaded-only
until this round)."""

from __future__ import annotations

import threading

import pytest

from etl_transparencia_sergipe_spark.caching import (
    checkpoint_rdd_id,
    persistent_rdd_ids,
    release_all,
)
from etl_transparencia_sergipe_spark.operators.components import (
    connected_components,
)


def test_checkpoint_rdd_id_exact(spark):
    df = spark.range(50).selectExpr("id", "id * 3 AS v")
    before = persistent_rdd_ids(spark)
    ck = df.localCheckpoint(eager=False)
    rid = checkpoint_rdd_id(ck)
    assert persistent_rdd_ids(spark) - before == {rid}
    ck.count()
    assert rid in persistent_rdd_ids(spark)
    release_all(spark)


def test_checkpoint_rdd_id_rejects_non_checkpoint(spark):
    df = spark.range(5)
    with pytest.raises(ValueError, match="LogicalRDD"):
        checkpoint_rdd_id(df)


def test_concurrent_checkpoints_survive_cc_run(spark):
    """A second thread creates and re-reads its own localCheckpoints
    while connected_components iterates (multiple truncate/evict rounds)
    in the main thread. Exact-id eviction must never touch the foreign
    checkpoints: every re-count succeeds with the right value. Under the
    snapshot-diff scheme this was a documented failure mode — the
    foreign checkpoint landed in a CC round's ``created`` window and was
    unpersisted while live."""
    release_all(spark)
    errors: list[BaseException] = []
    stop = threading.Event()

    def churn() -> None:
        try:
            while not stop.is_set():
                ck = (spark.range(2000)
                      .selectExpr("id", "id % 7 AS g")
                      .localCheckpoint(eager=False))
                assert ck.count() == 2000
                # re-read AFTER the main thread has had time to run an
                # eviction round — a vanished block set fails HERE
                for _ in range(5):
                    if stop.is_set():
                        break
                    assert ck.groupBy("g").count().count() == 7
                ck.unpersist()
        except BaseException as e:  # noqa: BLE001 — surface to main
            errors.append(e)

    t = threading.Thread(target=churn, daemon=True)
    t.start()
    try:
        # 200-node chain: several pointer-jumping rounds, each evicting
        # the superseded round's checkpoint while the churn thread's
        # checkpoints are live in the same session
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(200)], "id_a bigint, id_b bigint")
        out = connected_components(pairs)
        assert out.filter("component != 0").count() == 0
    finally:
        stop.set()
        t.join(timeout=60)
    assert not errors, errors
    release_all(spark)
