"""Connected components / dedup clusters on known graphs."""

from __future__ import annotations

from etl_transparencia_sergipe_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4, pair 10-11, triangle 20-21-22
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a bigint, id_b bigint")
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_dedup_clusters_summary(spark):
    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (100, 101)], "id_a bigint, id_b bigint")
    got = {r.component: (r.n_members, r.max_member)
           for r in dedup_clusters(pairs).collect()}
    assert got == {5: (3, 9), 100: (2, 101)}


def test_components_converge_on_long_chain(spark):
    # 30-node chain needs ~log-diameter rounds under min-propagation;
    # ensure max_iter headroom is enough and the result is exact
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a bigint, id_b bigint")
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 31


def test_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir= switches lineage truncation to reliable
    checkpoint(): same exact result, checkpoint files actually land in
    the directory (cluster-durable — survives executor loss, unlike
    localCheckpoint's executor-local blocks), and the returned frame's
    lineage is truncated to a checkpoint scan (no iterative join stack).
    """
    import os

    ckpt = str(tmp_path / "cc_ckpt")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a bigint, id_b bigint")
    out = connected_components(pairs, checkpoint_dir=ckpt)
    got = {r.node: r.component for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    # reliable checkpoint blocks were written under the dir
    files = [os.path.join(dp, f) for dp, _, fs in os.walk(ckpt) for f in fs]
    assert files, "no reliable checkpoint files written"
    # lineage is truncated: the debug string bottoms out at a
    # ReliableCheckpointRDD scan, not the per-iteration join stack
    assert "ReliableCheckpointRDD" in out.rdd.toDebugString().decode()


def test_components_log_diameter_convergence(spark):
    # The sharp form of the O(log diameter) claim: a diameter-256 chain
    # must converge within 8 rounds (label reach doubles per round via
    # path halving). Plain min-propagation would need 256 rounds, so
    # this fails loudly if the pointer-jumping step ever regresses.
    # Default max_iter=20 therefore covers diameters up to ~2^20.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(256)], "id_a bigint, id_b bigint")
    got = {r.node: r.component
           for r in connected_components(pairs, max_iter=8).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 257


def test_incremental_components_equals_full_recompute(spark):
    """Contraction update == full recompute over the union graph, on a
    graph engineered to hit every case: two old components merged by a
    new edge, a new node absorbed into an old component, a new-only
    component, an untouched old component, and an intra-component new
    edge (contracts to a self-loop)."""
    from etl_transparencia_sergipe_spark.operators.components import (
        incremental_components,
    )

    old_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31)],
        "id_a bigint, id_b bigint")
    new_pairs = spark.createDataFrame(
        [
            (3, 10),    # merges old components 1 and 10
            (21, 40),   # new node 40 absorbed into old component 20
            (50, 51),   # brand-new component
            (30, 31),   # duplicate of a stored edge: self-loop, no-op
        ],
        "id_a bigint, id_b bigint")
    stored = connected_components(old_pairs)
    got = {r.node: r.component
           for r in incremental_components(stored, new_pairs).collect()}
    want = {r.node: r.component
            for r in connected_components(
                old_pairs.unionByName(new_pairs)).collect()}
    assert got == want
    assert got[40] == 20 and got[10] == 1 and got[50] == 50
    assert got[30] == 30  # untouched component label survived


def test_incremental_components_deep_merge_chain(spark):
    """A new batch that chains MANY stored components together: the
    contracted graph is itself a long chain, so the inner label
    propagation must converge over it (log-diameter rounds)."""
    from etl_transparencia_sergipe_spark.operators.components import (
        incremental_components,
    )

    # 40 disjoint stored pairs (2i, 2i+1), i in 0..39
    old_pairs = spark.createDataFrame(
        [(2 * i, 2 * i + 1) for i in range(40)],
        "id_a bigint, id_b bigint")
    # new edges daisy-chain all 40 components: (1,2), (3,4), ...
    new_pairs = spark.createDataFrame(
        [(2 * i + 1, 2 * i + 2) for i in range(39)],
        "id_a bigint, id_b bigint")
    stored = connected_components(old_pairs)
    got = {r.node: r.component
           for r in incremental_components(stored, new_pairs).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 80
