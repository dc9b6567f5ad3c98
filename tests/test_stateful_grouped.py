"""applyInPandasWithState streaming op, applyInPandas grouped-map, and the
frame-sampling UDTF stage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.operators.grouped import group_profile
from etl_transparencia_sergipe_spark.sources.catalog import load_table
from etl_transparencia_sergipe_spark.sources.multimodal import (
    media_from_documents,
    sample_frames,
)
from etl_transparencia_sergipe_spark.streaming.pipeline import events_stream
from etl_transparencia_sergipe_spark.streaming.stateful import (
    running_user_stats,
    user_stats_batch,
)


def test_stateful_running_user_stats(spark, sf_dir):
    stream = running_user_stats(events_stream(spark, sf_dir))
    q = (
        stream.writeStream.outputMode("update")
        .format("memory").queryName("t_state")
        .trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    try:
        # single-file source => one micro-batch => final state per user.
        # Compared against user_stats_batch — q112's oracle surface —
        # with a 2-decimal round: the stateful op accumulates total in
        # float (order-dependent), the batch twin in exact decimal.
        got = {
            r.user_id: (r.n_events, round(r.total_value, 2),
                        r.max_value)
            for r in spark.sql(
                "SELECT * FROM t_state").collect()
        }
        batch = user_stats_batch(load_table(spark, "events", sf_dir))
        want = {r.user_id: (r.n_events, round(r.total_value, 2),
                            r.max_value)
                for r in batch.collect()}
        assert got == want
    finally:
        q.stop()


def test_group_profile_matches_pandas(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_quantity")
    got = {r.l_returnflag: r for r in
           group_profile(li, "l_returnflag", "l_quantity").collect()}
    pdf = li.toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        r = got[flag]
        assert r.n == len(grp)
        assert r.mean == pytest.approx(grp.l_quantity.mean())
        assert r.std == pytest.approx(grp.l_quantity.std(ddof=1))
        assert r.median == pytest.approx(grp.l_quantity.median())


def test_sample_frames_udtf_shape(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    media = media_from_documents(spark, docs)
    frames = sample_frames(media, n_frames=4, frame_size=64)
    rows = frames.collect()
    n_videos = media.filter("media_type = 'video/mp4'").count()
    assert len(rows) >= n_videos          # row expansion happened
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
        assert 0 < r.frame_bytes <= 64
        assert len(r.frame_checksum) == 32
    # frame indices are dense from 0 per media
    for frames_of in by_media.values():
        idxs = sorted(f.frame_idx for f in frames_of)
        assert idxs == list(range(len(idxs)))


def test_group_profile_skew_guard_and_builtin_twin(spark, sf_dir):
    """A group beyond max_group_rows must fail loudly (not OOM); the
    built-in twin must agree with the pandas path and have no cap."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from etl_transparencia_sergipe_spark.operators.grouped import (
        group_profile_builtin,
    )

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_quantity")

    with pytest.raises(PythonException, match="max_group_rows"):
        group_profile(li, "l_returnflag", "l_quantity",
                      max_group_rows=10).collect()

    got = {r.l_returnflag: r for r in
           group_profile(li, "l_returnflag", "l_quantity").collect()}
    twin = {r.l_returnflag: r for r in
            group_profile_builtin(li, "l_returnflag",
                                  "l_quantity").collect()}
    assert set(got) == set(twin)
    for k, r in got.items():
        t = twin[k]
        assert (t.n, t.mean, t.std, t.median, t.iqr) == pytest.approx(
            (r.n, r.mean, r.std, r.median, r.iqr))
