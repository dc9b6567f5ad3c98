"""sorted_write layout: a range predicate must be able to skip most row
groups of the clustered layout (checked from parquet footer statistics —
the same min/max the reader's pushdown consults), and the same predicate
over an UNCLUSTERED write of the same rows must skip ~nothing. Results
are identical either way; layout only changes what gets read."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.operators.layout import (
    rowgroup_skip_fraction,
    sorted_write,
)
from etl_transparencia_sergipe_spark.sources.catalog import load_table


def test_sorted_layout_enables_rowgroup_skipping(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "ts", "value")
    lo = ev.agg(F.min("ts")).collect()[0][0]
    hi = ev.agg(F.max("ts")).collect()[0][0]
    span = hi - lo
    # one-day-ish probe window in the middle of the range
    plo = lo + span * 45 // 100
    phi = lo + span * 55 // 100

    clustered = str(tmp_path / "clustered")
    shuffled = str(tmp_path / "shuffled")
    sorted_write(ev, clustered, ["ts"], n_files=8)
    # adversarial unclustered twin: round-robin by hash destroys locality
    (ev.repartition(8, F.col("event_id"))
     .write.mode("overwrite").parquet(shuffled))

    good = rowgroup_skip_fraction(clustered, "ts", plo, phi)
    bad = rowgroup_skip_fraction(shuffled, "ts", plo, phi)
    assert good["n_groups"] >= 8
    assert good["skip_fraction"] >= 0.7, good
    assert bad["skip_fraction"] <= 0.1, bad

    # correctness is layout-independent
    a = (spark.read.parquet(clustered)
         .filter((F.col("ts") >= plo) & (F.col("ts") <= phi)).count())
    b = (spark.read.parquet(shuffled)
         .filter((F.col("ts") >= plo) & (F.col("ts") <= phi)).count())
    assert a == b > 0
