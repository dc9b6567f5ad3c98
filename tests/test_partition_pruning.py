"""Partition pruning over the hive-partitioned pipeline output — the
scale property that makes the month/city layout worth its write cost: a
predicate on a partition column must prune at the FILE level
(PartitionFilters in the scan, non-matching directories never read), not
as a post-scan filter. At 100 TB this is the difference between reading
one month and reading the whole corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.pipelines import write_partitioned


def _scan_node(plan: str) -> str:
    for chunk in plan.split("\n\n"):
        if "FileScan" in chunk or "Scan parquet" in chunk:
            return chunk
    return plan


def test_partition_filter_prunes_directories(spark, tmp_path):
    df = spark.createDataFrame(
        [("aracaju", 2024, m, float(m)) for m in range(1, 13)]
        + [("pacatuba", 2024, m, float(m)) for m in range(1, 13)],
        "cidade string, ano int, mes int, pago double")
    out = str(tmp_path / "panel")
    write_partitioned(df, out)

    back = spark.read.parquet(out).filter(
        (F.col("cidade") == "aracaju") & (F.col("mes") == 3))
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicates must land in PartitionFilters, not remain
    # as a row-level Filter above the scan
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cidade" in m.group(1) and "mes" in m.group(1), plan

    # file-level proof: the scan reads exactly the one matching directory
    files = [r.filePath for r in back.select(
        F.input_file_name().alias("filePath")).distinct().collect()]
    assert files and all(
        "cidade=aracaju" in f and "mes=3" in f for f in files), files
    assert back.count() == 1
