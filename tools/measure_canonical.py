"""Round-8 measurement: canonical-contraction verify vs member-level
verify (q107's done-criterion — VERDICT round 7 item 1).

For each sf dir: build (or reuse) the canonical state, then time

  member_full / member_half : band-probe the FULL signature store (q81's
      all-members store) + exact-Jaccard verify every (new doc, member)
      candidate — the pre-contraction verify whose cost tracks cluster
      sizes (quadratic on the clique-dense fixture);
  canon_full / canon_half   : probe_canonical_state — one verified pair
      per (new doc, cluster).

half = the new batch restricted to pmod(doc_id, 2) = 0 (~50%): a
~linear verify shows full/half ~ 2 for the canonical path.

Usage: python tools/measure_canonical.py <sf_dir> [<sf_dir> ...]
Appends one JSON line per sf dir to /tmp/canon_measure.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.session import get_spark
from etl_transparencia_sergipe_spark.operators.canonical import (
    build_canonical_state,
    probe_canonical_state,
)
from etl_transparencia_sergipe_spark.operators.dedup import (
    jaccard_verify_pairs,
)
from etl_transparencia_sergipe_spark.operators.sigstore import (
    STORE_FORMAT,
    build_signature_store,
    probe_signature_store,
)

IS_NEW = "CAST(SUBSTR(source, 4) AS INT) >= 15"
SCRATCH = str(Path(__file__).resolve().parent.parent / ".scratch")


def _tag(sf_dir: str) -> str:
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    return (f"v{STORE_FORMAT}_" + sf_dir.strip("/").replace("/", "_")
            + f"_{st.st_size}_{int(st.st_mtime)}")


def member_verify(spark, store, docs, new_docs):
    """Pre-contraction verify: candidates from the ALL-MEMBERS store,
    exact Jaccard per (new doc, member) pair, same aggregate as q107."""
    cand = (probe_signature_store(spark, store, new_docs, "doc_id", "text")
            .selectExpr("old_id AS id_a", "new_id AS id_b"))
    v = (jaccard_verify_pairs(docs, cand, "doc_id", "text", 3)
         .filter(F.col("jaccard") >= 0.4))
    return (v.groupBy(F.col("id_b").alias("new_id"))
            .agg(F.count("*").cast("bigint").alias("n_matches"),
                 F.max("jaccard").alias("max_jaccard")))


def main() -> None:
    spark = get_spark("canon-measure")
    for sf_dir in sys.argv[1:]:
        rec = {"sf_dir": sf_dir}
        docs = spark.read.parquet(os.path.join(sf_dir,
                                               "documents.parquet"))
        tag = _tag(sf_dir)
        canon_store = os.path.join(SCRATCH, f"canonstore_{tag}")
        full_store = os.path.join(SCRATCH, f"sigstore_{tag}")

        if not os.path.exists(os.path.join(full_store, "_SUCCESS")):
            t0 = time.time()
            build_signature_store(docs.filter(f"NOT ({IS_NEW})"),
                                  "doc_id", "text", full_store)
            rec["full_store_build_s"] = round(time.time() - t0, 2)
        if not (os.path.exists(os.path.join(canon_store, "labels",
                                            "_SUCCESS"))
                and os.path.exists(os.path.join(canon_store, "sigs",
                                                "_SUCCESS"))):
            t0 = time.time()
            rep = build_canonical_state(docs.filter(f"NOT ({IS_NEW})"),
                                        "doc_id", "text", canon_store)
            rec["canon_state_build_s"] = round(time.time() - t0, 2)
            rec.update(rep)

        halves = {"full": IS_NEW,
                  "half": f"({IS_NEW}) AND pmod(doc_id, 2) = 0"}
        for name, pred in halves.items():
            batch = docs.filter(pred)
            rec[f"n_new_{name}"] = batch.count()
            for mode in ("member", "canon"):
                for run in ("cold", "warm"):
                    t0 = time.time()
                    if mode == "member":
                        out = member_verify(spark, full_store, docs,
                                            docs.filter(pred))
                    else:
                        out = (probe_canonical_state(
                            spark, canon_store, docs, docs.filter(pred),
                            "doc_id", "text")
                            .groupBy("new_id")
                            .agg(F.count("*").cast("bigint")
                                 .alias("n_matched_clusters"),
                                 F.max("jaccard").alias("max_jaccard")))
                    n = out.count()
                    rec[f"{mode}_{name}_{run}_s"] = round(
                        time.time() - t0, 2)
                    rec[f"{mode}_{name}_rows"] = n
                    spark.catalog.clearCache()
        with open("/tmp/canon_measure.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
