"""Round-14 l7_knn_classify guard-cost A/B.

The round-14 sf10 subset re-sweep read l7_knn at 2.24x (engine 1.47 s
vs its 1.08 s round-13 reading) in a window where x23's engine side
also doubled and l3_batch — which shares BOTH round-14 code changes
(the zero-norm query guard and the pyarrow schema pin) — improved
(1.48x -> 1.41x). Ambient by signature, but the changed-row rule says
isolate the diff by measurement: arm A = current code; arm B = the
same query with both round-14 guards monkeypatched out. Interleaved
alternating runs in ONE session, identity-gated (both arms' results
must be equal).

Usage:  python scripts/l7_guard_ab.py [rounds]
Writes scripts/l7_guard_ab_out.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(ROOT, "benchdata", "sf10")
OUT = os.path.join(ROOT, "scripts", "l7_guard_ab_out.json")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from kompactor_spark.operators import simsearch as S
    from kompactor_spark.queries import all_queries, llm_pipeline as L
    from kompactor_spark.session import get_spark

    spark = get_spark("l7-guard-ab")
    fn = all_queries()["l7_knn_classify"]

    # Arm B bypass: schema-pin-free fetch (S imported for parity with
    # the graded path's module load, not patched — see note below).
    assert S.batch_cosine_candidates is not None
    real_fetch = L._query_vec_batch

    def fetch_noassert(sf_dir, hi=8):
        import pyarrow.dataset as ds

        data = ds.dataset(os.path.join(sf_dir, "embeddings.parquet"), format="parquet")
        t = data.to_table(columns=["vec_id", "embedding"], filter=ds.field("vec_id") < hi)
        return [
            (int(i), [float(x) for x in v])
            for i, v in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
        ]

    def run_arm(bypass: bool):
        if bypass:
            L._query_vec_batch = fetch_noassert
        try:
            t0 = time.perf_counter()
            pdf = fn(spark, SF10).toPandas()
            dt = time.perf_counter() - t0
        finally:
            L._query_vec_batch = real_fetch
        return dt, pdf

    # warm-up + identity gate
    _, a = run_arm(False)
    _, b = run_arm(True)
    pa = a.sort_values(list(a.columns)).reset_index(drop=True)
    pb = b.sort_values(list(b.columns)).reset_index(drop=True)
    assert pa.equals(pb), "arms diverge — A/B invalid"

    ta, tb = [], []
    for _ in range(rounds):
        ta.append(run_arm(False)[0])
        tb.append(run_arm(True)[0])
    res = {
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "identity_gate": "pass",
        "guards_on_median_sec": round(statistics.median(ta), 3),
        "guards_off_median_sec": round(statistics.median(tb), 3),
        "guards_on_runs": [round(x, 3) for x in ta],
        "guards_off_runs": [round(x, 3) for x in tb],
        "note": (
            "arm B removes the round-14 pyarrow schema pin; the zero-norm "
            "query check is a pure-python loop over 8x64 floats (sub-ms, "
            "not separable at this grain). If the arms tie, the 2.24x "
            "sweep reading was window drift, not the diff."
        ),
    }
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
