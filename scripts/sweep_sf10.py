"""sf10 full-registry engine sweep — the scale-pathology hunter.

perf_smoke.py sweeps every query at sf1; this is the same discipline
one decade further out (benchdata/sf10: 100x the grading corpus/history
on fixed hardware), engine-side only, one timed run per query. Its
round-8 first run found SIX real defects the smaller scales hid —
quadratic-in-history joins (x9), low-cardinality window funnels
(a9c/a25), an O(hours²) running-distinct (w5), an 819M-row decimal
self-join (l7g), a 2.5e9-call containment BNLJ (l6_decontaminate) —
plus one ungraceful death (l5_phash_neardup, now a loud pair-bound
guard). See SCALE.md §"round-8 sf10 sweep" for the findings table.

Protocol: full materialization through a parquet sink (never a driver
collect — j14-class expansion outputs reach 60-140M rows), resumable
via the JSONL output (re-run to continue; delete a row to re-measure).
Raw raw-pairwise dedup rows are skipped BY DESIGN: on the
100x-replicated corpus their exact candidate bounds are ~1e10 (their
collapse-first twins ARE swept; the guards that make them fail loudly
are tested at smaller scales).

Usage: python scripts/sweep_sf10.py   (expects benchdata/sf10 — run
scripts/bench_sf10.py once to generate; writes sweep_sf10_out.jsonl)
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(ROOT, "benchdata", "sf10")
OUT = os.path.join(ROOT, "scripts", "sweep_sf10_out.jsonl")
# per-invocation sink: concurrent sweeps (or another tool on a fixed
# path) must not overwrite each other between write and verify (ADVICE r8)
SINK = f"/tmp/sweep_sink_{os.getpid()}.parquet"
SKIP = {
    # raw pairwise dedup on a 100x-replicated corpus: candidate bounds
    # ~1e10 by construction (documented infeasible-by-design; the
    # collapse-first twins are the scale path and ARE swept)
    "l2_containment_pairs", "l2_jaccard_pairs", "l2_dedup_clusters",
    "l2_edit_distance_pairs", "l2_tfidf_cosine_pairs", "l2_embedding_neardup",
    "l2_semantic_dedup", "l2_simhash_pairs",
    # l2_minhash_lsh boundary MEASURED round 9 (VERDICT r8 #4): the
    # wrapper's hash-bucket candidate bound is 4.51e7 pairs at sf1
    # (completed, 92 s) but 4.58e9 at sf10 — the exact x100
    # multiplicity-quadratic growth of the replicated corpus, in the
    # disk-filling class (raw containment's 1.04e10 bound filled 79 GB).
    # approxSimilarityJoin exposes no pre-join bound/cap, which is WHY
    # minhash_band_pairs (explicit banding + exact _guard_pairs bound)
    # is the scale path; the wrapper stays recall-baseline-only.
    "l2_minhash_lsh", "l2_minhash_banded",
    # measured separately in BENCH_SF10.json (87 s, in-family)
    "l3i_ivf_pq_topk",
}


def main() -> None:
    done = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            done.add(json.loads(line)["name"])

    from kompactor_spark.queries import all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark("sweep-sf10")
    qs = all_queries()
    names = [n for n in qs if n not in SKIP and n not in done]
    print(f"{len(names)} to go", flush=True)
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, DST)
            # full materialization without driver collection (the
            # LARGE_RESULT protocol): expansion outputs are 60M+ rows
            df.write.mode("overwrite").parquet(SINK)
            n = spark.read.parquet(SINK).count()
            rec = {"name": name, "sec": round(time.time() - t0, 2), "rows": n}
        except Exception as ex:
            rec = {"name": name, "sec": round(time.time() - t0, 2), "err": repr(ex)[:200]}
        shutil.rmtree(SINK, ignore_errors=True)
        with open(OUT, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(rec, flush=True)
    print("SWEEP-DONE", flush=True)


if __name__ == "__main__":
    main()
