"""Round-15 end-of-round forensics: the first full-budget bench window
read l2_containment_collapsed at 3.07 s (ratio 4.6x) — ~3x the driver's
r14 reading and ~2x the same-hour isolated A/B's arrow arm — while
every other row sat a uniform 8-25% above its r14 value (ordinary
ambient). Hypothesis tested here: in-session pollution (JVM heap / page
cache / reused Python workers after the 12 preceding heavy rows).

Result (2026-08-17T19:5xZ, idle VM):
    alone:       [1.72, 1.62, 1.11]  median 1.62
    after-heavy: [2.14, 1.11, 1.56]  median 1.56
No pollution — the row times the same before and after the heavy rows,
so the 3.07 s was a transient ambient patch during that bench minute
(this VM's documented 2-6x swings). The second full-budget window
(r15_endofround_bench_w2.json) read the row at 1.80 s, and the second
interleaved boundary A/B in the same hour
(r15_pairs_boundary_ab_out_w2.json) re-confirmed arrow < pandas
(1.45 vs 3.08 s medians) inside the inflated window.
"""

import os, sys, time, statistics
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
from kompactor_spark.queries import all_queries
from kompactor_spark.session import get_spark
import shutil, tempfile

SF1 = "/root/repo/benchdata/sf1"
spark = get_spark("r15-context-probe")
regs = all_queries()
fn = regs["l2_containment_collapsed"]

def t_full():
    t0 = time.perf_counter()
    pdf = fn(spark, SF1).toPandas()
    assert len(pdf) >= 0
    return time.perf_counter() - t0

def sink(name):
    df = regs[name](spark, SF1)
    out = os.path.join(tempfile.gettempdir(), "probe_sink.parquet")
    df.write.mode("overwrite").parquet(out)
    shutil.rmtree(out, ignore_errors=True)

# Phase 1: containment alone (fresh session)
t_full()  # warm-up
alone = [t_full() for _ in range(3)]
print("alone:", [round(x,2) for x in alone], "median", round(statistics.median(alone),2), flush=True)

# Phase 2: run the heavy preceding bench rows once
for n in ("g3_pagerank","l7g_pca_power"): regs[n](spark, SF1).toPandas()
for n in ("j19_nearest_value_join","j14_binned_interval_join"): sink(n)
for n in ("m11_basket_lift","l4_crossdoc_ngram_share","l2_dedup_clusters_collapsed"): regs[n](spark, SF1).toPandas()
print("heavy rows done", flush=True)

after = [t_full() for _ in range(3)]
print("after-heavy:", [round(x,2) for x in after], "median", round(statistics.median(after),2), flush=True)
spark.stop()
