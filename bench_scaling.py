"""Scaling-efficiency evidence (north rule: throughput efficiency
>= 0.8 from N to 4N executors; sandbox stand-in = local[N] vs
local[4N] on the same input).

Measurement problem this protocol solves: the sandbox host's CPU share
swings 2-3x over tens of minutes (identical builds measured 52s and
163s; a sequential A/B once measured local[8] SLOWER than local[32] by
10x because the 8-core runs landed in a throttled phase). Wall-clock
comparisons taken at different times are therefore meaningless here.

Protocol (per N->4N pair):
- both levels run SIMULTANEOUSLY, each pinned with ``taskset -c`` to a
  DISJOINT set of physical CPUs (lscpu: 32 cores, 1 thread/core), so
  they cannot contend with each other while any host-level throttling
  hits both equally (common-mode) and cancels in the ratio;
- each level is a fresh JVM that first runs an untimed warmup build
  (spawns+warms one Python worker per core — clusters amortize worker
  spawn the same way), then repeats timed build+query cycles until a
  shared wall-clock deadline and reports its best cycle;
- efficiency = (docs_per_sec_high / docs_per_sec_low) / 4, computed
  within the same wall window;
- two independent pairs (2->8 and 4->16, disjoint CPU budgets of 10
  and 20 cores) double-check each other;
- a sequential local[32] point is reported separately: 8+32 cannot be
  pinned disjointly on 32 cores, and a pure-python spin curve shows
  the host grants only ~20-22x single-core aggregate, so the 32-core
  number is a host-share ceiling observation, not plan scalability.

Usage: python bench_scaling.py [n_docs] [deadline_s] [--skip-32]
Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

CHILD = """
import json, sys, tempfile, shutil, time, os
from elasticsearch_osmosis_plugin_spark.config import EngineConfig
from elasticsearch_osmosis_plugin_spark.corpus import generate_corpus_df
from elasticsearch_osmosis_plugin_spark.operators.query import Searcher
from elasticsearch_osmosis_plugin_spark.plans.build import build_index
from elasticsearch_osmosis_plugin_spark.session import get_session

cpus = int(sys.argv[1]); n_docs = int(sys.argv[2]); deadline_s = float(sys.argv[3])
# shuffle partitions scale with corpus size past ~8M docs (bounded
# per-partition posting state — the same knob a real cluster tunes;
# identical to the old cpus value at every <=4M protocol point) and
# the single local-mode JVM gets a heap sized for the 40M-doc
# dictionary (the code corpus's vocabulary grows with n_docs via the
# per-doc id tokens, so dictionary persist scales with corpus size).
shuffle_p = max(cpus, n_docs // 500_000)
# Big-corpus knobs apply ONLY past 8M docs so the <=4M protocol
# points keep the round-2..4 environment bit-for-bit (12 g heap, no
# forced GC): (a) 48 g heap for the n_docs-proportional dictionary;
# (b) periodicGC at 1 min (default 30 min) — shuffle files on local
# disk are only reclaimed when the driver GC unreferences them, so
# the sequential per-group passes of a big build ACCUMULATE dead
# shuffle data under the default; 20M docs filled a ~94 GB disk
# twice in round 5 before this.
big = n_docs > 8_000_000
extra = {"spark.driver.memory": "48g" if big else "12g"}
if big:
    extra["spark.cleaner.periodicGC.interval"] = "1min"
spark = get_session(app_name=f"eosp-scale-{cpus}", master=f"local[{cpus}]",
                    shuffle_partitions=shuffle_p,
                    extra_conf=extra)
# north-rule workload: code corpus + code-aware analyzer; generated
# distributed, persisted so the build times ONLY the build.
# EOSP_CORPUS_DIR reuses an already-generated corpus (a 40M-doc
# corpus is ~27 GB / ~25 min of generation — identical content for
# the same seed, so reuse changes nothing measured); EOSP_N_GROUPS
# bounds per-pass shuffle state via the engine's own group structure
# (plans.build A11) — the knob that keeps a giant build inside a
# fixed temp-disk budget, exactly its 100 TB role.
src_reuse = os.environ.get("EOSP_CORPUS_DIR")
keep_src = bool(src_reuse)
if src_reuse:
    src = src_reuse
else:
    src = tempfile.mkdtemp(prefix="eosp_corpus_") + "/corpus"
    generate_corpus_df(spark, seed=42, n=n_docs,
                       n_partitions=64).write.parquet(src)
docs = spark.read.parquet(src)
n_groups = int(os.environ.get("EOSP_N_GROUPS", "1"))
cfg = EngineConfig(analyzer="code", n_segments=128, n_buckets=16,
                   resume=False, shuffle_partitions=shuffle_p)

# warmup: one python worker per core (never a .limit() slice — that
# collapses to one task and warms a single worker)
warm = generate_corpus_df(spark, seed=7, n=max(4000, 500 * cpus),
                          n_partitions=2 * cpus)
warm_idx = tempfile.mkdtemp(prefix="eosp_warm_") + "/index"
build_index(spark, warm, warm_idx, cfg, n_groups=1)
shutil.rmtree(os.path.dirname(warm_idx), ignore_errors=True)

# signal readiness and wait for the shared go-file so both levels'
# timed windows coincide (common-mode host throttling)
ready_f, go_f = sys.argv[4], sys.argv[5]
open(ready_f, "w").close()
while not os.path.exists(go_f):
    time.sleep(0.05)

def cpu_ns():
    # container-wide CPU actually DELIVERED (steal-immune): cumulative
    # cpuacct; meaningful per-build only when nothing else runs
    try:
        with open("/sys/fs/cgroup/cpuacct/cpuacct.usage") as f:
            return int(f.read())
    except OSError:
        return 0

def steal_ticks():
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])  # host steal, all vcpus
    except (OSError, IndexError):
        return 0

queries = ["getIndexBuffer", "public static void", "id0042 id0007",
           "doc_term posting merge", "id1999"]
t_end = time.time() + deadline_s
best_build = best_query = None
cycles = []
while True:
    idx = tempfile.mkdtemp(prefix="eosp_scale_") + "/index"
    c0, s0, t0 = cpu_ns(), steal_ticks(), time.time()
    meta = build_index(spark, docs, idx, cfg, n_groups=n_groups)
    build_s = time.time() - t0
    cycles.append({"build_s": round(build_s, 2),
                   "cpu_s": round((cpu_ns() - c0) / 1e9, 1),
                   "steal_s": round((steal_ticks() - s0) / 100.0, 1)})
    searcher = Searcher(spark, idx)
    t0 = time.time()
    for q in queries:
        searcher.topk(q, k=10).collect()
    query_s = time.time() - t0
    searcher.close()
    if best_build is None or build_s < best_build:
        best_build, best_meta = build_s, meta
    if best_query is None or query_s < best_query:
        best_query = query_s
    shutil.rmtree(os.path.dirname(idx), ignore_errors=True)
    if time.time() >= t_end:
        break
if not keep_src:
    shutil.rmtree(os.path.dirname(src), ignore_errors=True)
print(json.dumps({"cpus": cpus, "n_docs": n_docs, "build_s": best_build,
                  "docs_per_sec": n_docs / best_build,
                  "query_suite_s": best_query, "cycles": len(cycles),
                  "cycle_detail": cycles,
                  "cpu_s_min": min(c["cpu_s"] for c in cycles),
                  "stages": {m["stage"]: round(m["wall_s"], 2)
                             for m in best_meta["metrics"]}}))
"""

HERE = os.path.dirname(os.path.abspath(__file__))


def _spawn(cpu_list: str, cpus: int, n_docs: int, deadline_s: float,
           ready_f: str, go_f: str) -> subprocess.Popen:
    # child stderr to a per-level file (Spark progress noise, and the
    # only diagnostic when a child dies — a silent DEVNULL cost a 40M
    # OOM run a full window in round 5)
    errf = open(os.path.join(tempfile.gettempdir(),
                             f"eosp_scale_child_{cpus}.err"), "w")
    return subprocess.Popen(
        ["taskset", "-c", cpu_list, sys.executable, "-c", CHILD,
         str(cpus), str(n_docs), str(deadline_s), ready_f, go_f],
        stdout=subprocess.PIPE, stderr=errf, text=True,
        cwd=HERE)


def run_pair(n_low: int, n_high: int, low_set: str, high_set: str,
             n_docs: int, deadline_s: float) -> dict:
    """Run both levels simultaneously on disjoint pinned CPU sets;
    release them into their timed windows together."""
    import tempfile

    d = tempfile.mkdtemp(prefix="eosp_sync_")
    r_lo, r_hi = os.path.join(d, "r_lo"), os.path.join(d, "r_hi")
    go = os.path.join(d, "go")
    p_lo = _spawn(low_set, n_low, n_docs, deadline_s, r_lo, go)
    p_hi = _spawn(high_set, n_high, n_docs, deadline_s, r_hi, go)
    while not (os.path.exists(r_lo) and os.path.exists(r_hi)):
        if p_lo.poll() is not None or p_hi.poll() is not None:
            raise RuntimeError("scaling child died before ready")
        time.sleep(0.2)
    open(go, "w").close()
    lo = json.loads(p_lo.communicate()[0].strip().splitlines()[-1])
    hi = json.loads(p_hi.communicate()[0].strip().splitlines()[-1])
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (n_high / n_low)
    return {"low": lo, "high": hi, "pair": f"{n_low}->{n_high}",
            "scaling_efficiency": round(eff, 3)}


def run_solo(cpus: int, n_docs: int, deadline_s: float) -> dict:
    import tempfile

    d = tempfile.mkdtemp(prefix="eosp_sync_")
    r, go = os.path.join(d, "r"), os.path.join(d, "go")
    p = _spawn("0-31", cpus, n_docs, deadline_s, r, go)
    while not os.path.exists(r):
        if p.poll() is not None:
            raise RuntimeError("scaling child died before ready")
        time.sleep(0.2)
    open(go, "w").close()
    return json.loads(p.communicate()[0].strip().splitlines()[-1])


def _spin(_):
    t = time.time()
    x = 0
    while time.time() - t < 1.5:
        x += 1
    return x


def spin_baseline() -> dict:
    """Pure-python CPU saturation curve of THIS box (hardware/host
    ceiling evidence for the 32-core point)."""
    import multiprocessing

    spin = _spin  # module-level fn: picklable for Pool workers
    out = {}
    for n in (1, 2, 8, 32):
        with multiprocessing.Pool(n) as p:
            total = sum(p.map(spin, range(n)))
        out[n] = total
    return out


def solo_point(n_docs: int, cpus: int, deadline_s: float) -> int:
    """One solo work-constancy point at a bigger corpus (the VERDICT
    r2 #8 scale-up decade: the 100 TB claim should not extrapolate
    from 400k docs alone). Runs the level ALONE, appends a section to
    BENCH/BASELINE.md with cpu-s and ms/doc so the work-constancy
    table extends across corpus sizes, not just parallelism levels."""
    s = run_solo(cpus, n_docs, deadline_s)
    ms_doc = s["cpu_s_min"] / n_docs * 1000.0
    util = s["cpu_s_min"] / (s["build_s"] * cpus)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(f"""
## Scale-up point: {n_docs:,} docs at local[{cpus}] (solo)

| n_docs | level | best wall s | docs/sec | min cpu-s/build | cpu ms/doc | utilization | query suite s |
|---|---|---|---|---|---|---|---|
| {n_docs:,} | local[{cpus}] | {s['build_s']:.1f} | {s['docs_per_sec']:.0f} | {s['cpu_s_min']:.0f} | {ms_doc:.2f} | {util:.2f} | {s['query_suite_s']:.2f} |

cpu ms/doc at this corpus vs the work-constancy table's smaller
corpus extends the constancy evidence a decade in DATA size: flat
per-doc CPU across both corpus size and parallelism is the
steal-immune restatement of the north rule's N->4N criterion.
Per-stage walls: {json.dumps(s['stages'])}
Raw: `{json.dumps({k: v for k, v in s.items() if k != 'cycle_detail'})}`
cycles: `{json.dumps(s['cycle_detail'])}`
""")
    print(json.dumps({"n_docs": n_docs, "cpus": cpus,
                      "build_s": s["build_s"], "cpu_s_min": s["cpu_s_min"],
                      "cpu_ms_per_doc": round(ms_doc, 3),
                      "utilization": round(util, 3)}))
    return 0


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if args else 200_000
    deadline_s = float(args[1]) if len(args) > 1 else 360.0
    skip32 = "--skip-32" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--solo-point="):
            return solo_point(n_docs, int(a.split("=")[1]), deadline_s)

    spin = spin_baseline()
    pair_2_8 = run_pair(2, 8, "0-1", "8-15", n_docs, deadline_s)
    pair_4_16 = run_pair(4, 16, "0-3", "8-23", n_docs, deadline_s)
    solo32 = None if skip32 else run_solo(32, n_docs, deadline_s / 3)

    # work-constancy solos (steal-immune scalability evidence): each
    # level alone in the container; cpu_s per build must stay flat as
    # parallelism grows, or the plan has contention overhead
    solo2 = run_solo(2, n_docs, deadline_s / 2)
    solo8 = run_solo(8, n_docs, deadline_s / 3)

    result = {"pairs": [pair_2_8, pair_4_16], "solo32": solo32,
              "solos": {"2": solo2, "8": solo8, "32": solo32},
              "n_docs": n_docs, "deadline_s": deadline_s,
              "spin_iters": spin,
              "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    print(json.dumps(result))

    spin_eff_8_32 = (spin[32] / spin[8]) / 4
    os.makedirs("BENCH", exist_ok=True)

    def row(tag, r):
        return (f"| {tag} | {r['build_s']:.2f} | {r['docs_per_sec']:.0f} | "
                f"{r['query_suite_s']:.2f} | {r['cycles']} |\n")

    rows = ""
    for p in result["pairs"]:
        rows += row(f"local[{p['low']['cpus']}] (pinned, concurrent)", p["low"])
        rows += row(f"local[{p['high']['cpus']}] (pinned, concurrent)", p["high"])
    if solo32:
        rows += row("local[32] (solo, host-share ceiling)", solo32)

    cpu2 = solo2["cpu_s_min"]
    work_rows = ""
    for n, s in result["solos"].items():
        if s is None:
            continue
        u = s["cpu_s_min"] / (s["build_s"] * int(n))
        work_rows += (f"| local[{n}] | {s['build_s']:.2f} | {s['cpu_s_min']:.0f} | "
                      f"{s['cpu_s_min'] / cpu2:.2f}x | {u:.2f} |\n")

    gen = (f"""<!-- raw-scaling-begin (machine-written; curated sections
     above/below survive reruns) -->

## Why two protocols

This sandbox's CPU share is host-throttled and swings 2-3x over
minutes, with starvation episodes up to 40x (measured; /proc/stat
shows thousands of seconds of steal). Wall-clock A/B between runs
taken at different times is meaningless here, so the evidence is:

1. **Pinned concurrent pairs** (wall-clock): both levels of each
   N->4N pair run SIMULTANEOUSLY in separate JVMs pinned (taskset) to
   disjoint physical CPU sets, released into a shared {deadline_s:.0f}s
   window after an untimed per-core worker warmup; each reports its
   best cycle. Host throttling is common-mode — but an episode can
   still starve one side's window, so single pair numbers carry noise.
2. **Work constancy** (steal-immune): each level runs ALONE and
   measures CPU actually delivered per build (cgroup cpuacct). CPU
   time is unaffected by steal. A plan scales iff its total CPU work
   stays flat as parallelism grows (no contention/coordination
   inflation) and utilization stays high; wall-clock then follows on
   any un-throttled cluster.

## Pinned concurrent pairs

| parallelism | build s | docs/sec | query suite s | cycles |
|---|---|---|---|---|
{rows}
- scaling efficiency 2->8 (wall, same window): {result['pairs'][0]['scaling_efficiency']}
- scaling efficiency 4->16 (wall, same window): {result['pairs'][1]['scaling_efficiency']}

## Work constancy (steal-immune)

| level | best wall s | min cpu-s/build | work vs local[2] | utilization |
|---|---|---|---|---|
{work_rows}
Flat CPU work across levels means the plan adds no contention
overhead as parallelism grows — the north-rule scaling criterion
restated in a steal-resistant metric. Caveats on reading the table:
the cgroup counter includes JVM GC/daemon threads (background burn
grows with core count) and is distorted by host frequency scaling
(identical builds can differ several-fold in cpu-s — see cycle
detail), so the per-level MIN is reported and higher-level values are
upper bounds; cpu_s recorded during pair windows sums BOTH concurrent
children and is not per-level (ignore it; only solo cpu_s is valid).

Host ceiling evidence (pure-python spin, no Spark): iterations by
process count {json.dumps(spin)} — aggregate saturates well below 32x
single-core; max possible 8->32 wall efficiency for ANY CPU-bound
code here is ~{spin_eff_8_32:.2f}. The solo local[32] row is a
host-share ceiling observation, not plan scalability.

Per-stage walls (best cycle): 2={json.dumps(result['pairs'][0]['low']['stages'])}
8={json.dumps(result['pairs'][0]['high']['stages'])}
16={json.dumps(result['pairs'][1]['high']['stages'])}

Raw: `{json.dumps(result)}`

<!-- raw-scaling-end -->
""")
    path = "BENCH/BASELINE.md"
    cur = open(path).read() if os.path.exists(path) else ""
    b, e = cur.find("<!-- raw-scaling-begin"), cur.find("<!-- raw-scaling-end -->")
    if b != -1 and e != -1:
        # replace ONLY the machine section; curated analysis survives
        cur = cur[:b] + gen + cur[e + len("<!-- raw-scaling-end -->\n"):]
    elif cur:
        cur = cur.rstrip() + "\n\n" + gen
    else:
        cur = "# BENCH/BASELINE — measured engine numbers\n\n" + gen
    with open(path, "w") as f:
        f.write(cur)
    return 0


if __name__ == "__main__":
    sys.exit(main())
