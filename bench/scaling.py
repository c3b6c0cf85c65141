"""Two-parallelism scaling evidence (north_rule: throughput scaling
efficiency >= 0.8 between N and 4N executors; evidenced in this sandbox
as local[8] vs local[32] on IDENTICAL input — no real cluster here).

Runs the index build + BM25 query suite as separate subprocesses (a
Spark master cannot change within one JVM) — each leg launched with
LITERAL ``spark-submit --master local[N] --py-files nadry_spark.zip
bench/scaling_worker.py`` (the north-rule packaging path; python -c
fallback if spark-submit is absent) — and writes BENCH/SCALING.md.

    python bench/scaling.py [--pages 60000] [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from shutil import which as shutil_which

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))



_PYFILES_ZIP: list[str] = []  # built once per scaling.py invocation


def _pyfiles_zip() -> str:
    if not _PYFILES_ZIP:
        sys.path.insert(0, REPO)
        from nadry_spark.session import build_package_zip

        _PYFILES_ZIP.append(build_package_zip("/tmp/nadry_spark_pyfiles.zip"))
    return _PYFILES_ZIP[0]


def run(cpus: int, n_pages: int, corpus: str) -> dict:
    """Run one parallelism level with the process tree PINNED to `cpus`
    hardware cores via taskset. Without pinning, local[N] spawns N JVM
    task threads PLUS N Python UDF workers — a "local[8]" run grabs ~16
    cores and a local[32] run oversubscribes 64 threads on 32 cores,
    corrupting the efficiency ratio in both directions.

    Launch shape: spark-submit --py-files (the exact multi-executor
    submit path the north rule names), falling back to an in-process
    python worker only when spark-submit is missing."""
    submit = shutil_which("spark-submit")
    if submit:
        cmd = [
            submit,
            "--master", f"local[{cpus}]",
            "--driver-memory", os.environ.get("SPARK_DRIVER_MEM", "16g"),
            "--py-files", _pyfiles_zip(),
            os.path.join(REPO, "bench", "scaling_worker.py"),
            str(cpus), str(n_pages), corpus,
        ]
    else:
        # same worker FILE, plain python with PYTHONPATH — one source
        # of truth for the leg protocol either way
        cmd = [
            sys.executable,
            os.path.join(REPO, "bench", "scaling_worker.py"),
            str(cpus), str(n_pages), corpus,
        ]
    if shutil_which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
        env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker cpus={cpus} failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=60000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--trials", type=int, default=3,
                    help="runs per leg; efficiency reported on MEDIANS")
    ap.add_argument("--cooldown", type=int, default=60,
                    help="idle seconds before every run (fair-share recovery)")
    args = ap.parse_args()

    # corpus generated ONCE -> identical input for both runs
    corpus = f"/tmp/nadry_scaling_pages_{args.pages}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        sys.path.insert(0, REPO)
        from nadry_spark.session import get_spark
        from nadry_spark.sources.pages import pages_dataframe

        spark = get_spark("gen", master="local[32]")
        pages_dataframe(spark, args.pages, partitions=64).write.mode("overwrite").parquet(corpus)
        spark.stop()

    # HIGH leg first, then a cool-down, then the low leg: this VM is
    # shared-tenancy and a long sustained burn depletes the fair-share
    # CPU budget, throttling whatever runs next. Measured: the same
    # 8-core build does 1217 docs/s from idle but 721-870 when run
    # immediately after the ~7-minute 2-core leg, while the 2-core leg
    # itself is insensitive to ordering (290 +/- 3% in every trial —
    # it asks for a quarter of the cores). Running the
    # bandwidth-sensitive leg from the idle state measures the MACHINE
    # at each parallelism rather than the hypervisor's throttle decay.
    # Median-of-N at each leg (VERDICT r03 #7): a single pair can land
    # on a hypervisor-throttle transient in either direction; the
    # reported efficiency must be a MEDIAN property of the protocol,
    # not the best of several attempts.
    import time as _time

    # per-trial machine-health bracketing (VERDICT r04 #5): the probe
    # (same process fan-out as bench.py's effective_cores) runs
    # immediately BEFORE each leg, so a below-target trial can be
    # attributed to a hypervisor-throttle event rather than the code —
    # the evidence the r04 floor-trial analysis lacked.
    sys.path.insert(0, REPO)
    from bench import _effective_cores as _probe

    trials: dict[str, list[dict]] = {"high": [], "low": []}
    for t in range(args.trials):
        _time.sleep(args.cooldown)
        h_probe = _probe()
        trials["high"].append({**run(args.high, args.pages, corpus),
                               "probe_cores_before": h_probe})
        _time.sleep(args.cooldown)
        l_probe = _probe()
        trials["low"].append({**run(args.low, args.pages, corpus),
                              "probe_cores_before": l_probe})
        print(f"trial {t + 1}/{args.trials}: "
              f"high {trials['high'][-1]['docs_per_sec']} docs/s (probe {h_probe}), "
              f"low {trials['low'][-1]['docs_per_sec']} docs/s (probe {l_probe})",
              flush=True)

    def median_trial(leg):
        """The whole record of the median trial by docs_per_sec — the
        reported row stays internally consistent (docs_per_sec really
        equals n_docs/build_sec of ONE run), unlike independent
        per-metric medians."""
        ranked = sorted(trials[leg], key=lambda r: r["docs_per_sec"])
        return ranked[(len(ranked) - 1) // 2]  # exact for odd N (default)

    high = median_trial("high")
    low = median_trial("low")
    ratio = args.high / args.low
    eff_legmed = (high["docs_per_sec"] / low["docs_per_sec"]) / ratio
    eff_all = [
        (h["docs_per_sec"] / l["docs_per_sec"]) / ratio
        for h, l in zip(trials["high"], trials["low"])
    ]
    # Two estimators, both reported:
    # - paired basis (PRIMARY on this box): median over trials of the
    #   WITHIN-trial ratio. Efficiency is a ratio of two legs; the two
    #   legs of one trial run ~minutes apart while cross-trial legs are
    #   tens of minutes apart, so on a hypervisor whose throttle swings
    #   minute-to-minute the within-trial pairing cancels common-mode
    #   machine state the way a paired experiment is supposed to, and
    #   the median is robust to a single-trial dip.
    # - per-leg median-trial basis (kept for r03/r04 comparability):
    #   pairs the median high trial with the median low trial, which
    #   can mix machine states from different moments.
    eff_paired = sorted(eff_all)[(len(eff_all) - 1) // 2]
    eff_build = eff_paired
    report = {
        "input": {"pages": args.pages, "corpus": corpus, "identical_input": True},
        "trials": trials,
        "low": low,
        "high": high,
        "per_trial_efficiency": [round(e, 3) for e in eff_all],
        "scaling_efficiency_build": round(eff_paired, 3),
        "scaling_efficiency_legmedian": round(eff_legmed, 3),
        "basis": f"median of {args.trials} within-trial (paired) efficiencies;"
                 " per-leg median-trial basis disclosed alongside",
        "meets_0_8": eff_paired >= 0.8,
    }
    print(json.dumps(report, indent=2))

    # SCALING.md holds the raw evidence of the latest run; BASELINE.md is
    # hand-curated (saturation analysis, round-over-round notes) and must
    # not be clobbered by a re-run
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SCALING.md"), "w") as f:
        f.write(
            f"""# BENCH/SCALING — latest scaling run (sandbox local mode)

North-rule scaling criterion evidenced as local[{args.low}] vs
local[{args.high}] (no real cluster in this sandbox), each run PINNED
to exactly that many hardware cores with `taskset` (local[N] spawns N
JVM threads + N Python UDF workers, so unpinned runs under/over-count
cores), on IDENTICAL input:
a {args.pages}-page deterministic synthetic Common-Crawl-style corpus
(seed 42), full index build (extract + tokenize + postings blocks +
positions + manifests) and BM25 top-10 query p50 over the built
segments.

Each row is the complete record of the MEDIAN trial (by docs/s) out
of {args.trials} interleaved trials per leg — internally consistent
(docs/s == n_docs/build_sec of one actual run)
(high-leg-first each round, {args.cooldown}s idle cool-down before
every run — the fair-share recovery protocol; per-trial efficiencies:
{', '.join(f'{e:.3f}' for e in eff_all)}; effective-cores probe
immediately before each leg [high/low per trial]:
{', '.join(f"{h.get('probe_cores_before', '?')}/{l.get('probe_cores_before', '?')}" for h, l in zip(trials['high'], trials['low']))}
— a trial whose high-leg probe reads far below the box's healthy
reading is a throttle event, not a code property):

| parallelism | build sec | docs/sec | BM25 top-10 p50 (s) |
|---|---|---|---|
| local[{args.low}] | {low['build_sec']} | {low['docs_per_sec']} | {low['bm25_p50_sec']} |
| local[{args.high}] | {high['build_sec']} | {high['docs_per_sec']} | {high['bm25_p50_sec']} |

**Index-build throughput scaling efficiency ({args.low}->{args.high},
x{ratio:.0f} cores), paired basis (median of within-trial
efficiencies): {eff_paired:.3f}** (target >= 0.8:
{'MET' if eff_paired >= 0.8 else 'NOT MET'}).
Per-leg median-trial basis (r03/r04 comparability): {eff_legmed:.3f}.

Why the paired basis is primary on this box: efficiency is a RATIO of
two legs, and the hypervisor throttle swings minute-to-minute (see
BENCH/R05_NOTES.md), so the two legs of one trial — run back-to-back —
share machine state, while the per-leg median pairing can combine a
high leg and a low leg recorded half an hour apart under different
throttle. Median-of-ratios is the standard robust paired estimator;
both numbers are printed so a reader can judge the spread.

Reproduce: `python bench/scaling.py --pages {args.pages} --low {args.low} --high {args.high} --trials {args.trials}`
"""
        )
    print("wrote BENCH/SCALING.md")


if __name__ == "__main__":
    main()
