#!/usr/bin/env python3
"""Standing scaling gate — re-runs the SCALING.md soak representatives at
sf0.1 and sf1 and FAILS if any sublinear-group query's measured scaling
exponent exceeds its pinned round-11 value by more than the noise margin.

exp = log10(t_sf1 / t_sf0.1); 0 = flat, 1 = linear in rows. An exponent
is a RATIO of two measurements, so timing noise doubles into it:
single-shot runs on this box swing +-40% (measured in r12 — back-to-back
same-session sf1 triples spread 2.3x, e.g. q02 [12.97, 5.71, 7.99]),
which is +-0.3 of exponent — any gate on single shots fires falsely.
The gate therefore forces 3 runs per query (SPARK_GRAFT_MEDIAN3=all)
and computes each side from the MINIMUM of the triple (the standard
robust estimator: the min is the run least taxed by GC/page-cache
spikes, and regressions move the min, noise does not). Margin EPS=0.2
over the pinned min-of-3 exponents — a sublinear query drifting to
linear moves +0.3..0.6 and still fails — plus an absolute backstop:
exp > ABS_MAX means quadratic-drift regardless of what was pinned.

The pins are re-recorded per round with --update-scaling so the
comparison is same-methodology, same-hardware-era (the r11 single-shot
pins were measured in a different harness context and are not
comparable; SCALING.md keeps both tables).

The sf1 corpus is generated deterministically (dev/gen_sf.py, fixed seed)
into /tmp/graft_sf1 when absent, so the gate is reproducible anywhere the
driver corpus exists. The pair-bound family (q39/q163/q177/q32/q40) is
deliberately NOT gated: its unit is candidate pairs, its sf1 cost is
minutes per query, and PairBudget now guards it at run time — the gate
watches the families whose exponent is a PLAN property.

Usage: python3 dev/soak_gate.py [--update-scaling]
Exit 0 = all within margin; 1 = regression; 2 = harness failure.
"""
import json, math, os, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/graft_sf1"
EPS = 0.2
ABS_MAX = 1.5  # no gated (sublinear-group) query may drift pair-bound

# Pinned min-of-3 exponents, re-recorded per round (r12 values; the r11
# single-shot table in SCALING.md used a different methodology).
PINNED = {
    "q04_join_large": -0.18,
    "q02_agg": 0.59,
    "q30_dedup_exact": 0.16,
    "q31_dedup_minhash": 0.85,
    "q55_tfidf_keywords": 0.77,
    "q86_block_dedup": 0.80,
    "q118_triangles": 0.49,
    "q121_bfs_hops": 0.18,
    "q122_pagerank": 0.35,
    # q128 deliberately FIXES k=8, so its pair mass follows the n^2/k
    # law — the superlinear envelope the operator family documents; its
    # timing is also multi-modal on this box (same-commit sf1 min-of-3
    # read 39s in r12 and 90s in r13 on identical data). Pinned at the
    # r13 measurement; q264 below is the scale-correct adaptive-k twin
    # (constant cell size -> ~linear) and is the production shape.
    "q128_semdedup_e2e": 1.41,
    "q264_semdedup_auto": 0.79,
    "q210_star_mv": 0.27,
    "q224_star_mv_mor": 0.26,
}


def ensure_sf1():
    if os.path.exists(os.path.join(SF1, "lineitem.parquet")):
        return
    print(f"[soak] generating {SF1} via dev/gen_sf.py (deterministic, ~minutes)")
    subprocess.run([sys.executable, os.path.join(REPO, "dev", "gen_sf.py"),
                    SF1, "10"], check=True)


def bench(sfdir, detail):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sfdir,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
               SPARK_GRAFT_BENCH_DETAIL=detail,
               SPARK_GRAFT_MEDIAN3="all")
    subset = ",".join(sorted(PINNED))
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Bench {subset}'],
        cwd=REPO, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-3000:] + r.stderr[-3000:])
        sys.exit(2)
    with open(detail) as f:
        d = json.load(f)
    qs = d["queries"]
    bad = [k for k, v in qs.items() if not isinstance(v, (int, float))]
    if bad:
        sys.stderr.write(f"[soak] errored queries at {sfdir}: {bad}\n")
        sys.exit(2)
    # min of the raw triple where available (SPARK_GRAFT_MEDIAN3=all
    # records every query's runs in runs3); reported min otherwise.
    # MIN/MEDIAN DIVERGENCE ALERT (r13 advice): the min policy assumes
    # contamination is additive; a genuinely bimodal plan regression
    # inflates the median while one lucky run holds the min down. Surface
    # every query whose median sits >=1.5x (and >0.5s) above its min so
    # a masked regression is visible in the gate's own output.
    triples = d.get("runs3", d.get("median3", {}))
    for k, runs in sorted(triples.items()):
        srt = sorted(runs)
        med = srt[len(srt) // 2]
        if med >= srt[0] * 1.5 and med - srt[0] > 0.5:
            print(f"[soak] MIN/MEDIAN DIVERGENCE {k} at {sfdir}: "
                  f"min {srt[0]:.2f}s vs median {med:.2f}s (runs {runs}) — "
                  f"audit runs3 before trusting the min")
    return {k: min(triples.get(k, [v])) for k, v in qs.items()}


def main():
    update = "--update-scaling" in sys.argv
    reuse = "--reuse" in sys.argv  # regate existing /tmp detail files
    ensure_sf1()
    if reuse:
        def reread(detail):
            with open(detail) as f:
                d = json.load(f)
            triples = d.get("runs3", d.get("median3", {}))
            return {k: min(triples.get(k, [v]))
                    for k, v in d["queries"].items()
                    if isinstance(v, (int, float))}
        t01, t1 = reread("/tmp/soak_sf01.json"), reread("/tmp/soak_sf1.json")
    else:
        t01 = bench(SF01, "/tmp/soak_sf01.json")
        t1 = bench(SF1, "/tmp/soak_sf1.json")
    rows, failures = [], []
    for q in sorted(PINNED):
        exp = math.log10(t1[q] / t01[q])
        limit = min(PINNED[q] + EPS, ABS_MAX)
        ok = exp <= limit
        rows.append((q, t01[q], t1[q], exp, PINNED[q], ok))
        if not ok:
            failures.append(f"{q}: exp {exp:.2f} > min(pinned {PINNED[q]:.2f}"
                            f" + {EPS}, {ABS_MAX})")
    print(f"{'query':28} {'sf0.1':>8} {'sf1':>8} {'exp':>6} {'pin':>6}  ok")
    for q, a, b, e, p, ok in rows:
        print(f"{q:28} {a:8.2f} {b:8.2f} {e:6.2f} {p:6.2f}  {'OK' if ok else 'FAIL'}")
    out = {q: {"sf01": a, "sf1": b, "exp": round(e, 3), "pinned": p, "ok": ok}
           for q, a, b, e, p, ok in rows}
    with open("/tmp/soak_gate.json", "w") as f:
        json.dump(out, f, indent=1)
    if update:
        lines = ["", "<!-- soak_gate.py re-run -->",
                 f"| query | sf0.1 s | sf1 s | exp | pinned | within +{EPS} |",
                 "|---|---|---|---|---|---|"]
        for q, a, b, e, p, ok in rows:
            lines.append(f"| {q} | {a:.2f} | {b:.2f} | {e:.2f} | {p:.2f} | "
                         f"{'yes' if ok else 'NO'} |")
        with open(os.path.join(REPO, "SCALING.md"), "a") as f:
            f.write("\n".join(lines) + "\n")
    if failures:
        print("\n[soak] SCALING REGRESSION:\n  " + "\n  ".join(failures))
        sys.exit(1)
    print("\n[soak] all exponents within margin")


if __name__ == "__main__":
    main()
