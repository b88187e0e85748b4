#!/usr/bin/env python3
"""Standing scaling gate — re-runs the SCALING.md soak representatives at
sf0.1 and sf1 and FAILS if any sublinear-group query's measured scaling
exponent exceeds its pinned round-11 value by more than the noise margin.

exp = log10(t_sf1 / t_sf0.1); 0 = flat, 1 = linear in rows. The pinned
values are the r11 measurements (SCALING.md); EPS absorbs harness noise
(the per-family bench's residual same-commit spread is ~30%, which is
~0.11 in exponent — 0.15 gives headroom without hiding a real regression:
a sublinear query drifting to linear moves 0.3+).

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
EPS = 0.15

# Pinned r11 exponents (SCALING.md table) for the gated representatives.
PINNED = {
    "q04_join_large": -0.05,
    "q02_agg": 0.37,
    "q30_dedup_exact": 0.25,
    "q31_dedup_minhash": 0.66,
    "q55_tfidf_keywords": 0.68,
    "q86_block_dedup": 0.86,
    "q118_triangles": 0.42,
    "q121_bfs_hops": 0.24,
    "q122_pagerank": 0.19,
    "q128_semdedup_e2e": 1.03,
    "q210_star_mv": 0.19,
    "q224_star_mv_mor": 0.27,
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
               SPARK_GRAFT_BENCH_DETAIL=detail)
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
    return qs


def main():
    update = "--update-scaling" in sys.argv
    ensure_sf1()
    t01 = bench(SF01, "/tmp/soak_sf01.json")
    t1 = bench(SF1, "/tmp/soak_sf1.json")
    rows, failures = [], []
    for q in sorted(PINNED):
        exp = math.log10(t1[q] / t01[q])
        limit = PINNED[q] + EPS
        ok = exp <= limit
        rows.append((q, t01[q], t1[q], exp, PINNED[q], ok))
        if not ok:
            failures.append(f"{q}: exp {exp:.2f} > pinned {PINNED[q]:.2f} + {EPS}")
    print(f"{'query':28} {'sf0.1':>8} {'sf1':>8} {'exp':>6} {'pin':>6}  ok")
    for q, a, b, e, p, ok in rows:
        print(f"{q:28} {a:8.2f} {b:8.2f} {e:6.2f} {p:6.2f}  {'OK' if ok else 'FAIL'}")
    out = {q: {"sf01": a, "sf1": b, "exp": round(e, 3), "pinned": p, "ok": ok}
           for q, a, b, e, p, ok in rows}
    with open("/tmp/soak_gate.json", "w") as f:
        json.dump(out, f, indent=1)
    if update:
        lines = ["", "<!-- soak_gate.py re-run -->",
                 "| query | sf0.1 s | sf1 s | exp | pinned r11 | within +0.15 |",
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
