#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
given sf dir, then run each oracle SQL in DuckDB over the same tables and
compare (rows, schema-ish, values) after sorting rows and columns."""
import duckdb, json, math, os, subprocess, sys, glob

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = sys.argv[3].split(",") if len(sys.argv) > 3 else None
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("SKIP_VERIFY") != "1":
    opens = ["java.base/java.lang","java.base/java.lang.invoke","java.base/java.lang.reflect",
             "java.base/java.io","java.base/java.net","java.base/java.nio","java.base/java.util",
             "java.base/java.util.concurrent","java.base/java.util.concurrent.atomic",
             "java.base/sun.nio.ch","java.base/sun.nio.cs","java.base/sun.security.action",
             "java.base/sun.util.calendar"]
    cmd = ["java"] + [f"--add-opens={p}=ALL-UNNAMED" for p in opens] + [
        "-Xmx8g","-Duser.timezone=UTC","-Dspark.ui.enabled=false",
        "-cp", f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*",
        "graft.Verify", SF, OUT] + ([",".join(ONLY)] if ONLY else [])
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line: print(line)
    if r.returncode != 0:
        print("VERIFY FAILED"); print(r.stderr[-3000:]); sys.exit(1)

con = duckdb.connect()
for p in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(p).replace(".parquet","")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
names = sorted(os.path.basename(d) for d in glob.glob(f"{OUT}/*") if os.path.isdir(d))
fails = 0
for name in names:
    if ONLY and name not in ONLY: continue
    try:
        spark_df = con.execute(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"{name}: READ-FAIL {e}"); fails += 1; continue
    if name not in oracle:
        print(f"{name}: rows-only ({len(spark_df)} rows)"); continue
    try:
        oracle_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE-SQL-FAIL {e}"); fails += 1; continue
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        print(f"{name}: SCHEMA-MISMATCH spark={sc} oracle={oc}"); fails += 1; continue
    if len(spark_df) != len(oracle_df):
        print(f"{name}: ROWS-MISMATCH spark={len(spark_df)} oracle={len(oracle_df)}"); fails += 1; continue
    a = spark_df[sc].sort_values(sc, ignore_index=True)
    b = oracle_df[sc].sort_values(sc, ignore_index=True)
    bad = None
    for c in sc:
        av, bv = a[c], b[c]
        for i in range(len(av)):
            x, y = av.iloc[i], bv.iloc[i]
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn and yn: continue
            if xn != yn or str(x) != str(y):
                bad = (c, i, x, y); break
        if bad: break
    if bad:
        print(f"{name}: VALUE-MISMATCH col={bad[0]} row={bad[1]} spark={bad[2]!r} oracle={bad[3]!r}")
        fails += 1
    else:
        print(f"{name}: OK ({len(a)} rows)")
print(f"\n{'FAIL' if fails else 'PASS'}: {len(names)-fails}/{len(names)} green")
sys.exit(1 if fails else 0)
