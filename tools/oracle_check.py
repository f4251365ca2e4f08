#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views over
<sfDir>/*.parquet, loads the corresponding Spark parquet result, and compares
row count, column names, and values (sorted by all columns, column order by
name) — a stricter local approximation of the driver's hash compare.
NOT part of the library; dev tooling only (mirrors driver-side duckdb usage).
"""
import hashlib, json, sys, glob, os
import duckdb
import pandas as pd


def src_sha():
    """Hash of the oracle-result surface: every source file whose edit can
    change a registered query's answer. graft.Verify stamps the same hash
    into the dump at DUMP time (src_sha.txt); this checker re-derives it
    over the tree it sees and refuses to publish a gate on mismatch — so a
    gate can never vouch for operator code edited after the dump ran, and
    SurveyRegistrySpec then pins the published gate to the current tree.
    Mirrored bit-for-bit by graft.core.SrcSha; keep in sync (glob's '*'
    never matches leading dots, so hidden files are excluded both sides)."""
    roots = [
        "src/main/scala/graft/operators",
        "src/main/scala/graft/queries",
        "src/main/scala/graft/functions",
        "src/main/scala/graft/plans",
        "src/main/scala/graft/core",
        "src/main/scala/org",
    ]
    files = [f for f in ["src/main/scala/graft/SparkEntry.scala",
                         "src/main/scala/graft/GraftExtensions.scala"]
             if os.path.isfile(f)]  # mirrors SrcSha's Fixed existence filter
    for r in roots:
        files += glob.glob(f"{r}/**/*.scala", recursive=True)
    h = hashlib.sha256()
    for p in sorted(files):
        h.update(p.encode())
        h.update(b"\0")
        h.update(open(p, "rb").read())
    return h.hexdigest()[:16]

if len(sys.argv) == 2 and sys.argv[1] == "--src-sha-only":
    # mirror-drift probe: print the hash and exit — SurveyRegistrySpec
    # compares this against graft.core.SrcSha.compute() so a divergence
    # between the two implementations fails loudly in CI instead of
    # producing a permanent stamp/check mismatch
    print(src_sha())
    sys.exit(0)

sf_dir, out_dir = sys.argv[1], sys.argv[2]
# optional third arg: substring filter, for partial dumps (e.g. sf0.1
# spot-checks where only cheap oracles are worth running in DuckDB)
only = sys.argv[3] if len(sys.argv) > 3 else ""
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
report = {}  # per-query verdict, written to $ORACLE_CHECK_JSON when set
for name, sql in sorted(oracle.items()):
    if only and only not in name:
        continue
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: spark output missing")
        report[name] = "fail: spark output missing"
        fails += 1
        continue
    try:
        duck = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        report[name] = f"fail: duckdb error: {e}"
        fails += 1
        continue
    spark = pd.concat(
        [pd.read_parquet(f) for f in sorted(glob.glob(f"{spark_path}/*.parquet"))],
        ignore_index=True,
    )
    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns), ignore_index=True)
    if sorted(duck.columns) != sorted(spark.columns):
        print(f"FAIL {name}: columns duck={sorted(duck.columns)} spark={sorted(spark.columns)}")
        report[name] = "fail: column mismatch"
        fails += 1
        continue
    d, s = norm(duck), norm(spark)
    if len(d) != len(s):
        print(f"FAIL {name}: rows duck={len(d)} spark={len(s)}")
        report[name] = f"fail: rows duck={len(d)} spark={len(s)}"
        fails += 1
        continue
    # exact compare after canonicalizing dtypes to string repr
    mism = []
    for c in d.columns:
        dv, sv = d[c], s[c]
        try:
            eq = (dv.astype("string").fillna("<null>") == sv.astype("string").fillna("<null>")).all()
        except Exception:
            eq = False
        if not eq:
            idx = (dv.astype("string").fillna("<null>") != sv.astype("string").fillna("<null>")).idxmax()
            mism.append((c, dv.iloc[idx], sv.iloc[idx]))
    if mism:
        print(f"FAIL {name}: value mismatch {mism[:3]}")
        report[name] = f"fail: value mismatch in {[m[0] for m in mism[:3]]}"
        fails += 1
    else:
        print(f"OK   {name}: {len(d)} rows")
        report[name] = f"ok: {len(d)} rows"
print("RESULT:", "FAIL" if fails else "PASS", f"({len(oracle)-fails}/{len(oracle)})")
# Self-published round artifact (the round-7 empty-artifact incident):
# when $ORACLE_CHECK_JSON is set, write the per-query verdicts plus a
# summary, and REFUSE to write a gate that covered fewer queries than the
# dumped oracle map (a partial run is not a gate).
json_out = os.environ.get("ORACLE_CHECK_JSON")
if json_out:
    if only:
        sys.exit("ORACLE_CHECK_JSON requires a full (unfiltered) run")
    sha_now = src_sha()
    stamp_path = f"{out_dir}/src_sha.txt"
    if not os.path.isfile(stamp_path):
        # an unstamped dump predates (or lost) the dump-time stamp; publishing
        # with the CHECK-time tree hash would defeat the dump-time guarantee —
        # a stale dump could silently vouch for the current tree
        sys.exit(
            "refusing to publish gate: dump carries no src_sha.txt stamp — "
            "rerun graft.Verify (it stamps at dump time) before publishing")
    stamped = open(stamp_path).read().strip()
    if stamped != sha_now:
        sys.exit(
            f"refusing to publish gate: dump was produced from source tree "
            f"{stamped} but the current tree is {sha_now} — operator sources "
            f"changed after the Verify dump ran; rerun graft.Verify")
    payload = {
        "sf_dir": sf_dir,
        "src_sha": sha_now,
        "total": len(oracle),
        "passed": len(oracle) - fails,
        "failed": fails,
        "result": "FAIL" if fails else "PASS",
        "queries": report,
    }
    assert len(report) == len(oracle), "partial run cannot publish a gate"
    with open(json_out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"wrote {json_out}")
sys.exit(1 if fails else 0)
