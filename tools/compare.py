#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the test parquet and compare against the Verify.scala parquet
dumps (columns sorted by name, exact value compare, dtype report)."""
import duckdb, json, sys, math

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}"); n_fail += 1; continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if got.shape != want.shape:
            print(f"FAIL {name}: shape {got.shape} vs {want.shape}"); n_fail += 1; continue
        bad = None
        for c in got.columns:
            a, b = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if not eq(x, y):
                    bad = (c, i, x, y); break
            if bad: break
        dt = [f"{c}:{got[c].dtype}/{want[c].dtype}" for c in got.columns
              if str(got[c].dtype) != str(want[c].dtype)]
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col {c} row {i}: spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            suffix = f"  [dtype diff: {', '.join(dt)}]" if dt else ""
            print(f"PASS {name} ({got.shape[0]} rows){suffix}")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

def eq(x, y):
    if x is None and y is None: return True
    if isinstance(x, float) and isinstance(y, float):
        if math.isnan(x) and math.isnan(y): return True
        return x == y
    if hasattr(x, "__len__") and not isinstance(x, str) and \
       hasattr(y, "__len__") and not isinstance(y, str):
        return len(x) == len(y) and all(eq(a, b) for a, b in zip(x, y))
    try:
        if x != x and y != y: return True  # NaN-ish
    except Exception:
        pass
    return x == y

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
