"""Driver-style correctness sweep: run every queries() entry and compare
against its oracle_sql() via DuckDB (rows + columns + exact values + dtypes).
Usage: python scripts/check_oracle.py [query ...]   (default: all)
"""
import ray, duckdb, pandas as pd, numpy as np, os, sys, time
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
import __ray_entry__ as E

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
qs, oracles = E.queries(), E.oracle_sql()
only = sys.argv[1:] if len(sys.argv) > 1 else None
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        out = fn(SF)
        got = out.to_pandas() if hasattr(out, "to_pandas") else pd.DataFrame(out)
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only {len(got)} cols={sorted(got.columns)} [{dt:.1f}s]")
            continue
        want = con.execute(oracles[name]).fetchdf()
        cols_ok = sorted(got.columns) == sorted(want.columns)
        match = cols_ok and len(got) == len(want)
        if match:
            g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
            w = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
            for c in g.columns:
                a, b = g[c], w[c]
                # Driver-strength compare: dtypes must agree (a HUGEINT
                # oracle column arriving as float64 vs ray int64 is a hash
                # mismatch even when allclose passes), and float columns
                # must be BYTE-equal (catches -0.0 and last-bit drift).
                if a.dtype != b.dtype:
                    match = False
                    print(f"  {name} col {c}: dtype ray={a.dtype} oracle={b.dtype}")
                    continue
                if a.dtype.kind == 'f':
                    ok = a.to_numpy().tobytes() == b.to_numpy().tobytes()
                    if not ok and np.allclose(a, b, rtol=0, atol=0, equal_nan=True):
                        print(f"  {name} col {c}: allclose but NOT byte-equal (-0.0 or bit drift)")
                else:
                    ok = (a.astype(str) == b.astype(str)).all()
                if not ok:
                    match = False
                    print(f"  {name} col {c}: ray={a.head(3).tolist()} oracle={b.head(3).tolist()}")
        print(f"{name}: rows {len(got)}/{len(want)} cols_ok={cols_ok} exact={match} [{dt:.1f}s]")
    except Exception as e:
        import traceback; traceback.print_exc()
        print(f"{name}: ERROR {type(e).__name__}: {e}")
ray.shutdown()
