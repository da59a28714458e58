#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare per-query (rows / schema-ish / values).

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def dtype_class(s: pd.Series) -> str:
    """Coarse type class AFTER normalize. The driver hashes stringified
    values, so an int64 Spark column vs a float64 oracle column renders
    "398" vs "398.0" and hash-fails even when the values agree (this is
    exactly how q137 shipped red in round 10). Classes, not exact dtypes:
    normalize already coerced within-class widths."""
    if pd.api.types.is_bool_dtype(s): return "bool"
    if pd.api.types.is_integer_dtype(s): return "int"
    if pd.api.types.is_float_dtype(s): return "float"
    if pd.api.types.is_datetime64_any_dtype(s): return "datetime"
    return "object"

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    dirs = sorted(d for d in os.listdir(out_dir)
                  if os.path.isdir(f"{out_dir}/{d}"))
    for name in dirs:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = {"status": "NO_OUTPUT"}
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            results[name] = {"status": "ROWS_ONLY", "rows": len(got)}
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = {"status": "ORACLE_ERROR", "err": str(e)[:200]}
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            results[name] = {"status": "SCHEMA_MISMATCH",
                             "spark": list(g.columns), "duckdb": list(w.columns)}
        elif len(g) != len(w):
            results[name] = {"status": "ROWCOUNT_MISMATCH",
                             "spark": len(g), "duckdb": len(w)}
        elif any(dtype_class(g[c]) != dtype_class(w[c]) for c in g.columns):
            results[name] = {"status": "DTYPE_MISMATCH", "cols": {
                c: f"spark={dtype_class(g[c])} duckdb={dtype_class(w[c])}"
                for c in g.columns if dtype_class(g[c]) != dtype_class(w[c])}}
        else:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                              check_exact=False, rtol=1e-6, atol=1e-9)
                results[name] = {"status": "MATCH", "rows": len(g)}
            except AssertionError as e:
                diffcols = []
                for c in g.columns:
                    try:
                        pd.testing.assert_series_equal(
                            g[c], w[c], check_dtype=False, check_exact=False,
                            rtol=1e-6, atol=1e-9)
                    except AssertionError:
                        diffcols.append(c)
                results[name] = {"status": "VALUE_MISMATCH", "cols": diffcols,
                                 "detail": str(e).split("\n")[0][:160]}
    ok = sum(1 for r in results.values() if r["status"] in ("MATCH", "ROWS_ONLY"))
    for name, r in sorted(results.items()):
        print(f"{name:24s} {json.dumps(r)}")
    print(f"\n{ok}/{len(results)} ok "
          f"({sum(1 for r in results.values() if r['status']=='MATCH')} matched, "
          f"{sum(1 for r in results.values() if r['status']=='ROWS_ONLY')} rows-only)")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
