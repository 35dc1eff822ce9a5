import duckdb, json, glob, os, pandas as pd, numpy as np

# Override via env to replay the contract at other scales / dump dirs —
# the sf0.1 replay is what caught the q_train_split cast-boundary
# divergence that the default sf0.01 gate masked.
sf = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
out = os.environ.get("ORACLE_OUT_DIR", "/tmp/verify_out")
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")], ignore_index=True) if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
    if name not in oracle:
        results[name] = f"rows_only rows={len(spark_df)} ok={len(spark_df)>0}"
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR {e}"
        continue
    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].apply(lambda x: x.tobytes() if isinstance(x, (bytes, bytearray, memoryview, np.ndarray)) else x)
                df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        results[name] = f"SCHEMA_MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    elif len(a) != len(b):
        results[name] = f"ROWS_MISMATCH spark={len(a)} duck={len(b)}"
    elif not a.equals(b):
        diff = (a != b).any(axis=1)
        results[name] = f"VALUE_MISMATCH n={diff.sum()} first:\nspark:{a[diff].head(2)}\nduck:{b[diff].head(2)}"
    else:
        results[name] = f"OK rows={len(a)}"

fails = 0
for k, v in results.items():
    status = "PASS" if v.startswith("OK") or "ok=True" in v else "FAIL"
    if status == "FAIL": fails += 1
    print(f"{status} {k}: {v}")
print(f"\n{len(results)} queries, {fails} failures")
