#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff row multisets."""
import sys, json, glob, math
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            if isinstance(v, list):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)

ok, bad = [], []
for name in sorted(oracle):
    sql = oracle[name]
    try:
        o = con.sql(sql)
        ocols = [c.lower() for c in o.columns]
        orows = o.fetchall()
    except Exception as ex:
        bad.append((name, f"ORACLE SQL ERROR: {ex}"))
        continue
    try:
        s = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        scols = [c.lower() for c in s.columns]
        srows = s.fetchall()
    except Exception as ex:
        bad.append((name, f"SPARK OUTPUT MISSING: {ex}"))
        continue
    if sorted(scols) != sorted(ocols):
        bad.append((name, f"SCHEMA: spark={scols} oracle={ocols}"))
        continue
    # --- driver-rendering parity checks (r10 lesson: HUGEINT) ---
    # 1) DuckDB widens SUM(BIGINT) to HUGEINT; the driver renders that
    #    through pandas as float64 ("568560.0") while Spark emits a long
    #    ("568560") -> hash-red at the driver even when values match.
    #    Fail loudly on any HUGEINT oracle column, and on DECIMAL unless
    #    the Spark side is also decimal.
    # (DECIMAL is fine: duckdb renders it float64, same as DOUBLE — an
    # int-rendered Spark side against it is caught by the dtype-kind
    # check below. HUGEINT is always an accidental SUM(BIGINT) widening.)
    otypes = {c: str(t).upper() for c, t in zip(ocols, o.types)}
    typebad = []
    for c in ocols:
        if "HUGEINT" in otypes[c]:
            typebad.append(f"{c}: oracle HUGEINT (wrap with CAST(... AS BIGINT))")
    if typebad:
        bad.append((name, f"ORACLE TYPE: {typebad}"))
        continue
    # 2) Compare pandas dtype *kinds* per column — the driver hashes a
    #    pandas rendering, so an int-vs-float kind split means a hash
    #    mismatch even with identical values.
    odf, sdf = o.df(), s.df()
    kindbad = []
    for c in ocols:
        ok_, sk_ = odf[c].dtype.kind, sdf[c].dtype.kind
        if ok_ != sk_ and {ok_, sk_} <= {"i", "u", "f"}:
            kindbad.append(f"{c}: spark~{sdf[c].dtype} oracle~{odf[c].dtype}")
    if kindbad:
        bad.append((name, f"RENDER DTYPE: {kindbad}"))
        continue
    a, b = norm(srows, scols), norm(orows, ocols)
    if a == b:
        ok.append((name, len(a)))
    else:
        extra = [r for r in a if r not in b][:3]
        missing = [r for r in b if r not in a][:3]
        bad.append((name, f"ROWS: spark={len(a)} oracle={len(b)} "
                          f"spark-only={extra} oracle-only={missing}"))

for name, n in ok:
    print(f"OK   {name} ({n} rows)")
for name, msg in bad:
    print(f"FAIL {name}: {msg[:400]}")
# queries without oracle: rows-only
no_oracle = [d.split('/')[-1] for d in glob.glob(f"{outdir}/*")
             if '.' not in d.split('/')[-1] and d.split('/')[-1] not in oracle]
for name in sorted(no_oracle):
    n = con.sql(f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'").fetchone()[0]
    print(f"ROWS {name}: {n}")
print(f"\n{len(ok)} ok, {len(bad)} fail")
sys.exit(1 if bad else 0)
