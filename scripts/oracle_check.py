#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the raw tables in
<sfDir>, and compares: columns sorted by name, rows sorted, exact values.
Reports per-query PASS/FAIL with first diffs. This is NOT part of the shipped
library — it exists so we catch oracle mismatches before the driver does.
"""
import sys, json, glob, os
import duckdb

# --exact: compare floats bit-for-bit (models the driver's value hash, which
# is stricter than the 9-decimal round). Default keeps the historical 1e-9
# tolerance for quick iteration.
EXACT = "--exact" in sys.argv
if EXACT:
    sys.argv.remove("--exact")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        return v if EXACT else round(v, 9)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        rel = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in rel.description]
        srows = rel.fetchall()
        if name not in oracles:
            print(f"ROWS {name}: rows={len(srows)} (no oracle, rows-only)")
            n_pass += 1
            continue
        try:
            orel = con.execute(oracles[name])
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # Physical-type parity: the driver's value hash goes through a
        # pandas conversion where DuckDB HUGEINT / DECIMAL become float64
        # while Spark's BIGINT stays int64 — equal values, different hash.
        # Round 7 lost 10 green queries to exactly this, so it is a FAIL
        # here even when every value compares equal numerically.
        stypes = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()}
        otypes = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE {oracles[name]}").fetchall()}
        INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}

        def hostile(st, ot):
            if ot == "HUGEINT" or ot.startswith("DECIMAL"):
                return True
            if st is not None and (st.startswith("DECIMAL") or st == "FLOAT"):
                return True
            return st is not None and st != ot and not (st in INTS and ot in INTS)

        risky = {c: (stypes.get(c), t) for c, t in otypes.items()
                 if hostile(stypes.get(c), t)}
        if risky:
            print(f"FAIL {name}: hash-hostile dtypes (spark, oracle): {risky}")
            n_fail += 1
            continue
        sc, sr = canon(srows, scols)
        oc, od = canon(orows, ocols)
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}")
            n_fail += 1
            continue
        if len(sr) != len(od):
            print(f"FAIL {name}: rowcount spark={len(sr)} oracle={len(od)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, od) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; first: spark={bad[0][0]} oracle={bad[0][1]}  cols={sc}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sr)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
