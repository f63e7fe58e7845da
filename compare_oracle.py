#!/usr/bin/env python3
"""Local harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 compare_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet result (written by graft.Verify),
runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB
over <sfDir>/*.parquet tables, and compares row counts, sorted column
names, and value hashes (column-name-sorted, row-sorted).
"""
import sys, json, glob, os
import duckdb

def norm(rows, cols):
    # sort columns by name, then rows; stringify with float rounding
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    ok = fail = 0
    for name in sorted(oracles):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"MISSING  {name}"); fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [d[0] for d in con.description]
        try:
            # Type gate first: the driver's hash normalization
            # distinguishes HUGEINT/DECIMAL from BIGINT even when the
            # Python-stringified values match, so any oracle emitting
            # them is a latent driver hash-mismatch. DESCRIBE is free.
            desc = con.execute(
                f"DESCRIBE {oracles[name]}").fetchall()
            bad = [(c, t) for c, t, *_ in desc
                   if "HUGEINT" in t.upper() or "DECIMAL" in t.upper()]
            if bad:
                print(f"BADTYPE  {name}: un-cast oracle output "
                      f"columns {bad} (add ::BIGINT)")
                fail += 1; continue
            want = con.execute(oracles[name]).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); fail += 1; continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"COLS     {name}: spark={sorted(got_cols)} "
                  f"duck={sorted(want_cols)}"); fail += 1; continue
        gn, wn = norm(got, got_cols), norm(want, want_cols)
        if len(gn) != len(wn):
            print(f"ROWS     {name}: spark={len(gn)} duck={len(wn)}")
            fail += 1; continue
        if gn != wn:
            diffs = [(a, b) for a, b in zip(gn, wn) if a != b][:3]
            print(f"VALUES   {name}: first diffs {diffs}")
            fail += 1; continue
        print(f"OK       {name} ({len(gn)} rows)"); ok += 1
    print(f"\n{ok} ok, {fail} failed")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
