#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare (dev tool only —
the engine itself is pure Scala/Spark; this mirrors what the driver does
with Verify's output so oracle mismatches are caught before a round ends).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
"""
import json, math, sys, glob, os
import duckdb

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    return v

def close(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, (int, float)):
        if a == b:
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(b, float) and isinstance(a, (int, float)):
        return close(b, a)
    return a == b

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_idx = [exp.columns.index(c) for c in exp_cols]
            exp_rows = [tuple(r[i] for i in exp_idx) for r in exp.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
        got_cols = sorted(got.columns)
        got_idx = [got.columns.index(c) for c in got_cols]
        got_rows = [tuple(r[i] for i in got_idx) for r in got.fetchall()]
        # The driver's hash is dtype-sensitive: a DuckDB HUGEINT/DECIMAL
        # column hashes differently from Spark's BIGINT even when every
        # value is equal (q207/q212 failed r10 exactly this way). Flag
        # any numeric-kind divergence between oracle and Spark types.
        exp_types = {c: str(t) for c, t in zip(exp.columns, exp.types)}
        got_types = {r[0]: r[1] for r in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchall()}
        # int width does not matter (python ints hash the same); what
        # matters is HUGEINT/DECIMAL vs plain int — pyarrow renders those
        # as decimal objects, which the driver hashes differently.
        def kind(t):
            t = t.upper()
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"): return "INT"
            if t.startswith("DECIMAL") or t == "HUGEINT": return "WIDE"
            return t
        tbad = [(c, exp_types[c], got_types.get(c))
                for c in exp_cols
                if c in got_types and kind(exp_types[c]) != kind(got_types[c])]
        if tbad:
            print(f"FAIL {name}: dtype divergence (driver hash-sensitive): {tbad}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns spark={got_cols} oracle={exp_cols}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows spark={len(got_rows)} oracle={len(exp_rows)}")
            n_fail += 1
            continue
        # order-sensitive compare first; fall back to sorted compare
        def cmp(rows_a, rows_b):
            bad = []
            for i, (ra, rb) in enumerate(zip(rows_a, rows_b)):
                for c, (va, vb) in zip(exp_cols, zip(ra, rb)):
                    if not close(va, vb):
                        bad.append((i, c, va, vb))
            return bad
        bad = cmp(got_rows, exp_rows)
        exact = not bad and all(
            norm(va) == norm(vb) for ra, rb in zip(got_rows, exp_rows)
            for va, vb in zip(ra, rb))
        if bad:
            srt = cmp(sorted(got_rows, key=str), sorted(exp_rows, key=str))
            if not srt:
                print(f"WARN {name}: matches only after row sort (ordering differs)")
                n_pass += 1
                continue
            print(f"FAIL {name}: {len(bad)} cell mismatches; first: {bad[:3]}")
            n_fail += 1
            continue
        tag = "PASS" if exact else "PASS~"  # ~ = within tolerance, not bit-exact
        print(f"{tag} {name} ({len(got_rows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
