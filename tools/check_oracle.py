#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet written by graft.Verify,
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
same sfDir parquet tables, sorts columns by name and rows by all
columns, and compares cell-by-cell (exact; floats reported with max
abs diff when mismatched). Mirrors the described driver behavior so
mismatches are caught before the round gate runs.
"""
import json, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df):
    cols = sorted(df.columns)
    df = df[cols]
    # unify temporal resolution (pyarrow may surface us, duckdb ns or
    # vice versa — a reader artifact, not a value difference; values
    # are compared exactly below)
    for c in cols:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            # Spark side through PYARROW (the driver's read path), NOT
            # DuckDB: reading both sides through the same engine
            # collapses representation divergences (the r05 q_lm_score
            # raw-DECIMAL class) that the driver's hash sees.
            import pyarrow.parquet as pq
            import pyarrow as pa
            tbl = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
            # representation lint: a presented decimal/binary column
            # hashes engine-dependently — canonical string or double
            # only (the q_role_transitions discipline).
            bad_types = [f.name for f in tbl.schema
                         if pa.types.is_decimal(f.type) or
                            (pa.types.is_binary(f.type) or
                             pa.types.is_large_binary(f.type))]
            if bad_types:
                print(f"FAIL {name}: presented decimal/binary column(s) "
                      f"{bad_types} (representation-unsafe for the driver hash)")
                n_fail += 1; continue
            got = norm(tbl.to_pandas())
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols got={list(got.columns)} want={list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows got={len(got)} want={len(want)}")
            n_fail += 1; continue
        # STRICT dtype gate: the driver's comparator hashes raw values, so
        # int64 `2` vs float64 `2.0` (e.g. DuckDB SUM(BIGINT) -> HUGEINT ->
        # pandas float64) is a real failure even though the float-coerced
        # compare below would pass — exactly how the r01 cascade rows
        # slipped through this script.
        if list(map(str, got.dtypes)) != list(map(str, want.dtypes)):
            diffs = [f"{c}: spark={got[c].dtype} oracle={want[c].dtype}"
                     for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
            print(f"FAIL {name}: dtype mismatch ({'; '.join(diffs)})")
            n_fail += 1; continue
        ok = True
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                # BYTE-STRICT: the driver hashes raw bytes, so -0.0 vs 0.0
                # and differing NaN payloads are real failures even though
                # float == passes (the r03 q_fft signed-zero miss — the r01
                # dtype lesson one layer deeper).
                import numpy as np
                aa, bb = a.astype(float).values, b.astype(float).values
                if aa.tobytes() != bb.tobytes():
                    byte_same = aa.view(np.int64) == bb.view(np.int64)
                    same_val = (aa == bb) | (np.isnan(aa) & np.isnan(bb))
                    if not same_val.all():
                        d = np.nanmax(np.abs(aa - bb))
                        print(f"FAIL {name}: col {c} float mismatch maxabs={d:g} "
                              f"n_bad={(~same_val).sum()}")
                    else:
                        n = int((~byte_same).sum())
                        i = int(np.argmax(~byte_same))
                        print(f"FAIL {name}: col {c} byte-level float mismatch "
                              f"(signed zero / NaN payload) n_bad={n} "
                              f"first row {i}: got={aa[i]!r} want={bb[i]!r} "
                              f"signbits got={np.signbit(aa[i])} want={np.signbit(bb[i])}")
                    ok = False
            else:
                if not a.astype(str).equals(b.astype(str)):
                    bad = (a.astype(str) != b.astype(str))
                    i = bad[bad].index[0]
                    print(f"FAIL {name}: col {c} mismatch at row {i}: "
                          f"got={a[i]!r} want={b[i]!r} (n_bad={bad.sum()})")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
