#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: load each Verify output
parquet, run the matching oracle SQL in DuckDB over the same sf dir, and
compare values (columns sorted by name, rows sorted, 1e-9 tolerance check
plus exact-hash check) so oracle bugs surface before the round ends.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no engine output"); n_fail += 1; continue
        try:
            eng = con.execute(
                f"SELECT * FROM read_parquet({files!r})").df()
        except Exception as e:
            print(f"FAIL {name}: engine read: {e}"); n_fail += 1; continue
        try:
            ora = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:300]}"); n_fail += 1; continue
        eng, ora = normalize(eng), normalize(ora)
        if list(eng.columns) != list(ora.columns):
            print(f"FAIL {name}: columns {list(eng.columns)} vs {list(ora.columns)}")
            n_fail += 1; continue
        if len(eng) != len(ora):
            print(f"FAIL {name}: rows {len(eng)} vs {len(ora)}"); n_fail += 1; continue
        # row-order-sensitive compare first; if that fails, sorted compare
        ok_ordered = True
        detail = ""
        for c in eng.columns:
            a, b = eng[c], ora[c]
            try:
                # DuckDB sum(BIGINT) yields HUGEINT -> pandas float64; the
                # driver's hash compare then sees "10.0" vs Spark's "10".
                # An int/float dtype split is therefore a hash FAIL even
                # when the values are numerically identical.
                if {a.dtype.kind, b.dtype.kind} == {'i', 'f'}:
                    ok_ordered = False
                    detail = (f"col {c}: dtype mismatch {a.dtype} vs {b.dtype} "
                              "(driver hash compares string forms -> FAIL; "
                              "CAST the oracle aggregate)")
                    break
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    import numpy as np
                    if not np.allclose(a.astype(float), b.astype(float),
                                       rtol=0, atol=1e-12, equal_nan=True):
                        ok_ordered = False; detail = f"col {c} values differ"
                        break
                    if not (a.astype(float).values == b.astype(float).values).all():
                        detail = f"col {c}: allclose but not bit-equal (hash would FAIL)"
                        ok_ordered = False
                        break
                else:
                    if not (a.astype(str).values == b.astype(str).values).all():
                        ok_ordered = False; detail = f"col {c} values differ"
                        break
            except Exception as e:
                ok_ordered = False; detail = f"col {c}: {e}"; break
        if ok_ordered:
            print(f"PASS {name} ({len(eng)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: {detail}")
            srt = lambda d: d.sort_values(list(d.columns)).reset_index(drop=True)
            es, os_ = srt(eng), srt(ora)
            same_sorted = all(
                (es[c].astype(str).values == os_[c].astype(str).values).all()
                for c in es.columns)
            print(f"     (sorted-compare: {'MATCH' if same_sorted else 'differ'})")
            if not same_sorted:
                merged = es.merge(os_, how='outer', indicator=True,
                                  on=list(es.columns))
                diff = merged[merged._merge != 'both']
                print(diff.head(6).to_string())
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
