#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir> [key ...]

Reads each <verifyOutDir>/<key> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against
views named after the testdata parquet tables, and compares:
  - schema (column names, after sorting columns by name)
  - row count
  - values (exact for non-floats; floats compared exactly AND with 1e-9
    rel tolerance reported separately, since the driver hashes values)
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    """Arrays (numpy/list) -> tuples so equality is well-defined."""
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(canon(x) for x in v.tolist())
    except ImportError:
        pass
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    for key in sorted(oracle) if not only else sorted(only):
        sql = oracle.get(key)
        if sql is None:
            n_noracle += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{key}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {key}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {key}: oracle SQL error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {key}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {key}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        dt = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
              if str(got[c].dtype) != str(exp[c].dtype)]
        dtw = f" [dtype drift: {dt}]" if dt else ""
        # Driver mirror: the driver row-sorts with pandas sort_values over
        # ALL columns before hashing; array-typed cells crash it with
        # "unhashable type: numpy.ndarray" (seen in CORRECTNESS_r01).
        try:
            got.sort_values(list(got.columns))
            exp.sort_values(list(exp.columns))
        except TypeError as e:
            print(f"FAIL {key}: driver sort_values would crash: {e}")
            n_fail += 1
            continue
        # compare in order (queries impose total ORDER BY)
        bad = None
        approx = 0
        for col in got.columns:
            gv, ev = got[col].tolist(), exp[col].tolist()
            for i, (g, e) in enumerate(zip(gv, ev)):
                g, e = canon(g), canon(e)
                if g is None and e is None:
                    continue
                gnan = isinstance(g, float) and math.isnan(g)
                enan = isinstance(e, float) and math.isnan(e)
                if gnan and enan:
                    continue
                # pandas NaT (null timestamp): NaT == NaT is False; treat
                # matched NaTs as equal like the None/None case above
                if g is pd.NaT and e is pd.NaT:
                    continue
                if g == e:
                    continue
                if isinstance(g, float) and isinstance(e, float) and not (gnan or enan):
                    if abs(g - e) <= 1e-9 * max(1.0, abs(g), abs(e)):
                        approx += 1
                        continue
                bad = (col, i, g, e)
                break
            if bad:
                break
        if bad:
            col, i, g, e = bad
            print(f"FAIL {key}: col={col} row={i}: spark={g!r} oracle={e!r}")
            n_fail += 1
        else:
            flag = f" ({approx} float-approx!)" if approx else ""
            print(f"PASS {key}: {len(got)} rows{flag}{dtw}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
