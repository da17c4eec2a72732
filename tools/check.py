#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tool only; the engine
itself never depends on DuckDB). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out

Compares each Spark result parquet against its DuckDB oracle: column-name
sets, row counts, and cell-exact values after sorting columns by name and
rows by all columns."""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_rows(rows, ncols):
    def key(r):
        return tuple((x is None, str(x)) for x in r)
    return sorted(rows, key=key)


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        # bit-exact: the engine's determinism rules (decimal sums, fixed-order
        # folds, shared round points) make cross-engine floats identical, and
        # the driver's hash compare assumes it — so assert it here too.
        return af == bf
    return str(a) == str(b)


def main(sf_dir, out_dir):
    import os
    con = duckdb.connect()
    threads = os.environ.get("GRAFT_CHECK_THREADS")
    if threads:
        con.execute(f"SET threads TO {int(threads)}")
    # Out-of-core spill goes OUTSIDE the repo: a 1.75GB spill file from an
    # x30 run was once accidentally committed (r12 verdict). Never again.
    con.execute("SET temp_directory='/tmp/graft_duckdb_tmp'")
    for t in TABLES:
        # driver testdata ships single-file tables; GenScaled rungs are
        # Spark-written DIRECTORIES of part files — glob those
        pat = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(pat):
            pat += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [c[0] for c in spark_rel.description]
            s_rows = spark_rel.fetchall()
            o_rel = con.execute(sql)
            o_cols = [c[0] for c in o_rel.description]
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_fail += 1
            continue
        order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        s_rows = [[r[i] for i in order] for r in s_rows]
        order_o = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
        o_rows = [[r[i] for i in order_o] for r in o_rows]
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
            continue
        s_rows = canon_rows(s_rows, len(s_cols))
        o_rows = canon_rows(o_rows, len(o_cols))
        bad = None
        for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
            for j, (a, b) in enumerate(zip(sr, orow)):
                if not cells_equal(a, b):
                    bad = (i, sorted(s_cols)[j], a, b)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
