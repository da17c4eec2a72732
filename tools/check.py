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


def is_oom(e):
    # DuckDB OOMs raise duckdb.OutOfMemoryException and stringify as
    # "Out of Memory Error: could not allocate ..." — match type name and
    # message. (r13 ADVICE: the old `"OutOfMemory" in str(e)` guard matched
    # NEITHER form, so the automatic decomposed-CC fallback was dead code
    # and a big-rung CC oracle that OOMed spurious-FAILed as 'exec error'.
    # tools/test_check_oom.py pins both the classifier and the fallback
    # actually firing under a forced tiny memory_limit.)
    return (type(e).__name__ == "OutOfMemoryException"
            or "Out of Memory" in str(e))


def should_decompose(e, sql):
    """THE fallback predicate: re-adjudicate via decomposed_cc exactly when
    the oracle died of memory AND is a transitive-closure query."""
    return is_oom(e) and "reach(" in sql


SUBSTR_F_MARK = "f AS (SELECT h, MIN("
SUBSTR_X_MARK = "x AS (SELECT doc_id, pos, e_end, dup,"

DSIR_D_HEAD = "WITH d AS (SELECT * FROM ("
DSIR_D_TAIL = ") dw),\nw0 AS (SELECT doc_id, dsir_score,"


def should_stage_dsir(e, sql):
    """Fallback predicate for dsir_resample: the resample wraps the FULL
    dsirWeights spine in a `d` CTE whose downstream (`w0`) is referenced
    twice (the cumsum chain and the `t` total) — DuckDB re-executes the
    un-materialized spine per reference, so the 1G-row bigram explosion
    runs twice with both pipelines' temp live at once. dsir_weights alone
    passes at the same rung; the doubled peak is what exhausts temp disk
    at x1000. Engage the staged oracle on disk/memory exhaustion of a
    query with the wrapped-spine shape."""
    msg = str(e)
    return ((is_oom(e) or "No space left" in msg or "out of disk" in msg.lower())
            and sql.startswith(DSIR_D_HEAD) and DSIR_D_TAIL in sql)


def staged_dsir(con, sql, name):
    """Staged oracle for dsir_resample (same class as sharded_substr: a
    pure materialization split, no semantic change). The inner dsirWeights
    spine is COPY'd to parquet ONCE — that single pass is exactly the
    dsir_weights oracle, which passes one-shot at every rung attempted —
    and the resample (quantize + unit-hash cumsum + systematic picks over
    one row per doc) re-reads the 5M-row weights table instead of
    re-running the 1G-row spine per reference. Verified cell-identical to
    the one-shot oracle at sf0.01 (tools/test_check_oom.py)."""
    import os
    i = sql.find(DSIR_D_TAIL)
    assert sql.startswith(DSIR_D_HEAD) and i > 0, (
        f"{name}: not the wrapped-dsir-spine oracle shape")
    inner = sql[len(DSIR_D_HEAD):i]
    rest = sql[i + len(") dw),"):]
    tmp_d = f"/tmp/graft_dsir_d_{os.getpid()}.parquet"
    con.execute(f"COPY ({inner}) TO '{tmp_d}' (FORMAT parquet)")
    try:
        rel = con.execute(
            f"WITH d AS (SELECT * FROM read_parquet('{tmp_d}')),\n{rest}")
        return [c[0] for c in rel.description], rel.fetchall()
    finally:
        os.remove(tmp_d)


def should_shard_substr(e, sql):
    """Fallback predicate for the ExactSubstr pair: the one-shot oracle's
    window table carries an md5 string per stride-1 window, and past the
    x60 rung the group-by/join over it exhausts DuckDB's temp disk (the
    r15-documented out-of-core ceiling). Engage the hash-sharded oracle on
    a memory OR disk exhaustion of a query with the substring spine."""
    msg = str(e)
    return ((is_oom(e) or "No space left" in msg or "out of disk" in msg.lower())
            and SUBSTR_F_MARK in sql and SUBSTR_X_MARK in sql)


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
    # big-rung knobs: GRAFT_CHECK_MEMLIMIT (e.g. 40GB) enables DuckDB's
    # out-of-core path; GRAFT_CHECK_ONLY=a,b,c restricts the board (the
    # x60 scale-sensitive subset); GRAFT_CHECK_CC_DECOMPOSED=a,b forces
    # the decomposed connected-components oracle for those queries (it
    # also engages automatically when the recursive-CTE oracle OOMs)
    memlimit = os.environ.get("GRAFT_CHECK_MEMLIMIT")
    if memlimit:
        con.execute(f"SET memory_limit='{memlimit}'")
        # row order is irrelevant (canon_rows sorts) and preserving it
        # pins whole pipelines in memory — dropping it is what lets the
        # big-rung window/join oracles actually spill
        con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        # driver testdata ships single-file tables; GenScaled rungs are
        # Spark-written DIRECTORIES of part files — glob those
        pat = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(pat):
            pat += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = os.environ.get("GRAFT_CHECK_ONLY")
    if only:
        keep = {q.strip() for q in only.split(",") if q.strip()}
        missing = keep - set(oracles)
        assert not missing, f"GRAFT_CHECK_ONLY names unknown queries: {missing}"
        oracles = {k: v for k, v in oracles.items() if k in keep}
    cc_forced = {q.strip() for q in
                 os.environ.get("GRAFT_CHECK_CC_DECOMPOSED", "").split(",")
                 if q.strip()}
    substr_forced = {q.strip() for q in
                     os.environ.get("GRAFT_CHECK_SUBSTR_SHARDED", "").split(",")
                     if q.strip()}
    dsir_forced = {q.strip() for q in
                   os.environ.get("GRAFT_CHECK_DSIR_STAGED", "").split(",")
                   if q.strip()}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        method = ""
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [c[0] for c in spark_rel.description]
            s_rows = spark_rel.fetchall()
            if name in cc_forced:
                o_cols, o_rows = decomposed_cc(con, sql, name)
                method = " [cc-decomposed]"
            elif name in substr_forced:
                o_cols, o_rows = sharded_substr(con, sql, name)
                method = " [substr-sharded]"
            elif name in dsir_forced:
                o_cols, o_rows = staged_dsir(con, sql, name)
                method = " [dsir-staged]"
            else:
                try:
                    o_rel = con.execute(sql)
                    o_cols = [c[0] for c in o_rel.description]
                    o_rows = o_rel.fetchall()
                except Exception as e:
                    # the recursive-CTE closure needs one unspillable
                    # allocation that DuckDB's out-of-core path cannot
                    # break up (r12: OOM at the x30 rung while the engine
                    # ran the query without spill) — re-adjudicate with
                    # the edge list from DuckDB + an independent
                    # union-find over it (VERDICT r12 next #5)
                    if should_decompose(e, sql):
                        o_cols, o_rows = decomposed_cc(con, sql, name)
                        method = " [cc-decomposed after oracle OOM]"
                    elif should_shard_substr(e, sql):
                        o_cols, o_rows = sharded_substr(con, sql, name)
                        method = " [substr-sharded after oracle exhaustion]"
                    elif should_stage_dsir(e, sql):
                        o_cols, o_rows = staged_dsir(con, sql, name)
                        method = " [dsir-staged after oracle exhaustion]"
                    else:
                        raise
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
            print(f"PASS {name} ({len(s_rows)} rows){method}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


# (connection id, spine text) -> temp table name holding the dup flags.
# Keyed by CONNECTION, not just spine (review r16): temp tables live on one
# DuckDB connection, and a second main() call in the same process (new
# connection, identical oracle text) would otherwise cache-hit a table that
# does not exist there and FAIL both substring queries spuriously.
_substr_flags = {}


def sharded_substr(con, sql, name):
    """Hash-sharded oracle for substring_dedup / substring_clean (VERDICT
    r15 #5). Soundness: in the one-shot oracle, the first-occurrence
    election `f` GROUPs the window table `e` BY window hash `h`, and the
    flag join `j` joins e to f ON h — both are keyed on h alone, so
    partitioning the HASH SPACE (first hex digit of the md5: 16 uniform
    buckets) and running f+j per bucket yields, for every window, exactly
    the flag the global query computes (a bucket sees ALL windows of each
    of its hashes, and no window belongs to two buckets). Sharding by DOC
    would be unsound — first occurrence is a cross-document election.

    Memory shape: the md5 strings are what kill the one-shot plan (one
    32-char string per stride-1 window). Here `e` is materialized ONCE to
    parquet (streaming write), each bucket pass reads back a 1/16 slice
    (filter pushed to the scan), and the surviving per-window output is
    INTS ONLY (doc_id, pos, e_end, dup) — the downstream per-doc window
    function and aggregates never touch a hash again, which is what fits
    them in DuckDB's out-of-core budget at x100+.

    The downstream pass (the `x` running-max window and everything after
    it) partitions, groups, and joins by doc_id ONLY, so it is in turn
    exactly decomposable over a partition of the DOC space — run per
    doc-shard (doc_id % N, flags filtered + the `documents` view shadowed
    with the same predicate) and unioned. That keeps the final pass's
    window/aggregate state at 1/N of the corpus, which is what survives
    x300 (the unsharded final's one-shot window over the full flag table
    is what OOMed there). N via GRAFT_CHECK_SUBSTR_DOC_SHARDS, default 16;
    the sf0.01 equivalence run exercises both layers.

    The flag table is computed once per distinct spine and shared by both
    queries (they differ only past the `x` CTE)."""
    import os
    m_f = sql.find(SUBSTR_F_MARK)
    m_x = sql.find(SUBSTR_X_MARK)
    assert 0 < m_f < m_x, f"{name}: not the substring oracle spine"
    with_te = sql[:m_f].rstrip().rstrip(",")   # WITH t AS (...), e AS (...)
    fj = sql[m_f:m_x].rstrip().rstrip(",")     # f AS (...), j AS (...)
    rest = sql[m_x:]                           # x AS (...) ... final SELECT
    t_end = with_te.find(",\ne AS (")
    assert with_te.startswith("WITH ") and t_end > 0, f"{name}: no t CTE"
    t_def = with_te[len("WITH "):t_end]        # t AS (...)
    spine = (id(con), with_te + fj)
    if spine not in _substr_flags:
        tbl = f"substr_flags_{len(_substr_flags)}"
        # pid-unique path: two check.py processes (e.g. an sf0.01 run racing
        # a big-rung run) must never share the materialized window table.
        # finally-guarded (review r16): a failed bucket INSERT — temp-disk
        # exhaustion is this fallback's home regime — must not strand a
        # multi-GB window parquet in /tmp for later runs to trip over.
        tmp_e = f"/tmp/graft_substr_e_{os.getpid()}.parquet"
        try:
            con.execute(f"COPY ({with_te} SELECT doc_id, pos, h FROM e) "
                        f"TO '{tmp_e}' (FORMAT parquet)")
            # a prior build of the same table that crashed mid-insert (e.g.
            # the sibling query's attempt, which only caches on success) is
            # stale
            con.execute(f"DROP TABLE IF EXISTS {tbl}")
            con.execute(f"CREATE TEMP TABLE {tbl} "
                        "(doc_id BIGINT, pos BIGINT, e_end BIGINT, dup INT)")
            for d in "0123456789abcdef":
                con.execute(
                    f"INSERT INTO {tbl}\n"
                    f"WITH e AS (SELECT doc_id, pos, h "
                    f"FROM read_parquet('{tmp_e}')\n"
                    f"    WHERE substr(h, 1, 1) = '{d}'),\n"
                    f"{fj}\n"
                    "SELECT doc_id, pos, e_end, CAST(dup AS INT) FROM j")
        finally:
            if os.path.exists(tmp_e):
                os.remove(tmp_e)
        _substr_flags[spine] = tbl
    tbl = _substr_flags[spine]
    nds = int(os.environ.get("GRAFT_CHECK_SUBSTR_DOC_SHARDS", "16"))
    cols, rows = None, []
    for s in range(nds):
        # shadow the documents view for this doc shard: the temp view
        # resolves before the base view everywhere the final pass reads
        # the corpus (t, tok, and the final LEFT JOIN's driving scan). The
        # body must be CATALOG-qualified — a bare main.documents resolves
        # into the temp catalog's own main schema first, i.e. the view
        # itself (infinite recursion)
        cat = con.execute("SELECT current_catalog()").fetchone()[0]
        con.execute("CREATE OR REPLACE TEMPORARY VIEW documents AS "
                    f"SELECT * FROM {cat}.main.documents "
                    f"WHERE doc_id % {nds} = {s}")
        try:
            final = (f"WITH {t_def},\n"
                     f"j AS (SELECT doc_id, pos, e_end, dup FROM {tbl} "
                     f"WHERE doc_id % {nds} = {s}),\n{rest}")
            rel = con.execute(final)
            cols = [c[0] for c in rel.description]
            rows.extend(rel.fetchall())
        finally:
            con.execute("DROP VIEW documents")  # drops the TEMP shadow only
    return cols, rows


def decomposed_cc(con, sql, name):
    """Decomposed oracle for the connected-components queries
    (semantic_clusters / dedup_clusters): DuckDB computes ONLY the
    verified edge list `jp` (the part that runs out-of-core fine — the
    identical CTE prefix passed at x30 inside semantic_leakage), and an
    independent single-machine union-find labels the components. The
    recursive-CTE transitive closure is the piece whose one-shot
    allocation OOMs DuckDB at big rungs; nothing about the ORACLE's
    semantics needs it — CC labels with min-id keepers are exactly what
    union-find computes."""
    # ONLY the two plain-cluster queries have the (id, keeper, size) shape
    # this reimplements; dedup_cluster_keepers also matches the OOM
    # heuristic ('reach(' in sql) but needs the documents quality join —
    # routing it here would emit a wrong schema and report a misleading
    # cell mismatch instead of the real problem (review finding, r13)
    assert name in ("semantic_clusters", "dedup_clusters"), (
        f"{name}: decomposed CC oracle supports only semantic_clusters / "
        "dedup_clusters (keeper-quality elections need the recursive oracle)")
    marker = "edges AS ("
    i = sql.find(marker)
    assert i >= 0, f"{name}: no '{marker}' CTE to cut at — not a CC oracle"
    prefix = sql[:i].rstrip().rstrip(",")
    if "vec_a" in sql:
        a_col, b_col = "vec_a", "vec_b"
        id_col, keeper_col = "vec_id", "keeper_vec_id"
    else:
        a_col, b_col = "doc_a", "doc_b"
        id_col, keeper_col = "doc_id", "keeper_doc_id"
    edges = con.execute(
        f"{prefix}\nSELECT {a_col}, {b_col} FROM jp").fetchall()
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # keeper = min id, for free
    comps = {}
    for v in parent:
        comps.setdefault(find(v), []).append(v)
    rows = []
    for keeper, members in comps.items():
        assert keeper == min(members)
        for v in members:
            rows.append((v, keeper, len(members)))
    return [id_col, keeper_col, "cluster_size"], rows


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
