#!/usr/bin/env python3
"""Pin for check.py's OOM→decomposed-CC fallback predicate (r13 ADVICE:
the previous guard matched neither DuckDB's exception type nor its
message, so the "automatic" fallback was dead code and big-rung CC
oracles that OOMed spurious-FAILed).

Forces a REAL DuckDB OOM under a tiny memory_limit and asserts the
production predicate (`should_decompose`) fires on the caught exception
object itself — not on a hand-written message that could drift from
what DuckDB actually raises.

    python3 tools/test_check_oom.py
"""
import sys

import duckdb

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import check  # noqa: E402


def force_oom():
    con = duckdb.connect()
    con.execute("SET memory_limit='2MB'")
    con.execute("SET temp_directory=''")  # no out-of-core escape hatch
    try:
        con.execute(
            "SELECT count(DISTINCT a*7919 % 1000000007) FROM "
            "range(5000000) t(a) GROUP BY a % 100000 ORDER BY 1").fetchall()
    except Exception as e:  # noqa: BLE001 — the whole point
        return e
    raise AssertionError("query under 2MB memory_limit did not OOM — "
                         "pick a hungrier probe query")


def main():
    e = force_oom()
    reach_sql = "WITH RECURSIVE reach(id) AS (SELECT 1) SELECT * FROM reach"
    assert check.is_oom(e), (
        f"is_oom missed a real DuckDB OOM: {type(e).__name__}: {e}")
    assert check.should_decompose(e, reach_sql), (
        "fallback predicate did not fire on a real OOM + reach( oracle")
    # and it must NOT fire for non-OOM errors or non-CC oracles
    assert not check.should_decompose(ValueError("boom"), reach_sql), (
        "fallback must not swallow non-OOM oracle errors")
    assert not check.should_decompose(e, "SELECT 1"), (
        "fallback must not engage for non-transitive-closure oracles")
    # the staged-dsir predicate (r16): fires only on exhaustion of the
    # wrapped-spine resample shape, never on other queries or errors
    dsir_sql = (check.DSIR_D_HEAD + "WITH t AS (SELECT doc_id, 1 FROM x)"
                + check.DSIR_D_TAIL + " 1")
    assert check.should_stage_dsir(e, dsir_sql), (
        "staged-dsir predicate did not fire on a real OOM + wrapped spine")
    assert not check.should_stage_dsir(ValueError("boom"), dsir_sql), (
        "staged-dsir must not swallow non-exhaustion errors")
    assert not check.should_stage_dsir(e, "SELECT 1"), (
        "staged-dsir must not engage for other oracles")
    print("PASS test_check_oom: real DuckDB OOM classified, "
          f"predicate gated correctly ({type(e).__name__})")


if __name__ == "__main__":
    main()
