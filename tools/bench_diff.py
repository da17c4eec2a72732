#!/usr/bin/env python3
"""Round-over-round bench triage (dev tool only). Usage:

    python3 tools/bench_diff.py OLD_BENCH.json NEW_BENCH.json [--ratio 2.0]

Accepts either a raw `graft.Bench` JSON line (possibly with an sbt
"[info] " prefix) or the driver's BENCH_r{N}.json wrapper (whose `tail`
field embeds the line). For every query present in both artifacts it
reports the median ratio; queries beyond --ratio (default 2x, min 0.2s)
are flagged and — when the NEW artifact carries the round-8 self-
diagnosis fields — auto-adjudicated:

  - runs spread > 2x between min and max  -> "noisy run" (pressure,
    rerun before believing it)
  - per-query gc_ms > 30% of the median   -> "GC pressure"
  - otherwise                             -> "consistent slowdown"
    (three agreeing runs: treat as a real plan-cost change)

This encodes the round-7 lesson: a 10x driver-side regression on
unchanged code was indistinguishable from plan cost until the artifact
carried per-run and GC data."""
import json
import re
import sys


def load(path):
    import os
    text = open(path).read()
    # driver wrapper: {"n":..,"tail":"...{\"metric\":...}\n..."} — the tail
    # keeps only the END of the output, so the line may start mid-JSON
    try:
        outer = json.loads(text)
        if isinstance(outer, dict) and "queries" not in outer and "tail" in outer:
            text = outer["tail"]
    except json.JSONDecodeError:
        pass
    m = re.search(r'\{"metric".*\}', text)
    if m:
        d = json.loads(m.group(0))
        # since r9 the per-run/GC diagnostics live in a side file (the main
        # line must stay under the driver's tail-capture buffer); merge a
        # sibling bench_diag.json when present so adjudication still works
        diag_path = os.path.join(os.path.dirname(os.path.abspath(path)),
                                 "bench_diag.json")
        if "runs" not in d and os.path.exists(diag_path):
            try:
                raw = open(diag_path, "rb").read()
                diag = json.loads(raw)
                # identity check: Bench overwrites bench_diag.json in CWD on
                # every run, so a stale diag must not drive adjudication
                # verdicts for this artifact. Since r12 the contract line
                # carries the diag file's sha256 — a content-hash identity
                # (stale, hand-edited, or wrong-run diags all fail it).
                # Older artifacts fall back to the r10 (sf, total, nq)
                # triple; nq compares against the artifact's own "nq" field
                # when present (since r12 the inline queries map is only the
                # worst-10, so its length is NOT the query count).
                if "diag_sha256" in d:
                    import hashlib
                    ok = hashlib.sha256(raw).hexdigest() == d["diag_sha256"]
                    if not ok:
                        print(f"note: ignoring {diag_path} "
                              f"(sha256 does not match the artifact's "
                              f"diag_sha256 — stale or modified diag)",
                              file=sys.stderr)
                else:
                    same_sf = diag.get("sf") == d.get("sf")
                    same_total = ("total" not in diag or "value" not in d
                                  or abs(float(diag["total"]) - float(d["value"])) < 1e-6)
                    same_nq = ("nq" not in diag
                               or diag["nq"] == d.get("nq", len(d.get("queries", {}))))
                    ok = same_sf and same_total and same_nq
                    if not ok:
                        print(f"note: ignoring {diag_path} (identity mismatch: "
                              f"sf {diag.get('sf')!r} vs {d.get('sf')!r}, "
                              f"total {diag.get('total')!r} vs {d.get('value')!r}, "
                              f"nq {diag.get('nq')!r} vs "
                              f"{d.get('nq', len(d.get('queries', {})))})",
                              file=sys.stderr)
                if ok:
                    for key in ("runs", "gc_ms", "input_records"):
                        if key in diag:
                            d[key] = diag[key]
                    # since r12 the artifact's inline map is the worst-10
                    # subset; the diag carries the full medians
                    if len(diag.get("queries", {})) > len(d.get("queries", {})):
                        d["queries"] = diag["queries"]
            except (json.JSONDecodeError, OSError):
                pass
        return d
    # truncated fragment: scrape "name":float pairs out of the queries
    # region (everything before the first close-brace of the queries dict)
    region = re.split(r'\},"(?:runs|failed|gc_ms)"', text)[0]
    pairs = re.findall(r'"([a-z0-9_]+)":([0-9]+(?:\.[0-9]+)?)', region)
    queries = {k: float(v) for k, v in pairs if k not in ("metric", "value", "sf")}
    if not queries:
        sys.exit(f"no bench JSON line found in {path}")
    return {"queries": queries}


def main():
    args = []
    ratio_gate = 2.0
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--ratio":
            if i + 1 >= len(argv):
                sys.exit("--ratio needs a value\n" + __doc__)
            ratio_gate = float(argv[i + 1])
            i += 2
        else:
            args.append(argv[i])
            i += 1
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    print(f"shared queries: {len(shared)}  "
          f"old total {sum(oq[k] for k in shared):.1f}s  "
          f"new total {sum(nq[k] for k in shared):.1f}s")
    # machine-class normalization (r10): when both artifacts carry the
    # fixed CPU-bound "calib" probe, divide the machine multiplier out of
    # every ratio — the r9 judge had to re-derive a ~2x sandbox slowdown
    # from untouched queries by hand.
    machine = 1.0
    if old.get("calib") and new.get("calib"):
        machine = float(new["calib"]) / float(old["calib"])
        norm = sum(nq[k] for k in shared) / machine
        print(f"machine multiplier (new/old calib): {machine:.2f}x  "
              f"-> machine-normalized new total {norm:.1f}s")
    # scan-budget regression check (r10): when both diags carry
    # input_records, a records ratio far above the data's own growth means
    # a query started physically re-scanning its source (the AQE
    # shared-subtree failure class) — invisible to wall-clock on
    # page-cached local parquet, fatal at 100 TB. Same-sf comparisons
    # should show ratio ~1.0 for every query.
    oir, nir = old.get("input_records", {}), new.get("input_records", {})
    if oir and nir and old.get("sf") != new.get("sf"):
        # cross-sf diffs would flag every query as a spurious scan
        # regression — records legitimately grow with the data
        print(f"note: skipping scan-budget check (sf {old.get('sf')!r} vs "
              f"{new.get('sf')!r} — records grow with the data)",
              file=sys.stderr)
        oir, nir = {}, {}
    scan_flagged = [
        (k, oir[k], nir[k])
        for k in shared if k in oir and k in nir and oir[k] > 0
        and nir[k] / oir[k] > 1.5]
    if scan_flagged:
        print(f"\nSCAN-BUDGET regressions (records read grew >1.5x):")
        for k, a, b in sorted(scan_flagged, key=lambda x: -x[2] / x[1]):
            print(f"  {k}: {a} -> {b} records ({b / a:.1f}x) — a branch is "
                  f"re-scanning its source")
    flagged = []
    for k in shared:
        a, raw = oq[k], nq[k]
        b = raw / machine  # machine-normalized; == raw without calib data
        if b > ratio_gate * a and b > 0.2:
            verdict = "consistent slowdown (likely real)"
            runs = new.get("runs", {}).get(k)
            gc = new.get("gc_ms", {}).get(k)
            if runs and max(runs) > 2 * min(runs):
                verdict = f"noisy run {['%.2f' % r for r in runs]} — rerun"
            elif gc is not None and gc > 300 * raw:  # gc_ms vs raw median(s): 30%
                verdict = f"GC pressure ({gc} ms during 3 runs)"
            flagged.append((k, a, b, verdict))
    if not flagged:
        gate = (f"{ratio_gate}x machine-normalized" if machine != 1.0
                else f"{ratio_gate}x")
        print(f"no query regressed beyond {gate} — clean round")
        return
    print(f"\n{len(flagged)} regression(s) beyond {ratio_gate}x"
          + (" (machine-normalized)" if machine != 1.0 else "") + ":")
    for k, a, b, verdict in sorted(flagged, key=lambda x: -x[2] / x[1]):
        print(f"  {k}: {a:.2f}s -> {b:.2f}s ({b / a:.1f}x)  [{verdict}]")
    new_only = sorted(set(nq) - set(oq))
    if new_only:
        print(f"\nnew queries (no baseline): {', '.join(new_only)}")


if __name__ == "__main__":
    main()
