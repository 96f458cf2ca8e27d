#!/usr/bin/env python3
"""Regenerate BENCH_REF.txt from BENCH_DETAIL.json after a CLEAN full
bench run: keeps the `# sf=` header (Bench skips the regression gate at
any other SF) and any `# `-comment annotations, replaces every
`name time` line with the fresh per-query seconds.

Usage: python3 tools/regen_bench_ref.py [detail.json] [ref.txt]

Anchor mode (VERDICT r15 item 1):

    python3 tools/regen_bench_ref.py --anchor [detail.json] [anchor.txt]

writes a PINNED anchor file (default BENCH_ANCHOR.txt) carrying the
run's calibration-probe figure as `# calibration=SEC`. An anchor is
recorded ONCE and never refreshed — it REFUSES to overwrite an existing
anchor (delete it by hand only with a written adjudication in SURVEY).
Bench computes calibration-normalized cumulative drift against it:
(t_q / anchor_q) / (calib_now / calib_anchor).
"""
import json
import sys


def main():
    args = [a for a in sys.argv[1:] if a != "--anchor"]
    anchor = "--anchor" in sys.argv[1:]
    detail_path = args[0] if len(args) > 0 else "BENCH_DETAIL.json"
    ref_path = args[1] if len(args) > 1 else (
        "BENCH_ANCHOR.txt" if anchor else "BENCH_REF.txt")
    detail = json.load(open(detail_path))
    queries = detail.get("queries")
    if not isinstance(queries, dict) or not queries:
        sys.exit(f"no 'queries' map in {detail_path} — run a FULL bench first")
    bad = sorted(n for n, t in queries.items() if not (t >= 0))
    if bad:
        sys.exit(f"refusing: errored queries in the run: {bad}")
    if anchor:
        import os
        if os.path.exists(ref_path):
            sys.exit(f"refusing: {ref_path} already exists — the anchor is "
                     "pinned by design (the per-round-refresh ratchet is the "
                     "defect it fixes); delete it by hand only with a written "
                     "adjudication in SURVEY.md")
        calib = (detail.get("calibration") or {}).get("sec")
        if not (isinstance(calib, (int, float)) and calib > 0):
            sys.exit(f"refusing: no positive calibration.sec in {detail_path}"
                     " — the anchor is useless without its probe figure")
        comments = [f"# sf={detail.get('sf', '/root/testdata/sf0.1')}",
                    f"# calibration={calib}",
                    "# PINNED ANCHOR - never refresh. Bench reports"
                    " calibration-normalized cumulative drift against it."]
    else:
        comments = []
        try:
            comments = [l for l in open(ref_path).read().splitlines()
                        if l.startswith("#")]
        except FileNotFoundError:
            pass
        if not any(l.startswith("# sf=") for l in comments):
            comments.insert(0, f"# sf={detail.get('sf', '/root/testdata/sf0.1')}")
    body = [f"{n} {queries[n]}" for n in sorted(queries)]
    with open(ref_path, "w") as f:
        f.write("\n".join(comments + body) + "\n")
    print(f"wrote {ref_path}: {len(body)} queries, {len(comments)} comment lines")


if __name__ == "__main__":
    main()
