#!/usr/bin/env python3
"""Regenerate BENCH_REF.txt from BENCH_DETAIL.json after a CLEAN full
bench run: keeps the `# sf=` header (Bench skips the regression gate at
any other SF) and any `# `-comment annotations, replaces every
`name time` line with the fresh per-query seconds.

Usage: python3 tools/regen_bench_ref.py [detail.json] [ref.txt]
"""
import json
import sys


def main():
    detail_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
    ref_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_REF.txt"
    detail = json.load(open(detail_path))
    queries = detail.get("queries")
    if not isinstance(queries, dict) or not queries:
        sys.exit(f"no 'queries' map in {detail_path} — run a FULL bench first")
    bad = sorted(n for n, t in queries.items() if not (t >= 0))
    if bad:
        sys.exit(f"refusing: errored queries in the run: {bad}")
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
