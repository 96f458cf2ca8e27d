#!/usr/bin/env python3
"""Multi-process concurrency/chaos gate for the manifest/lock seams.

Every lock/torn-write/zombie ScalaTest spec runs inside ONE JVM; this
gate launches graft.ChaosWorker as SEPARATE JVMs (tools/run.sh) doing
concurrent append / probe / vacuum against one BM25 layout, plus a real
kill -9 mid-maintenance, and asserts across process boundaries:

  S1 writer_collision : two concurrent appender JVMs — at least one
      loud lock collision, every batch either fully present (reported
      OK) or fully absent (reported LOCKED), no partial batch.
  S2 reader_isolation : appender JVM + prober JVM — every probe serves
      a committed prefix (count divisible by the batch size, monotone
      non-decreasing), zero probe errors.
  S3 kill9_recovery   : kill -9 an appender mid-run — readers still
      serve a committed snapshot; the killed batch applied fully or not
      at all; a blind retry either proceeds or fails loudly with the
      stale-lock remediation, and succeeds after the operator step.
  S4 maint_vs_probes  : append+vacuum(keepVersions=3) JVM + prober JVM
      — retention keeps every pinned read alive; zero probe errors.

Writes the results JSON to the path given as argv[1]
(default CONCURRENCY_r15.json). Exit 0 iff every scenario passed.
"""
import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN = os.path.join(REPO, "tools", "run.sh")
B = 50  # batch size; every doc carries "common" + the batch term "b<i>"


def worker(*args):
    return subprocess.Popen(
        [RUN, "graft.ChaosWorker", *map(str, args)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, cwd=REPO)


def run_sync(*args):
    p = worker(*args)
    out, _ = p.communicate()
    return p.returncode, out.splitlines()


def count_terms(path, terms):
    """One JVM probes every term: {term: count}."""
    rc, lines = run_sync("count", path, *terms)
    out = {}
    for ln in lines:
        if ln.startswith("COUNT "):
            _, term, n = ln.split()
            out[term] = int(n)
    missing = [t for t in terms if t not in out]
    if missing:
        raise RuntimeError(f"count worker rc={rc} missed {missing}: {lines[-5:]}")
    return out


def count_term(path, term):
    return count_terms(path, [term])[term]


def batch_lines(lines):
    ok, locked, err = [], [], []
    for ln in lines:
        parts = ln.split()
        if ln.startswith("BATCH ") and len(parts) >= 3:
            i = int(parts[1])
            if parts[2] == "OK":
                ok.append(i)
            elif parts[2] == "LOCKED":
                locked.append(i)
            else:
                err.append((i, ln))
    return ok, locked, err


def fresh_layout(name):
    path = tempfile.mkdtemp(prefix=f"graft-chaos-{name}-")
    os.rmdir(path)
    rc, lines = run_sync("build", path, B)
    assert rc == 0 and "BUILD OK" in "\n".join(lines), f"build failed: {lines[-5:]}"
    return path


def check_batches(path, ok, absent):
    """Every OK batch fully present; every absent batch fully absent."""
    if not ok and not absent:
        return []
    counts = count_terms(path, [f"b{i}" for i in ok] + [f"b{i}" for i in absent])
    problems = []
    for i in ok:
        if counts[f"b{i}"] != B:
            problems.append(
                f"batch {i} reported OK but has {counts[f'b{i}']}/{B} docs")
    for i in absent:
        if counts[f"b{i}"] != 0:
            problems.append(
                f"batch {i} did not commit but has {counts[f'b{i}']} docs")
    return problems


def s1_writer_collision():
    path = fresh_layout("s1")
    a = worker("append", path, B, 1, 8)
    b = worker("append", path, B, 101, 8)
    out_a, _ = a.communicate()
    out_b, _ = b.communicate()
    ok_a, locked_a, err_a = batch_lines(out_a.splitlines())
    ok_b, locked_b, err_b = batch_lines(out_b.splitlines())
    ok, locked, errs = ok_a + ok_b, locked_a + locked_b, err_a + err_b
    problems = [f"unexpected error: {e}" for _, e in errs]
    if not locked:
        problems.append("no lock collision observed across 16 contended appends")
    problems += check_batches(path, ok, locked)
    common = count_term(path, "common")
    want = (1 + len(ok)) * B
    if common != want:
        problems.append(f"common count {common} != (1+{len(ok)} OK batches)*{B}={want}")
    return {"pass": not problems, "ok_batches": len(ok), "locked": len(locked),
            "problems": problems}


def s2_reader_isolation():
    path = fresh_layout("s2")
    w = worker("append", path, B, 1, 6, 200)
    p = worker("probe", path, B, 60, 250)
    out_w, _ = w.communicate()
    out_p, _ = p.communicate()
    ok, locked, errs = batch_lines(out_w.splitlines())
    counts, perrs, torn = [], [], []
    for ln in out_p.splitlines():
        if ln.startswith("PROBE_ERR"):
            perrs.append(ln)
        elif ln.startswith("PROBE ") and ln.split()[1].isdigit():
            c = int(ln.split()[1])
            counts.append(c)
            if "TORN" in ln:
                torn.append(c)
    problems = [f"probe error: {e}" for e in perrs]
    problems += [f"torn probe count {c} (not a committed prefix)" for c in torn]
    if any(prev > cur for prev, cur in zip(counts, counts[1:])):
        problems.append(f"probe counts not monotone: {counts}")
    if locked or errs:
        problems.append(f"single writer hit locks/errors: {locked} {errs}")
    problems += check_batches(path, ok, [])
    if counts and counts[-1] != (1 + len(ok)) * B:
        problems.append(f"final probe {counts[-1]} != committed {(1 + len(ok)) * B}")
    return {"pass": not problems, "n_probes": len(counts),
            "distinct_counts": sorted(set(counts)), "problems": problems}


def s3_kill9_recovery():
    path = fresh_layout("s3")
    w = worker("append", path, B, 1, 30, 0)
    seen = []
    # read lines until 3 batches committed, then kill -9 mid-batch
    for ln in w.stdout:
        ok, _, _ = batch_lines([ln.strip()])
        seen += ok
        if len(seen) >= 3:
            break
    time.sleep(0.7)  # land inside batch 4's append, past its lock grab
    os.kill(w.pid, signal.SIGKILL)
    w.wait()
    drain = w.stdout.read().splitlines()
    more_ok, _, _ = batch_lines(drain)
    seen += more_ok
    killed = max(seen) + 1
    problems = []
    # readers still serve a committed snapshot
    common = count_term(path, "common")
    if common % B != 0:
        problems.append(f"post-kill probe count {common} is torn")
    kb = count_term(path, f"b{killed}")
    if kb not in (0, B):
        problems.append(f"killed batch {killed} applied partially: {kb}/{B}")
    problems += check_batches(path, seen, [])
    # blind retry: either proceeds (lock released between batches) or
    # fails loudly with the stale-lock remediation
    rc, lines = run_sync("append", path, B, 200, 1)
    ok, locked, errs = batch_lines(lines)
    recovery = "clean"
    if locked:
        recovery = "stale-lock remediation"
        lock = os.path.join(path, ".graft.index.lock")
        if not os.path.exists(lock):
            problems.append("retry reported LOCKED but no lock file exists")
        else:
            os.unlink(lock)  # the documented operator step, post-confirmation
        rc, lines = run_sync("append", path, B, 200, 1)
        ok, locked, errs = batch_lines(lines)
    if ok != [200] or errs:
        problems.append(f"blind retry failed after {recovery}: {lines[-5:]}")
    if count_term(path, "b200") != B:
        problems.append("retried batch 200 not fully present")
    final = count_term(path, "common")
    if final % B != 0:
        problems.append(f"final count {final} torn")
    return {"pass": not problems, "committed_before_kill": len(seen),
            "killed_batch_docs": kb, "recovery": recovery, "problems": problems}


def s4_maint_vs_probes():
    path = fresh_layout("s4")
    m = worker("maint", path, B, 1, 6)
    p = worker("probe", path, B, 60, 250)
    out_m, _ = m.communicate()
    out_p, _ = p.communicate()
    ok, _, errs = batch_lines(out_m.splitlines())
    vac_ok = sum(1 for ln in out_m.splitlines() if ln.startswith("VACUUM OK"))
    vac_err = [ln for ln in out_m.splitlines() if ln.startswith("VACUUM ERR")]
    perrs = [ln for ln in out_p.splitlines() if ln.startswith("PROBE_ERR")]
    torn = [ln for ln in out_p.splitlines()
            if ln.startswith("PROBE ") and "TORN" in ln]
    problems = [f"probe error during vacuum churn: {e}" for e in perrs]
    problems += [f"torn probe: {t}" for t in torn]
    problems += [f"maint error: {e}" for _, e in errs]
    problems += [f"vacuum error: {v}" for v in vac_err]
    problems += check_batches(path, ok, [])
    return {"pass": not problems, "vacuums": vac_ok,
            "n_probes": sum(1 for ln in out_p.splitlines()
                            if ln.startswith("PROBE ")),
            "problems": problems}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CONCURRENCY_r15.json"
    results = {}
    for name, fn in [("writer_collision", s1_writer_collision),
                     ("reader_isolation", s2_reader_isolation),
                     ("kill9_recovery", s3_kill9_recovery),
                     ("maint_vs_probes", s4_maint_vs_probes)]:
        t0 = time.time()
        try:
            results[name] = fn()
        except Exception as e:  # noqa: BLE001 - the gate must always report
            results[name] = {"pass": False, "problems": [f"harness: {e!r}"]}
        results[name]["sec"] = round(time.time() - t0, 1)
        print(f"{name}: {'PASS' if results[name]['pass'] else 'FAIL'} "
              f"({results[name]['sec']}s) {results[name].get('problems') or ''}",
              flush=True)
    results["all_pass"] = all(r["pass"] for r in results.values()
                              if isinstance(r, dict))
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}; all_pass={results['all_pass']}")
    sys.exit(0 if results["all_pass"] else 1)


if __name__ == "__main__":
    main()
