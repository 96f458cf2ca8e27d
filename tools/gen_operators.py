#!/usr/bin/env python3
"""Generate OPERATORS.md — the machine-derived index of the frozen query
surface (VERDICT r15 item 8).

Everything in the emitted file is scraped from the source tree, so the
index cannot rot: re-run after any surface change and commit the result.

    python3 tools/gen_operators.py        # rewrites OPERATORS.md in place

Sections:
  1. Query index: every `"q_*" ->` entry in SparkEntry/queries files —
     defining file:line, the graft op objects its body invokes, and
     whether a DuckDB oracle exists (the driver's value gate).
  2. Operator index: every public `def` of the op/streaming/multimodal/
     expr modules — file:line, first scaladoc sentence (the op's own
     scale/shape claim), and the queries that exercise it.
"""
import os
import re
import sys
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "src/main/scala/graft")

QUERY_FILES = [os.path.join(SRC, "SparkEntry.scala")] + sorted(
    os.path.join(SRC, "queries", f)
    for f in os.listdir(os.path.join(SRC, "queries")) if f.endswith(".scala"))

OP_DIRS = ["ops", "streaming", "multimodal", "pipeline", "expr",
           "expr/catalyst", "sources", "schema"]


def rel(p):
    return os.path.relpath(p, ROOT)


def read(p):
    with open(p, encoding="utf-8") as f:
        return f.read()


# ---------------------------------------------------------------- queries
QKEY = re.compile(r'^\s*"(q_[a-z0-9_]+)"\s*->')


def query_defs():
    """{name: (file, line, body)} for every query lambda; body runs to the
    next query key (or oracleSql map) in the same file."""
    out = {}
    for path in QUERY_FILES:
        lines = read(path).split("\n")
        marks = [(i, m.group(1)) for i, m in
                 ((i, QKEY.match(l)) for i, l in enumerate(lines)) if m]
        # a name can appear twice per file: the queries lambda and the
        # oracleSql string. The DEFINITION is the first occurrence; the
        # oracle occurrence has a string literal (") right after ->
        seen_in_file = set()
        for idx, (i, name) in enumerate(marks):
            if name in seen_in_file:
                continue
            seen_in_file.add(name)
            end = marks[idx + 1][0] if idx + 1 < len(marks) else min(
                i + 80, len(lines))
            # the last entry of a map would otherwise leak into the
            # following top-level member — stop at the first top-level
            # def/val after the key line
            for j in range(i + 1, end):
                if re.match(r"^  (def|val|private|//)", lines[j]):
                    end = j
                    break
            body = "\n".join(lines[i:end])
            if name in out:
                continue  # first definition wins (SparkEntry core first)
            out[name] = (rel(path), i + 1, body)
    return out


def oracle_names():
    """Names with an oracleSql entry: every query name appears once as
    its queries-map lambda and once more as its oracle binding, so a
    TOTAL occurrence count >= 2 across the query files means an oracle
    exists. (The driver enforces the real contract; this column mirrors
    it — a query added without an oracle must show as rows-only here.)"""
    counts = {}
    for path in QUERY_FILES:
        for m in re.finditer(r'"(q_[a-z0-9_]+)"\s*->', read(path)):
            counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return {n for n, c in counts.items() if c >= 2}


# -------------------------------------------------------------- operators
DEF_RE = re.compile(r"^(\s*)def ([A-Za-z_][A-Za-z0-9_]*)\b")
OBJ_RE = re.compile(r"^\s*(?:private\[[a-z]+\]\s+)?object ([A-Za-z_][A-Za-z0-9_]*)")


def first_doc_sentence(lines, def_idx):
    """First sentence of the scaladoc block ending just above def_idx."""
    j = def_idx - 1
    while j >= 0 and (not lines[j].strip() or
                      lines[j].strip().startswith("//") or
                      lines[j].strip().startswith("@")):
        j -= 1
    if j < 0 or not lines[j].strip().endswith("*/"):
        return ""
    # walk back to /**
    k = j
    while k >= 0 and "/**" not in lines[k]:
        k -= 1
    if k < 0:
        return ""
    doc = " ".join(
        re.sub(r"^\s*(/\*\*|\*/|\*)\s?", "", lines[x]).strip()
        for x in range(k, j + 1))
    doc = re.sub(r"\[\[([^\]]+)\]\]", r"\1", doc)
    doc = re.sub(r"\{\{\{.*", "", doc)
    doc = re.sub(r"\s+", " ", doc).strip()
    # first sentence, clipped
    m = re.match(r"(.+?\.)\s", doc + " ")
    s = m.group(1) if m else doc
    return s[:180] + ("…" if len(s) > 180 else "")


def op_defs():
    """[(object, def, file, line, doc)] for public defs in op modules."""
    out = []
    for d in OP_DIRS:
        full = os.path.join(SRC, d)
        if not os.path.isdir(full):
            continue
        for f in sorted(os.listdir(full)):
            if not f.endswith(".scala"):
                continue
            path = os.path.join(full, f)
            lines = read(path).split("\n")
            obj = None
            for i, l in enumerate(lines):
                om = OBJ_RE.match(l)
                if om:
                    obj = om.group(1)
                dm = DEF_RE.match(l)
                if dm and obj and "private" not in l.split("def")[0]:
                    name = dm.group(2)
                    if name in ("main", "apply", "unapply", "toString",
                                "equals", "hashCode"):
                        continue
                    out.append((obj, name, rel(path), i + 1,
                                first_doc_sentence(lines, i)))
    return out


def main():
    qdefs = query_defs()
    oracles = oracle_names()
    ops = op_defs()

    # op usage: object.method tokens inside each query body
    usage = defaultdict(set)
    opset = {(o, m) for o, m, _, _, _ in ops}
    call = re.compile(r"\b([A-Z][A-Za-z0-9]*)\.([a-z][A-Za-z0-9]*)\b")
    for qname, (_, _, body) in qdefs.items():
        for o, m in call.findall(body):
            if (o, m) in opset:
                usage[(o, m)].add(qname)

    lines = []
    a = lines.append
    a("# OPERATORS — generated index of the frozen query surface")
    a("")
    a("GENERATED FILE — do not edit. Regenerate with:")
    a("")
    a("    python3 tools/gen_operators.py")
    a("")
    a(f"Queries: {len(qdefs)}  ·  oracle-backed: "
      f"{sum(1 for q in qdefs if q in oracles)}  ·  public operator defs: "
      f"{len(ops)}")
    a("")
    a("## 1. Query index")
    a("")
    a("| query | defined at | ops invoked | oracle |")
    a("|---|---|---|---|")
    for q in sorted(qdefs):
        f, ln, body = qdefs[q]
        used = sorted({f"{o}.{m}" for (o, m), qs in usage.items()
                       if q in qs})
        a(f"| {q} | `{f}:{ln}` | {', '.join(used) if used else '—'} | "
          f"{'sql' if q in oracles else 'rows-only'} |")
    a("")
    a("## 2. Operator index")
    a("")
    a("| operator | at | exercised by | doc (first sentence) |")
    a("|---|---|---|---|")
    for o, m, f, ln, doc in sorted(ops):
        qs = sorted(usage.get((o, m), ()))
        shown = ", ".join(qs[:6]) + (f" (+{len(qs)-6})" if len(qs) > 6 else "")
        esc = doc.replace("|", "\\|") if doc else "—"
        a(f"| `{o}.{m}` | `{f}:{ln}` | {shown if qs else '—'} | {esc} |")
    a("")
    out = os.path.join(ROOT, "OPERATORS.md")
    with open(out, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {rel(out)}: {len(qdefs)} queries, {len(ops)} op defs")


if __name__ == "__main__":
    sys.exit(main())
