#!/usr/bin/env python3
"""Regenerate SURVEY.md section 8 as a greppable gate -> file:line table.

Scans the query-family sources for every gate definition ("q_name" ->) and
its oracle twin, and emits one markdown row per gate. Run from the repo
root; prints the section to stdout, or splices it into SURVEY.md in place:

    python3 tools/gen_survey8.py            # stdout only
    python3 tools/gen_survey8.py --write    # replace SURVEY.md's generated block

--write is IDEMPOTENT: it replaces everything from the generated block's
first line ("Gates: N oracle-adjudicated...") to end of file (section 8 is
the last section), so re-running never appends a duplicate trailer — the
r16 hand-splice appended instead of replacing and tripled the bench-only
line.
"""
import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

QUERY_DIR = Path("src/main/scala/graft/queries")
BENCH = Path("src/main/scala/graft/Bench.scala")


def gate_sites():
    """gate -> [(file, line), ...] in definition order (query map first,
    oracle map second)."""
    sites = {}
    for f in sorted(QUERY_DIR.glob("*.scala")):
        for i, line in enumerate(f.read_text().splitlines(), 1):
            # finditer, not search: programmatic oracle maps chain several
            # ("q_x" -> expr) entries on ONE line — search() saw only the
            # first and under-reported their twins as missing
            for m in re.finditer(r'"(q[0-9a-z_]+)" ->', line):
                sites.setdefault(m.group(1), []).append((str(f), i))
    return sites


def family_of(path):
    return {
        "RelationalQueries.scala": "relational",
        "VectorQueries.scala": "vector/ANN",
        "PipelineQueries.scala": "LLM pipeline",
        "ConnectorQueries.scala": "connector",
        "AdvancedQueries.scala": "advanced SQL",
    }.get(Path(path).name, Path(path).stem)


def main():
    sites = gate_sites()
    rows = []
    for gate in sorted(sites):
        occ = sites[gate]
        qfile, qline = occ[0]
        oracle = f"{Path(occ[1][0]).name}:{occ[1][1]}" if len(occ) > 1 else "—"
        rows.append((gate, family_of(qfile), f"{qfile}:{qline}", oracle))
    bench_only = []
    bench_shadows = []
    in_bench = BENCH.read_text()
    for m in re.finditer(r'"(q[0-9a-z_]+)" ->', in_bench):
        if m.group(1) not in sites:
            bench_only.append(m.group(1))
        else:
            bench_shadows.append(m.group(1))
    # the r18 verdict flagged a drifted hand-written enumeration: the
    # bench-only set must be DISJOINT from the gated set by construction,
    # and any overlap here is a script bug, not a doc choice
    overlap = set(bench_only) & set(sites)
    assert not overlap, f"bench-only overlaps gated set: {sorted(overlap)}"
    print(f"Gates: {len(rows)} oracle-adjudicated "
          f"(+{len(set(bench_only))} bench-only). One row per gate;")
    print("`queries` entry first, `oracleSql` twin second — regenerate with")
    print("`python3 tools/gen_survey8.py`.")
    print()
    print("| gate | family | query definition | oracle twin |")
    print("|---|---|---|---|")
    for gate, fam, qsite, osite in rows:
        print(f"| `{gate}` | {fam} | `{qsite}` | `{osite}` |")
    if bench_only:
        print()
        print("Bench-only (production-kernel configurations without a"
              " SQL-replayable twin, measured not gated):",
              ", ".join(f"`{g}`" for g in sorted(set(bench_only))),
              f"— `{BENCH}`.")
    if bench_shadows:
        print()
        print("Bench rows sharing a GATED name run that gated kernel at a"
              " bench-specific scale/substrate (tmpfs, larger corpus) —"
              " shadows of gated kernels, not separate operators:",
              ", ".join(f"`{g}`" for g in sorted(set(bench_shadows))) + ".")


def write_in_place():
    buf = io.StringIO()
    with redirect_stdout(buf):
        main()
    survey = Path("SURVEY.md")
    lines = survey.read_text().splitlines()
    try:
        hdr = next(i for i, l in enumerate(lines) if l.startswith("## 8."))
        start = next(i for i, l in enumerate(lines[hdr:], hdr)
                     if l.startswith("Gates: "))
    except StopIteration:
        sys.exit("SURVEY.md: no '## 8.' header or 'Gates: ' block to replace")
    survey.write_text("\n".join(lines[:start]) + "\n" + buf.getvalue())
    print(f"SURVEY.md: replaced generated block (was lines {start + 1}-{len(lines)})")


if __name__ == "__main__":
    if "--write" in sys.argv[1:]:
        write_in_place()
    else:
        main()
