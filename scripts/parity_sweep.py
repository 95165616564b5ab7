#!/usr/bin/env python3
"""Mechanical PARITY.md anchor sweep (the r16 GATE ritual, made durable).

Resolves every `file:line` citation in PARITY.md against the working
tree and prints each cited line's content. A citation FAILS when the
cited line is blank, a lone brace, or a bare comment continuation —
i.e. it no longer lands on the named def/class/test/val the ledger
points at. Contextual `:N` citations (backtick refs without a file)
resolve against the most recently named .scala file, which is how the
ledger reads to a human.

Known limitation, stated: the check is content-agnostic — an insertion
that shifts one named test exactly onto another cited line number still
passes (it happened live in r17: a new test landed on the old line of
the admission-boundary test). Exit 0 means "every cited line is code";
the seal ritual is exit 0 PLUS an eyeball of the non-quiet output,
where each line's content is printed next to its citation.

Usage: python3 scripts/parity_sweep.py [--quiet]
Exit 0 when every citation resolves to a plausible anchor line.
"""
import re
import sys
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
QUIET = "--quiet" in sys.argv

# basename -> path, for every scala source (test + main)
paths = {}
for p in ROOT.glob("src/**/*.scala"):
    paths.setdefault(p.name, []).append(p)

text = (ROOT / "PARITY.md").read_text()

# explicit: Optional/path/File.scala:12,34   contextual: `:12,34`
explicit = re.compile(r"([A-Za-z0-9_]+(?:/[A-Za-z0-9_]+)*\.scala):(\d+(?:,\d+)*)")
contextual = re.compile(r"`:(\d+(?:,\d+)*)`")

# an anchor line should carry real code; these are the shapes the ledger
# cites (entry points, processors, tests, named vals) or at minimum a
# non-empty statement
PLAUSIBLE = re.compile(
    r"\b(def|class|object|test\(|val|var|case|override|private|final|new)\b"
    r"|[A-Za-z0-9_]\(")

failures = []
checked = 0
cur_file = None
pos = 0
events = []
for m in explicit.finditer(text):
    events.append((m.start(), "explicit", m))
for m in contextual.finditer(text):
    events.append((m.start(), "contextual", m))
events.sort(key=lambda e: e[0])

for _, kind, m in events:
    if kind == "explicit":
        fname = m.group(1).split("/")[-1]
        lines = m.group(2)
        cur_file = fname
    else:
        if cur_file is None:
            continue
        fname = cur_file
        lines = m.group(1)
    cands = paths.get(fname)
    if not cands:
        failures.append(f"{fname}: file not found in src/")
        continue
    src = cands[0].read_text().splitlines()
    for ln in (int(x) for x in lines.split(",")):
        checked += 1
        if ln < 1 or ln > len(src):
            failures.append(f"{fname}:{ln}: beyond EOF ({len(src)} lines)")
            continue
        content = src[ln - 1].strip()
        ok = bool(content) and content not in ("}", "{", "})", "},") \
            and PLAUSIBLE.search(content)
        tag = "ok " if ok else "FAIL"
        if not ok:
            failures.append(f"{fname}:{ln}: {content!r}")
        if not QUIET:
            print(f"[{tag}] {fname}:{ln}: {content[:100]}")

print(f"\n[sweep] {checked} cited lines checked, {len(failures)} failures")
for f in failures:
    print(f"[sweep-fail] {f}")
sys.exit(1 if failures else 0)
