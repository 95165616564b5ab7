#!/usr/bin/env python3
"""Content-aware PARITY.md anchor sweep (r16 ritual; content checks r18).

Resolves every `file:line` citation in PARITY.md against the working
tree and checks the cited line's CONTENT, not just that it is code.
Three checks, strongest applicable wins:

 1. NAME: a backticked identifier adjacent to the citation — the ledger
    conventions `` `name` (`File.scala:N`) `` and
    `` `File.scala:N` (`name` ...) `` — must appear verbatim on the
    cited line.
 2. DESCRIPTION: a parenthesized prose blurb after the citation
    (`` `File.scala:N` (reversed arrival) ``) or a labelled contextual
    citation (`` admission boundary: `:265` ``), when the cited line is
    a test(...) line, must share a word-stem (>= 4 chars, prefix match)
    with the test's quoted title. This is the check that catches the
    r17 near-miss class: an insertion shifting a DIFFERENT named test
    exactly onto a cited line number now fails instead of passing.
 3. PLAUSIBLE: citations with neither a name nor a matchable
    description fall back to the r16 rule — the line must carry real
    code (def/class/test/val/..., not a blank or a lone brace). This
    residual class is reported in the summary line so its size is
    visible at seal time.

Contextual `:N` citations (backtick refs without a file) resolve
against the most recently named .scala file — the PATH it resolved to,
not just the basename. A basename shared by two source files is an
ERROR unless the citation carries a disambiguating path suffix
(`streaming/Foo.scala:3`).

Usage: python3 scripts/parity_sweep.py [--quiet] [--selftest]
  --selftest: (1) the real tree must pass; (2) a synthetic fixture
  reproducing the r17 near-miss — a different test's opening line
  occupying a cited line number in BufferedSessionStreamSpec — must
  FAIL. Exercised by the GATE ritual so the content checks cannot
  silently rot.
Exit 0 when every citation resolves to its named/described anchor.
"""
import re
import sys
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
QUIET = "--quiet" in sys.argv
SELFTEST = "--selftest" in sys.argv

# explicit: Optional/path/File.scala:12,34   contextual: `:12,34`
EXPLICIT = re.compile(r"([A-Za-z0-9_]+(?:/[A-Za-z0-9_]+)*\.scala):(\d+(?:,\d+)*)")
CONTEXTUAL = re.compile(r"`:(\d+(?:,\d+)*)`")

# an anchor line should carry real code; these are the shapes the ledger
# cites (entry points, processors, tests, named vals) or at minimum a
# non-empty statement
PLAUSIBLE = re.compile(
    r"\b(def|class|object|test\(|val|var|case|override|private|final|new)\b"
    r"|[A-Za-z0-9_]\(")

# name adjacent to the citation: `name` (`<cite>  /  <cite>` (`name`
NAME_BEFORE = re.compile(r"`([A-Za-z_]\w*)`\s*\(`$")
NAME_AFTER = re.compile(r"^`?\s*\(`([A-Za-z_]\w*)`")
# prose blurb after the citation: <cite>` (reversed arrival)
DESC_AFTER = re.compile(r"^`?\s*\(([^()]{4,160})\)")
# labelled contextual: "; admission boundary: `:265`" — label back to
# the previous clause separator — or the colon-less tail form
# "cross-batch merge `:264`"
DESC_BEFORE = re.compile(r"([^;|,`\n]{4,160}):\s*$")
DESC_BEFORE_BARE = re.compile(r"(?:^|[;,|)])\s*([^;|,`:()\n]{4,80})\s$")

TEST_TITLE = re.compile(r"test\(\"([^\"]+)")
WORD = re.compile(r"[a-z0-9]{4,}")


def stems(s):
    return set(WORD.findall(s.lower()))


def stem_overlap(a, b):
    return any(x.startswith(y) or y.startswith(x) for x in a for y in b)


def build_paths(root):
    paths = {}
    for p in root.glob("src/**/*.scala"):
        paths.setdefault(p.name, []).append(p)
    return paths


def sweep(text, paths, read_lines, quiet=True):
    """Returns (checked, counts-by-check, failures list)."""
    failures = []
    checked = 0
    kinds = {"name": 0, "desc": 0, "plausible": 0}
    cur_path = None
    events = [(m.start(), "explicit", m) for m in EXPLICIT.finditer(text)]
    events += [(m.start(), "contextual", m) for m in CONTEXTUAL.finditer(text)]
    events.sort(key=lambda e: e[0])

    for _, kind, m in events:
        if kind == "explicit":
            full, lines = m.group(1), m.group(2)
            fname = full.split("/")[-1]
            cands = paths.get(fname)
            if not cands:
                failures.append(f"{fname}: file not found in src/")
                cur_path = None
                continue
            matching = [p for p in cands if str(p).endswith(full)]
            if len(matching) != 1:
                # two sources share the basename and the citation does not
                # disambiguate (or the given path matches nothing) — an
                # anchor could otherwise validate against the wrong file
                failures.append(
                    f"{full}: ambiguous or unmatched path "
                    f"({len(cands)} candidates: "
                    f"{', '.join(str(p.relative_to(ROOT)) for p in cands)}) — "
                    f"cite a disambiguating path suffix")
                cur_path = None
                continue
            cur_path = matching[0]
        else:
            if cur_path is None:
                continue
            lines = m.group(1)
        fname = cur_path.name
        src = read_lines(cur_path)

        # anchor identity from the surrounding prose (citation span incl.
        # backticks for contextual; the explicit match sits inside its own
        # backticks so text[m.end()] is '`')
        before, after = text[: m.start()], text[m.end():]
        name = None
        desc = None
        nb, na = NAME_BEFORE.search(before), NAME_AFTER.match(after)
        if nb:
            name = nb.group(1)
        elif na:
            name = na.group(1)
        else:
            da = DESC_AFTER.match(after)
            db = (DESC_BEFORE.search(before) or DESC_BEFORE_BARE.search(before)) \
                if kind == "contextual" else None
            if da:
                desc = da.group(1)
            elif db:
                desc = db.group(1)

        nums = [int(x) for x in lines.split(",")]
        for i, ln in enumerate(nums):
            checked += 1
            if ln < 1 or ln > len(src):
                failures.append(f"{fname}:{ln}: beyond EOF ({len(src)} lines)")
                continue
            content = src[ln - 1].strip()
            plausible = bool(content) and content not in ("}", "{", "})", "},") \
                and PLAUSIBLE.search(content)
            # a name/desc found next to a comma-list applies to the FIRST
            # cited line only (the list's tail are related anchors, e.g.
            # "(`patternMatchCountsExact`; processor `:979`)")
            title = TEST_TITLE.search(content)
            if name and i == 0:
                ok = name in content
                check = "name"
            elif desc and i == 0 and title:
                ok = stem_overlap(stems(desc), stems(title.group(1)))
                check = "desc"
            else:
                ok = plausible
                check = "plausible"
            ok = bool(ok)
            kinds[check] += ok
            tag = "ok " if ok else "FAIL"
            if not ok:
                why = {"name": f"missing `{name}`",
                       "desc": f"test title shares no stem with ({desc})",
                       "plausible": "not an anchor-shaped line"}[check]
                failures.append(f"{fname}:{ln} [{check}: {why}]: {content!r}")
            if not quiet:
                print(f"[{tag}/{check}] {fname}:{ln}: {content[:100]}")
    return checked, kinds, failures


def run_real():
    paths = build_paths(ROOT)
    text = (ROOT / "PARITY.md").read_text()
    cache = {}

    def read_lines(p):
        if p not in cache:
            cache[p] = p.read_text().splitlines()
        return cache[p]

    checked, kinds, failures = sweep(text, paths, read_lines, quiet=QUIET)
    print(f"\n[sweep] {checked} cited lines checked "
          f"(name {kinds['name']}, desc {kinds['desc']}, "
          f"plausible {kinds['plausible']}), {len(failures)} failures")
    for f in failures:
        print(f"[sweep-fail] {f}")
    return len(failures)


def run_selftest():
    # (1) positive control: the real tree must be clean
    if run_real() != 0:
        print("[selftest] FAIL: real tree not clean; fixture check skipped")
        return 1
    # (2) the r17 near-miss, reproduced: a DIFFERENT test's opening line
    # occupying a cited line number must now FAIL. Take the first
    # description-checked citation of BufferedSessionStreamSpec (the file
    # where the near-miss happened live) and overwrite its cited line
    # with a foreign test header in an in-memory copy of the file.
    paths = build_paths(ROOT)
    text = (ROOT / "PARITY.md").read_text()
    target = paths["BufferedSessionStreamSpec.scala"][0]
    m = re.search(r"BufferedSessionStreamSpec\.scala:(\d+)", text)
    if not m:
        print("[selftest] FAIL: no BufferedSessionStreamSpec citation found")
        return 1
    ln = int(m.group(1))
    doctored = target.read_text().splitlines()
    doctored[ln - 1] = \
        '  test("synthetic probe: a foreign test landed on this line") {'

    def read_lines(p):
        return doctored if p == target else p.read_text().splitlines()

    _, _, failures = sweep(text, paths, read_lines, quiet=True)
    hit = [f for f in failures
           if f.startswith(f"BufferedSessionStreamSpec.scala:{ln} ")]
    if not hit:
        print(f"[selftest] FAIL: a foreign test header at {target.name}:{ln} "
              f"passed the sweep (failures: {failures})")
        return 1
    print(f"[selftest] ok: near-miss fixture caught at {target.name}:{ln} "
          f"-> {hit[0][:120]}")

    # (3) the NAME-class twin: a cited entry point replaced by a
    # different def on the same line must also fail.
    nm = re.search(r"`(\w+)` \(`([\w/]+\.scala):(\d+)", text)
    if not nm:
        print("[selftest] FAIL: no name-convention citation found")
        return 1
    nname, nfull, nln = nm.group(1), nm.group(2), int(nm.group(3))
    ntarget = [p for p in paths[nfull.split("/")[-1]] if str(p).endswith(nfull)][0]
    ndoc = ntarget.read_text().splitlines()
    ndoc[nln - 1] = "  def someOtherEntryPoint(): Unit = {"

    def read_lines2(p):
        return ndoc if p == ntarget else p.read_text().splitlines()

    _, _, failures2 = sweep(text, paths, read_lines2, quiet=True)
    nhit = [f for f in failures2 if f.startswith(f"{ntarget.name}:{nln} ")]
    if not nhit:
        print(f"[selftest] FAIL: a foreign def at {ntarget.name}:{nln} passed "
              f"the sweep despite the `{nname}` name convention")
        return 1
    print(f"[selftest] ok: name fixture caught at {ntarget.name}:{nln} "
          f"-> {nhit[0][:120]}")
    return 0


if __name__ == "__main__":
    sys.exit(1 if (run_selftest() if SELFTEST else run_real()) else 0)
