#!/usr/bin/env python3
"""Local pre-check of the DuckDB oracle contract (mimics the driver's t2 gate).

Usage:
  sbt -batch "runMain graft.Verify <sfDir> <outDir> [name1,name2,...]"
  python3 scripts/oracle_check.py <sfDir> <outDir> [--only name1,name2,...] [--all]

SUBSET MODE IS THE DEFAULT (r13 verdict task 6): the query universe is the
set of dumps actually present in <outDir> — a partial graft.Verify run
checks exactly what it dumped, prints that many rows, and exits 0 when all
pass (previously a 6-query dump printed 264 spurious MISSING lines).
  --only a,b,c  restricts further AND reports MISSING for a requested name
                with no dump (typo guard for targeted reruns);
  --all         restores the full-catalog universe (every oracle_sql.json
                entry; a missing dump is then a failure) — use before
                sealing a GATE snapshot with a full Verify run.

For each <outDir>/<name>/ parquet dump with an entry in oracle_sql.json:
run the SQL in DuckDB against views over <sfDir>/*.parquet, sort columns by
name, sort rows, and compare cell-by-cell. EXACT by default — the driver
hashes values exactly, so a float that differs in the last bit is a driver
FAIL and must be one here too (round-2 lesson: the old 1e-9 tolerance let
"69/69 locally" ship a driver-red query). Pass --tol for a diagnostic run
that reports near-misses instead (never before a snapshot).

TYPE-STRICT (round-3 lesson): values are compared via fetchall(), where
DuckDB HUGEINT and BIGINT both surface as Python int — but the driver's
hasher distinguishes int128 from int64 (q_win_sessionize failed three rounds
on identical values). So we ALSO compare DuckDB-side column types of the
oracle result against the Spark parquet dump's types and fail on any
mismatch; a HUGEINT anywhere in an oracle result (any uncast SUM of ints,
plain or windowed) is always fatal.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

EXACT = True


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((v is not None, str(v)) for v in t))
    return [cols[i] for i in order], out


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        if EXACT:
            return fa == fb
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)


def main(sf_dir, out_dir, only=None, full=False):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    if only is not None:
        universe = [n for n in sorted(only)]
        unknown = [n for n in universe if n not in oracle]
        for n in unknown:
            print(f"UNKNOWN  {n}: no oracle_sql.json entry")
        universe = [n for n in universe if n in oracle]
    elif full:
        universe = sorted(oracle)
    else:
        # subset mode (default): what was dumped IS the universe
        universe = sorted(
            n for n in oracle if (Path(out_dir) / n).exists())
        if not universe:
            print(f"no dumps with oracle entries under {out_dir}")
            return 1
    n_pass = n_fail = 0
    failures = []
    if only is not None and unknown:
        n_fail += len(unknown)
        failures.extend(unknown)
    for name in universe:
        dump = Path(out_dir) / name
        if not dump.exists():
            print(f"MISSING  {name}: no spark dump")
            n_fail += 1
            failures.append(name)
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{dump}/*.parquet')")
            spark_cols = [c.lower() for c in spark_rel.columns]
            spark_types = [str(t) for t in spark_rel.types]
            spark_rows = spark_rel.fetchall()
            duck_rel = con.sql(oracle[name])
            duck_cols = [c.lower() for c in duck_rel.columns]
            duck_types = [str(t) for t in duck_rel.types]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            failures.append(name)
            continue
        sc, sr = canon(spark_rows, spark_cols)
        dc, dr = canon(duck_rows, duck_cols)
        if sc != dc:
            print(f"SCHEMA   {name}: spark={sc} duck={dc}")
            n_fail += 1
            failures.append(name)
            continue
        # Type gate: fetchall() is width-blind (HUGEINT == BIGINT == int in
        # Python) but the driver's hasher is not — compare DuckDB-rendered
        # column types of both sides, name-aligned, before looking at values.
        stypes = {c: t for c, t in zip(spark_cols, spark_types)}
        dtypes = {c: t for c, t in zip(duck_cols, duck_types)}
        type_bad = [(c, stypes[c], dtypes[c]) for c in sc if stypes[c] != dtypes[c]]
        huge = [c for c in dc if "HUGEINT" in dtypes[c]]
        if type_bad or huge:
            for c, st, dt in type_bad:
                print(f"TYPE     {name}: col {c}: spark={st} duck={dt}"
                      + ("  (HUGEINT: driver hasher distinguishes int128!)" if "HUGEINT" in dt else ""))
            for c in huge:
                if all(c != b[0] for b in type_bad):
                    print(f"TYPE     {name}: col {c}: oracle emits {dtypes[c]} — always fatal")
            n_fail += 1
            failures.append(name)
            continue
        if len(sr) != len(dr):
            print(f"ROWCOUNT {name}: spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            failures.append(name)
            continue
        bad = None
        exact = True
        for i, (a, b) in enumerate(zip(sr, dr)):
            for j, (x, y) in enumerate(zip(a, b)):
                if not cells_equal(x, y):
                    bad = (i, sc[j], x, y)
                    break
                if isinstance(x, float) and isinstance(y, float) and x != y:
                    exact = False
            if bad:
                break
        if bad:
            i, c, x, y = bad
            print(f"VALUE    {name}: row {i} col {c}: spark={x!r} duck={y!r}")
            n_fail += 1
            failures.append(name)
        else:
            flag = "" if exact else "  (float within tol, NOT bit-exact)"
            print(f"OK       {name}: {len(sr)} rows{flag}")
            n_pass += 1
    mode = "exact" if EXACT else "1e-9 tolerance (DIAGNOSTIC ONLY — driver hashes exactly)"
    scope = ("--only" if only is not None else
             "full catalog" if full else f"subset = {len(universe)} dumped")
    print(f"\n[{mode}, {scope}] {n_pass} ok, {n_fail} failed"
          + (f": {failures}" if failures else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    EXACT = "--tol" not in args
    full = "--all" in args
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    argv = [a for a in args if a not in ("--tol", "--all")]
    sys.exit(main(argv[0], argv[1], only=only, full=full))
