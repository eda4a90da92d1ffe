#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
testdata parquet tables, loads the corresponding Spark result parquet from
<outDir>/<name>/, and compares: row count, column names, and values IN
QUERY OUTPUT ORDER (column order normalized by name). The driver's hash
gate is order-sensitive, so every query must end in a total-order sort —
comparing in order catches nondeterministic tie-breaks that a
sort-by-all-columns compare would mask (the round-1 q01 failure mode).

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
       python3 tools/check_oracle.py --boundary-audit <sfDir> <outDir> [names...]
       python3 tools/check_oracle.py --boundary-self-test
       python3 tools/check_oracle.py --type-lint <sfDir> <outDir>
       python3 tools/check_oracle.py --type-lint-self-test

Output-type lint (round 13, the q365/q404 class): DuckDB widens
SUM(BIGINT) to HUGEINT, and this tool's norm() canonicalizes exotic
numerics (HUGEINT->int64, Decimal->float) before comparing — so a
twin whose OUTPUT column is HUGEINT/DECIMAL/FLOAT can pass locally
while the driver's hasher, which hashes the DuckDB-native type,
fails it. That exact blind spot hid an uncast `SUM(SUM(BIGINT))`
column for three rounds. The lint DESCRIBEs every twin and
hard-fails any output column typed HUGEINT/UHUGEINT (Spark has no
INT128), FLOAT (Spark-side outputs are DOUBLE), or DECIMAL that the
Spark parquet does not also emit as the identical decimal(p,s).
It runs inside the main gate (so a lint hit is a FAIL row) and
standalone via --type-lint (DESCRIBE-only, no Spark dump needed).

Boundary audit: the q365 failure class — a raw round() on a double
whose pre-rounding value sits within a few ulps of a d+1-digit
half-boundary — is invisible to a same-version Spark-vs-DuckDB
compare by construction (both engines happen to agree until a DuckDB
upgrade moves the multiply-based side, or Spark's shortest-repr
HALF_UP picks the other side). The audit runs each oracle SQL twice:
once with every DOUBLE-operand round(e, d) replaced by Spark's
semantics (shortest round-trip repr -> exact HALF_UP at d, via
double->VARCHAR->DECIMAL(38,20)), once with adversarial multiply
semantics (sign-aware floor(|v|*10^d + 0.5)) — and flags every OUTPUT
cell where the two runs differ. That is exactly the set of outputs a
legal pair of engine implementations can disagree on; mid-pipeline
divergences absorbed by downstream folds stay clean, so the flag rate
is the real risk rate, not per-site noise. DECIMAL-typed operands are
left alone via a runtime typeof() guard: decimal-space HALF_UP is
exact in both engines (the repo's round-the-DECIMAL-then-cast
discipline). Flags are advisory: inspect, then either accept (data
coincidence on a true-double operand) or convert the site to an
exact-integer / floor-form finish. Only needs oracle_sql.json, not
the Spark dump.
"""
import json
import math
import os
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: float(v) if hasattr(v, "as_tuple") else v)  # Decimal→float
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.reset_index(drop=True)


def lint_output_types(con, sql: str, spark_files=None):
    """DESCRIBE the oracle twin and flag output columns whose DuckDB
    type norm() canonicalizes away but the driver's hasher sees
    natively: HUGEINT/UHUGEINT always (Spark has no INT128 — these
    appear silently via SUM(BIGINT)->HUGEINT), FLOAT always (the repo
    contract is DOUBLE outputs), and DECIMAL unless the Spark parquet
    emits the identical decimal(p,s) for that column. Returns a list
    of 'col: issue' strings; empty = clean."""
    desc = con.execute("DESCRIBE " + sql).fetchdf()
    spark_types = {}
    if spark_files:
        import pyarrow.parquet as pq
        schema = pq.read_schema(spark_files[0])
        spark_types = {f.name: str(f.type) for f in schema}
    flags = []
    for col, ty in zip(desc["column_name"], desc["column_type"]):
        t = ty.upper()
        if "HUGEINT" in t:
            flags.append(f"{col}: oracle emits {ty} (Spark has no INT128; "
                         "CAST the twin's column — SUM(BIGINT) widens)")
        elif t == "FLOAT":
            flags.append(f"{col}: oracle emits FLOAT (outputs must be DOUBLE)")
        elif t.startswith("DECIMAL"):
            # DECIMAL needs the Spark dump to compare (p,s); without
            # one (standalone --type-lint on a fresh out dir) we can't
            # adjudicate, so skip rather than spam FAIL on every
            # decimal column. HUGEINT/FLOAT stay hard failures above.
            if spark_files is None:
                continue
            want = "decimal128" + t[len("DECIMAL"):].replace(" ", "")
            got = spark_types.get(col, "")
            if got.replace(" ", "") != want:
                flags.append(f"{col}: oracle emits {ty} but Spark side is "
                             f"{got or 'unknown'} — cast the twin or match "
                             "the decimal(p,s) exactly")
    return flags


def type_lint(sf_dir: str, out_dir: str):
    """Standalone DESCRIBE-only sweep of every twin (no Spark dump
    needed; DECIMAL checks use the dump when present)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_clean = n_flag = n_err = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        try:
            flags = lint_output_types(con, oracle[name], files or None)
        except Exception as e:
            n_err += 1
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            continue
        if flags:
            n_flag += 1
            print(f"FAIL {name} [type-lint]:")
            for f in flags:
                print(f"    {f}")
        else:
            n_clean += 1
    print(f"\ntype-lint: {n_clean} clean, {n_flag} flagged, {n_err} err")
    return 1 if (n_flag or n_err) else 0


def type_lint_self_test():
    """A deliberately-uncast SUM(SUM(BIGINT)) twin must flag; the
    BIGINT-cast form must not; a FLOAT output must flag."""
    con = duckdb.connect()
    con.execute("CREATE VIEW t AS SELECT * FROM (VALUES (1, 10), (1, 20), "
                "(2, 30)) v(k, x)")
    bad = ("SELECT SUM(s) AS total FROM "
           "(SELECT k, SUM(CAST(x AS BIGINT)) AS s FROM t GROUP BY k)")
    good = ("SELECT CAST(SUM(s) AS BIGINT) AS total FROM "
            "(SELECT k, SUM(CAST(x AS BIGINT)) AS s FROM t GROUP BY k)")
    flt = "SELECT CAST(1.5 AS FLOAT) AS r"
    f_bad = lint_output_types(con, bad)
    f_good = lint_output_types(con, good)
    f_flt = lint_output_types(con, flt)
    print(f"self-test: uncast HUGEINT flagged={bool(f_bad)} ({f_bad}), "
          f"cast form flagged={bool(f_good)}, FLOAT flagged={bool(f_flt)}")
    return 0 if (f_bad and not f_good and f_flt) else 1


def cmp_frames(a: pd.DataFrame, b: pd.DataFrame, name: str):
    issues = []
    if sorted(a.columns) != sorted(b.columns):
        issues.append(f"columns differ: spark={sorted(a.columns)} oracle={sorted(b.columns)}")
        return issues
    if len(a) != len(b):
        issues.append(f"row count differs: spark={len(a)} oracle={len(b)}")
        return issues
    a, b = norm(a), norm(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                i = neq.idxmax()
                mx = (av - bv).abs().max()
                issues.append(
                    f"col {c}: {neq.sum()} mismatches, first@{i} "
                    f"spark={av[i]!r} oracle={bv[i]!r} maxabs={mx}")
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = (~eq).idxmax()
                issues.append(
                    f"col {c}: {(~eq).sum()} mismatches, first@{i} "
                    f"spark={av[i]!r} oracle={bv[i]!r}")
    return issues


def _spark_round(expr: str, d: int) -> str:
    """round with Spark's semantics on DOUBLE operands:
    BigDecimal.valueOf(v) = shortest round-trip decimal repr (DuckDB's
    double->VARCHAR cast), then exact HALF_UP at d. DECIMAL/integral
    operands keep native round (exact in both engines)."""
    e = f"CAST(({expr}) AS DOUBLE)"
    emu = (f"COALESCE(CAST(round(TRY_CAST(CAST({e} AS VARCHAR) AS "
           f"DECIMAL(38,20)), {d}) AS DOUBLE), round({e}, {d}))")
    return (f"(CASE WHEN typeof(({expr})) IN ('DOUBLE','FLOAT') "
            f"THEN {emu} ELSE round(({expr}), {d}) END)")


def _mult_round(expr: str, d: int) -> str:
    """round with adversarial multiply-based semantics on DOUBLE
    operands: sign-aware floor(|v|*10^d + 0.5) on the scaled double
    product — the other legal implementation family (what a
    version-drifted engine can do)."""
    e = f"CAST(({expr}) AS DOUBLE)"
    emu = (f"(CASE WHEN isfinite({e}) THEN "
           f"(CASE WHEN {e} >= 0 THEN floor({e}*1e{d} + 0.5) "
           f"ELSE -floor(-({e})*1e{d} + 0.5) END)/1e{d} "
           f"ELSE round({e}, {d}) END)")
    return (f"(CASE WHEN typeof(({expr})) IN ('DOUBLE','FLOAT') "
            f"THEN {emu} ELSE round(({expr}), {d}) END)")


def rewrite_rounds(sql: str, mode: str = "mult") -> "tuple[str, int]":
    """Replace every round(expr[, d]) with an engine-semantics
    emulation ('spark' = shortest-repr HALF_UP, 'mult' = multiply/
    floor-form), recursing into nested rounds. Cells where the two
    rewritten runs disagree are exactly the outputs a legal pair of
    engine implementations can disagree on — divergences absorbed by
    downstream folds stay clean. Returns (rewritten_sql, n_sites)."""
    out = []
    i, n, count = 0, len(sql), 0
    low = sql.lower()
    while i < n:
        j = low.find("round(", i)
        if j < 0:
            out.append(sql[i:])
            break
        if j > 0 and (low[j - 1].isalnum() or low[j - 1] == "_"):
            out.append(sql[i:j + 6])
            i = j + 6
            continue
        out.append(sql[i:j])
        k, depth = j + 6, 1
        while k < n and depth:
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
            k += 1
        inner = sql[j + 6:k - 1]
        depth, split = 0, -1
        for m, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                split = m
        if split < 0:
            expr, d = inner, 0
        else:
            expr = inner[:split]
            try:
                d = int(inner[split + 1:].strip())
            except ValueError:
                out.append(sql[j:k])
                i = k
                continue
        expr, sub = rewrite_rounds(expr, mode)
        count += 1 + sub
        out.append(_spark_round(expr, d) if mode == "spark"
                   else _mult_round(expr, d))
        i = k
    return "".join(out), count


def boundary_audit(sf_dir: str, out_dir: str, names):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    todo = sorted(names) if names else sorted(oracle)
    n_clean = n_flag = n_err = 0
    for name in todo:
        sql = oracle.get(name)
        if sql is None:
            print(f"SKIP {name}: not in oracle_sql.json")
            continue
        rw_s, sites = rewrite_rounds(sql, "spark")
        if sites == 0:
            n_clean += 1
            continue
        rw_m, _ = rewrite_rounds(sql, "mult")
        try:
            base = norm(con.execute(rw_s).fetchdf())
            alt = norm(con.execute(rw_m).fetchdf())
        except Exception as e:
            n_err += 1
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            continue
        flags = []
        if len(base) != len(alt) or sorted(base.columns) != sorted(alt.columns):
            flags.append("shape differs between spark-round and mult-round run")
        else:
            for c in base.columns:
                av, bv = base[c], alt[c]
                if not pd.api.types.is_float_dtype(av):
                    continue
                neq = ~((av == bv) | (av.isna() & bv.isna()))
                if neq.any():
                    i = neq.idxmax()
                    flags.append(f"col {c}: {neq.sum()} boundary cell(s), "
                                 f"first@{i} spark={av[i]!r} mult={bv[i]!r}")
        if flags:
            n_flag += 1
            print(f"FLAG {name} ({sites} round sites):")
            for f in flags:
                print(f"    {f}")
        else:
            n_clean += 1
    print(f"\nboundary audit: {n_clean} clean, {n_flag} flagged, {n_err} err")
    return 1 if (n_flag or n_err) else 0


def boundary_self_test():
    """The tool must flag a synthetic boundary fixture: 0.1250005 is a
    7-digit decimal whose nearest double sits a few ulps BELOW the
    true value, so round(x, 6) is a legal engine-disagreement site
    (shortest-repr HALF_UP says 0.125001, multiply-based says
    0.125)."""
    def both(sql):
        con = duckdb.connect()
        a = con.execute(rewrite_rounds(sql, "spark")[0]).fetchdf()["r"][0]
        b = con.execute(rewrite_rounds(sql, "mult")[0]).fetchdf()["r"][0]
        return a, b
    sql = ("SELECT round(v, 6) AS r FROM "
           "(SELECT CAST(0.1250005 AS DOUBLE) AS v)")
    _, sites = rewrite_rounds(sql)
    assert sites == 1, f"expected 1 site, got {sites}"
    a, b = both(sql)
    flagged = a != b
    # a clean value must NOT flag
    a2, b2 = both("SELECT round(v, 6) AS r FROM "
                  "(SELECT CAST(0.12345651 AS DOUBLE) AS v)")
    clean = a2 == b2
    # a DECIMAL operand landing exactly on .5 must NOT flag (exact
    # decimal-space HALF_UP in both engines)
    a4, b4 = both("SELECT round(v, 1) AS r FROM "
                  "(SELECT CAST(1.25 AS DECIMAL(10,2)) AS v)")
    dec_clean = float(a4) == float(b4) == 1.3
    # a boundary divergence ABSORBED by a downstream fold must NOT
    # flag (the common 12dp-intermediate-round-then-coarse-final case)
    a5, b5 = both("SELECT round(sum(round(v, 6))/7, 2) AS r FROM "
                  "(SELECT CAST(0.1250005 AS DOUBLE) AS v)")
    absorbed = a5 == b5
    # nested rounds rewrite without breaking parens
    sql3 = ("SELECT round(round(x, 4) / nullif(y, 0), 2) AS r "
            "FROM (SELECT 1.0::DOUBLE x, 3.0::DOUBLE y)")
    rw3, sites3 = rewrite_rounds(sql3)
    duckdb.connect().execute(rw3)
    assert sites3 == 2, f"expected 2 nested sites, got {sites3}"
    print(f"self-test: boundary fixture flagged={flagged} "
          f"(spark={a!r} mult={b!r}), clean value flagged={not clean}, "
          f"decimal .5 exempt={dec_clean}, absorbed divergence "
          f"flagged={not absorbed}, nested rewrite ok")
    return 0 if (flagged and clean and dec_clean and absorbed) else 1


def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Names the Verify run actually ATTEMPTED (written by Verify.scala).
    # An attempted name with no dump dir means the query THREW at
    # planning/analysis time (Verify catches per-query exceptions and
    # writes nothing) — that is a hard FAIL, never a skip. The skip
    # path is reserved for names genuinely outside a subset run.
    attempted_path = f"{out_dir}/attempted.json"
    attempted = set(json.load(open(attempted_path))) \
        if os.path.exists(attempted_path) else set(oracle)
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            # A name outside the attempted set is an un-dumped subset
            # query — skip. An attempted name with no dump dir, or a
            # dir that exists but holds no parquet, is a failure.
            if not os.path.isdir(f"{out_dir}/{name}"):
                if name not in attempted:
                    n_skip += 1
                    continue
                print(f"FAIL {name}: attempted but produced no output "
                      "(query threw before writing)")
                n_fail += 1
                continue
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.execute(oracle[name]).fetchdf()
            lint = lint_output_types(con, oracle[name], files)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        issues = [f"[type-lint] {f}" for f in lint]
        issues += cmp_frames(spark_df, duck_df, name)
        if issues:
            n_fail += 1
            print(f"FAIL {name} ({len(spark_df)} rows):")
            for it in issues:
                print(f"    {it}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(spark_df)} rows)")
    skipped = f", {n_skip} not dumped" if n_skip else ""
    print(f"\n{n_pass} pass, {n_fail} fail{skipped}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    if sys.argv[1] == "--boundary-self-test":
        sys.exit(boundary_self_test())
    elif sys.argv[1] == "--boundary-audit":
        sys.exit(boundary_audit(sys.argv[2], sys.argv[3], sys.argv[4:]))
    elif sys.argv[1] == "--type-lint-self-test":
        sys.exit(type_lint_self_test())
    elif sys.argv[1] == "--type-lint":
        sys.exit(type_lint(sys.argv[2], sys.argv[3]))
    sys.exit(main(sys.argv[1], sys.argv[2]))
