#!/usr/bin/env python3
"""Dev-only local emulation of the driver's DuckDB-oracle correctness gate.

NOT part of the shipped library (the Scala code never depends on this).
Usage:  python3 tools/check.py <outDir> <sfDir> [query ...]

Reads <outDir>/<name>/ parquet (written by `sbt "runMain graft.Verify ..."`)
and <outDir>/oracle_sql.json, runs each oracle in DuckDB against views named
after the parquet tables in <sfDir>, and compares (column-name-sorted,
row-sorted) results.
"""
import json, math, re, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# --- Type-frontier guard -----------------------------------------------------
# The driver's hash canonicalization has repeatedly diverged from this local
# gate on value-equal outputs whose STORAGE CLASS had never appeared in a
# driver-green round: r4 = HUGEINT (un-cast DuckDB integer sum), r5 =
# DECIMAL(28,x), r6 = DECIMAL(18,x) — i.e. NO DECIMAL output of ANY precision
# has ever been driver-green. Guard: any output column type — on EITHER the
# Spark-parquet side or the oracle side — outside the scalar allowlist below
# (the storage classes proven green by CORRECTNESS_r01..r06) is an automatic
# FAIL, even if values match. Nested types (STRUCT/MAP/UNION/[]) are outright
# violations: no nested output has ever appeared in a driver-green round, and
# registry discipline already posexplodes to scalars. Widen only after a
# driver round proves a new class green.
_PROVEN_ROOTS = {
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE", "VARCHAR", "BLOB", "DATE", "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE",
}
_MAX_PROVEN_DECIMAL_PRECISION = 0  # no DECIMAL has ever passed the driver


def frontier_violations(ty):
    """Return a list of sub-type strings of `ty` outside the driver-proven set."""
    ty = ty.strip()
    if re.match(r"^(STRUCT|MAP|UNION)\(", ty) or ty.endswith("[]"):
        return [ty + " (nested storage class never driver-proven)"]
    m = re.match(r"^DECIMAL\((\d+),\s*(\d+)\)$", ty)
    if m:
        if int(m.group(1)) > _MAX_PROVEN_DECIMAL_PRECISION:
            return [ty + " (DECIMAL output never driver-proven — r4/r5/r6 fail class)"]
        return []
    if ty in _PROVEN_ROOTS:
        return []
    return [ty + " (storage class never driver-proven)"]


def canon(rows, cols):
    # EXACT comparison, floats included: queries are designed so both engines
    # evaluate bit-identical IEEE expression trees (raw doubles) or rounded
    # order-independent aggregates. Exact matching here is the strictest
    # local proxy for the driver's hash compare.
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def connect(sf_dir):
    con = duckdb.connect()
    # big-SF sweeps (sf10 = 1.5 GB parquet) exhaust DuckDB's default buffer
    # budget when Spark dump JVMs hold RAM concurrently — pin an explicit
    # limit + spill dir so an oracle spills instead of dying at 32-byte
    # allocations (r8 sweep lesson; harmless at fixture scale)
    con.execute("SET memory_limit='24GB'")
    con.execute("SET threads=16")
    # per-process spill dir: two concurrent check.py runs sharing one
    # temp_directory delete each other's duckdb_temp_storage-*.tmp and
    # BOTH abort (observed r11, two 14-min sf10 compares lost)
    import os as _os
    con.execute(f"PRAGMA temp_directory='/tmp/duckdb_spill_{_os.getpid()}'")
    for t in TABLES:
        # driver fixtures are single files; Upscale'd dirs (sf1) are
        # Spark-written directories of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        import os
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _poisons_connection(e):
    """True when the exception class invalidates the whole DuckDB
    connection (OOM / fatal / internal), so the caller must rebuild it.

    Keyed on the exception TYPES the duckdb module exposes, not message
    substrings (r8 ADVICE): a differently-phrased memory failure must
    still trigger the rebuild, and an unrelated error whose message
    happens to mention 'allocation' must not force a pointless retry.
    getattr-guarded so older duckdb builds that lack a class degrade to
    never matching it rather than crashing the gate.
    """
    poisoning = tuple(t for t in (
        getattr(duckdb, "OutOfMemoryException", None),
        getattr(duckdb, "FatalException", None),
        getattr(duckdb, "InternalException", None)) if t is not None)
    return isinstance(e, poisoning)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            n_skip += 1
            continue
        sql = oracle[name]

        def run_one(c):
            gr = c.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            g_cols, g_tys, g = list(gr.columns), [str(t) for t in gr.types], gr.fetchall()
            er = c.sql(sql)
            e_cols, e_tys, e = list(er.columns), [str(t) for t in er.types], er.fetchall()
            return g_cols, g_tys, g, e_cols, e_tys, e

        # An OOM inside DuckDB poisons the whole connection: every later
        # query on it fails at tiny allocations (r8 sf10 sweep lesson —
        # one heavy oracle junked 40 queries downstream). Recover by
        # rebuilding the connection and retrying the query once.
        try:
            try:
                got_cols, got_tys, got, exp_cols, exp_tys, exp = run_one(con)
            except Exception as e:
                if not _poisons_connection(e):
                    raise
                print(f"RETRY {name} on fresh connection after: {e}", flush=True)
                con.close()
                con = connect(sf_dir)
                got_cols, got_tys, got, exp_cols, exp_tys, exp = run_one(con)
        except Exception as e:
            print(f"FAIL {name}: {e}", flush=True)
            n_fail += 1
            if _poisons_connection(e):
                con.close()
                con = connect(sf_dir)
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns spark={sorted(got_cols)} duck={sorted(exp_cols)}")
            n_fail += 1
            continue
        # Physical-type gate: the driver's hash is type-sensitive (an un-cast
        # DuckDB integer sum() yields HUGEINT, which hash-mismatches Spark's
        # int64 even at equal values — r3/r4 failure class). Compare the
        # DuckDB-reported logical type of each oracle column against the type
        # DuckDB assigns the Spark parquet column.
        got_types = dict(zip(got_cols, got_tys))
        exp_types = dict(zip(exp_cols, exp_tys))
        type_mm = {c: (got_types[c], exp_types[c]) for c in got_types
                   if got_types[c] != exp_types[c]}
        if type_mm:
            print(f"FAIL {name}: type mismatch (spark, duck): {type_mm}")
            n_fail += 1
            continue
        # Type-frontier guard (see header): fail any never-driver-proven
        # storage class on either side, even at equal values.
        frontier = {}
        for c in got_types:
            vio = frontier_violations(got_types[c]) + frontier_violations(exp_types[c])
            if vio:
                frontier[c] = sorted(set(vio))
        if frontier:
            print(f"FAIL {name}: type-frontier violation: {frontier}")
            n_fail += 1
            continue
        g = canon(got, got_cols)
        e = canon(exp, exp_cols)
        if g == e:
            print(f"PASS {name} ({len(g)} rows)", flush=True)
            n_pass += 1
        else:
            print(f"FAIL {name}: rows spark={len(g)} duck={len(e)}", flush=True)
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            for a, b in diff:
                print(f"   spark: {a}\n   duck : {b}")
            if len(g) != len(e):
                only_g = set(g) - set(e)
                only_e = set(e) - set(g)
                for x in list(only_g)[:3]:
                    print(f"   only-spark: {x}")
                for x in list(only_e)[:3]:
                    print(f"   only-duck : {x}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
