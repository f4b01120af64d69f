#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over views of the
sf parquet tables, and compares row-sets exactly (sorted columns by
name, sorted rows). Prints PASS/FAIL per query with a diff preview.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        # exact compare, but normalize -0.0 and NaN repr
        if v != v:
            return "NaN"
        if v == 0:
            return 0.0
        return v
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(os.path.basename(p) for p in glob.glob(f"{outdir}/*")
                   if os.path.isdir(p))
    npass = nfail = nskip = 0
    # registry-minus-graded is RED: a query that crashed before writing
    # (or was silently dropped) must not read as green-by-absence.
    regf = f"{outdir}/registry.json"
    if os.path.exists(regf):
        registry = json.load(open(regf))
        for missing in sorted(set(registry) - set(names)):
            print(f"GONE   {missing} (registered but no output dir)")
            nfail += 1
    for name in names:
        marker = f"{outdir}/{name}/_FAILED"
        if os.path.exists(marker):
            msg = open(marker).read().strip().splitlines()
            print(f"CRASH  {name}: {msg[0] if msg else '(no message)'}")
            nfail += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"EMPTY  {name} (no parquet written)")
            nfail += 1
            continue
        rel = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        got_types = dict(zip(rel.columns, (str(t) for t in rel.types)))
        got_cols, got = canon(rel.columns, rel.fetchall())
        if name not in oracles:
            print(f"SKIP   {name} rows={len(got)} (no oracle, rows-only)")
            nskip += 1
            if len(got) == 0:
                print("       WARNING: zero rows")
            continue
        try:
            orel = con.sql(oracles[name])
            exp_types = dict(zip(orel.columns, (str(t) for t in orel.types)))
            exp_cols, exp = canon(orel.columns, orel.fetchall())
        except Exception as e:
            print(f"ORAERR {name}: {e}")
            nfail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL   {name}: cols {got_cols} != {exp_cols}")
            nfail += 1
            continue
        # driver's hasher is type-sensitive: mirror that here so a
        # value-equal / type-unequal result fails locally too
        tdiff = {c: (got_types[c], exp_types[c]) for c in got_cols
                 if got_types.get(c) != exp_types.get(c)}
        if tdiff:
            print(f"FAIL   {name}: result types differ {tdiff}")
            nfail += 1
            continue
        if got == exp:
            print(f"PASS   {name} rows={len(got)}")
            npass += 1
        else:
            print(f"FAIL   {name}: rows got={len(got)} exp={len(exp)}")
            sg, se = set(map(tuple, got)), set(map(tuple, exp))
            only_g = list(sg - se)[:3]
            only_e = list(se - sg)[:3]
            if only_g:
                print(f"       spark-only: {only_g}")
            if only_e:
                print(f"       oracle-only: {only_e}")
            if not only_g and not only_e:
                print("       (same set; duplicate-count mismatch)")
            nfail += 1
    print(f"\n{npass} pass, {nfail} fail, {nskip} rows-only")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
