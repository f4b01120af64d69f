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


def _canon_esc(s):
    out = []
    for c in s:
        if c == "\\":
            out.append("\\\\")
        elif c < " " or c in ",[]{}=":
            out.append("\\x%02x" % ord(c))
        else:
            out.append(c)
    return "".join(out)


def canon_value(v):
    """Mirror of graft.CanonHash.canonValue — keep the two in sync."""
    import datetime, decimal, struct
    if v is None:
        return "n:"
    if isinstance(v, bool):
        return "b:true" if v else "b:false"
    if isinstance(v, int):
        return "i:%d" % v
    if isinstance(v, float):
        if v != v:
            return "d:NaN"
        if v == 0.0:
            v = 0.0
        return "d:%016x" % struct.unpack(">Q", struct.pack(">d", v))[0]
    if isinstance(v, decimal.Decimal):
        # fixed-scale plain string (duckdb decimals never use E-form)
        return "D:" + str(v)
    if isinstance(v, str):
        return "s:" + _canon_esc(v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return "ts:" + v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return "dt:" + v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        # duckdb structs arrive as dicts in declared field order
        return "{" + ",".join(canon_value(x) for x in v.values()) + "}"
    return "s:" + _canon_esc(str(v))


def canon_hash(cols, rows):
    """(sorted cols, sha256 hex) — mirror of graft.CanonHash.hashRows."""
    import hashlib
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    encoded = sorted(
        "\x01".join(canon_value(r[i]) for i in order).encode("utf-8")
        for r in rows)
    return ([cols[i] for i in order],
            hashlib.sha256(b"\n".join(encoded)).hexdigest())


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
        got_raw = rel.fetchall()
        got_cols, got = canon(rel.columns, got_raw)
        # Canonical-hash sidecar written by graft.Verify at dump time:
        # recompute it here from the same parquet. A mismatch means the
        # file changed (or a canon-rule drift) between dump and grade.
        sidecar = f"{outdir}/{name}/_canon.json"
        if os.path.exists(sidecar):
            sc = json.load(open(sidecar))
            if sc.get("sha256") is not None:
                _, here = canon_hash(rel.columns, got_raw)
                if here != sc["sha256"]:
                    print(f"CANON  {name}: sidecar {sc['sha256'][:12]}… != "
                          f"recomputed {here[:12]}… (rows {sc['rows']} vs "
                          f"{len(got_raw)})")
                    nfail += 1
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
