#!/usr/bin/env python3
"""Dev-only pre-flight mirror of the driver's correctness gate.

Usage:
  python3 tools/oracle_check.py <verifyOutDir> <sfDir> [only,names]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
sf parquet tables, sorts columns by name, sorts rows, and compares values.
Reports exact / close (float-tolerance) / MISMATCH per query.

NOT part of the library; mirrors the driver-side check so regressions are
caught before the round gate runs.
"""
import sys, json, math, glob, os
import duckdb

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    if isinstance(v, bytes):
        return v.hex()
    return v

def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(canon(r[i]) for i in order) for r in cur.fetchall()]
    return sorted(cols), sorted(data, key=lambda t: tuple((x is None, str(x)) for x in t))

def close(a, b):
    if a == b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    return False

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    names = sorted(oracles)
    for name in names:
        if only and name not in only:
            continue
        spark_dir = os.path.join(outdir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        try:
            cur = con.execute(f"SELECT * FROM read_parquet({files!r})")
            scols, srows = rows_of(cur)
            cur = con.execute(oracles[name])
            ocols, orows = rows_of(cur)
        except Exception as e:
            results[name] = f"ERR {type(e).__name__}: {str(e)[:200]}"
            continue
        if scols != ocols:
            results[name] = f"SCHEMA spark={scols} oracle={ocols}"
        elif len(srows) != len(orows):
            results[name] = f"ROWS spark={len(srows)} oracle={len(orows)}"
        else:
            exact = srows == orows
            if exact:
                results[name] = "exact"
            else:
                ok = all(len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))
                         for a, b in zip(srows, orows))
                results[name] = "close" if ok else "MISMATCH"
                if results[name] == "MISMATCH":
                    for a, b in zip(srows, orows):
                        if not all(close(x, y) for x, y in zip(a, b)):
                            results[name] += f" first spark={a} oracle={b}"
                            break
    bad = {k: v for k, v in results.items() if v not in ("exact", "close")}
    for k in sorted(results):
        print(f"{results[k]:>8.8s}  {k}" if results[k] in ("exact", "close")
              else f"BAD  {k}: {results[k]}")
    print(f"\n{len(results)} checked, {len(bad)} bad")
    sys.exit(1 if bad else 0)

main()
