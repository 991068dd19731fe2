#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet written by `graft.Verify`, run the matching oracle SQL in DuckDB
over the same testdata tables and compare row count, schema (sorted column
names) and a value hash (rows sorted, columns sorted by name).

Usage: check_oracle.py <verify_out_dir> <sf_dir>
"""
import json
import sys
import glob
import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = format(v, ".10g")
            vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    import hashlib
    return hashlib.sha256("\x1e".join(out).encode()).hexdigest()[:16], len(rows)


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pq = f"{outdir}/{name}"
        files = glob.glob(f"{pq}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            want = con.execute(sql)
            wcols = [d[0] for d in want.description]
            wrows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}")
            failures += 1
            continue
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: schema {sorted(gcols)} vs {sorted(wcols)}")
            failures += 1
            continue
        # align oracle column order to spark's, then canonicalize
        gh, gn = canon(grows, gcols)
        idx = [wcols.index(c) for c in gcols]
        wrows2 = [tuple(r[i] for i in idx) for r in wrows]
        wh, wn = canon(wrows2, gcols)
        if gn != wn:
            print(f"FAIL {name}: rows {gn} vs {wn}")
            failures += 1
        elif gh != wh:
            print(f"FAIL {name}: hash {gh} vs {wh} ({gn} rows)")
            # show first diff
            gset = set()
            for r in grows[:100000]:
                gset.add(tuple(str(x) for x in r))
            for r in wrows2[:100000]:
                k = tuple(str(x) for x in r)
                if k not in gset:
                    print(f"      oracle-only row: {r}")
                    break
            failures += 1
        else:
            print(f"OK   {name}: {gn} rows hash={gh}")
    # queries without oracle: rows-only
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle:
            continue
        n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
        print(f"ROWS {name}: {n} rows (no oracle)")
    print(f"{'ALL OK' if failures == 0 else str(failures) + ' FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
