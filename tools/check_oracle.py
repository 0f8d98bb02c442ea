#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate: run graft.Verify output
against the DuckDB oracles (oracle_sql.json) on the same sf dir.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)

def frame(con, sql):
    df = con.execute(sql).fetchdf()
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return cols, rows

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            gcols, grows = frame(con, f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); fail += 1; continue
        try:
            ocols, orows = frame(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); fail += 1; continue
        # Fence (round 9): the driver's hasher renders DuckDB
        # DECIMAL128/HUGEINT cells differently than Spark BIGINT even
        # when the values match (the round-8 six-red-row root cause) —
        # our local stringify comparator can't see it, so fail on TYPE.
        rel = con.sql(sql)
        hot = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
               if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()]
        if hot:
            print(f"FAIL {name}: oracle output column(s) {hot} are "
                  f"DECIMAL128/HUGEINT — driver hash will mismatch Spark "
                  f"BIGINT; add CAST(... AS BIGINT) in the oracle SQL")
            fail += 1; continue
        if gcols != ocols:
            print(f"FAIL {name}: schema {gcols} vs oracle {ocols}"); fail += 1; continue
        if len(grows) != len(orows):
            print(f"FAIL {name}: rows {len(grows)} vs oracle {len(orows)}"); fail += 1; continue
        # order-sensitive first; if that fails, try order-insensitive
        if grows == orows:
            ok += 1; print(f"ok   {name} ({len(grows)} rows)")
        elif sorted(grows) == sorted(orows):
            ok += 1; print(f"ok*  {name} ({len(grows)} rows, order differs)")
        else:
            bad = next(i for i, (a, b) in enumerate(zip(sorted(grows), sorted(orows))) if a != b)
            print(f"FAIL {name}: first diff at sorted row {bad}:")
            print(f"  spark : {sorted(grows)[bad]}")
            print(f"  oracle: {sorted(orows)[bad]}")
            fail += 1
    # no-oracle accounting: every query dir Verify wrote that has no
    # oracle must carry an annotation (supersededBy + why) naming an
    # oracle-backed sibling — "the registry reads finished by
    # construction"; an unannotated row is a coverage hole, not a tier.
    import os
    try:
        no_oracle = json.load(open(f"{outdir}/no_oracle.json"))
    except FileNotFoundError:
        no_oracle = None
    if no_oracle is not None:
        written = {d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d))}
        unannotated = written - set(oracles) - set(no_oracle)
        stale = {q for q in no_oracle if q in oracles}
        for q in sorted(unannotated):
            print(f"FAIL {q}: no oracle and no no_oracle.json annotation")
            fail += 1
        for q in sorted(stale):
            print(f"FAIL {q}: annotated no_oracle but HAS an oracle "
                  f"(stale annotation)")
            fail += 1
        for q, meta in sorted(no_oracle.items()):
            sib = meta.get("supersededBy")
            if sib not in oracles:
                print(f"FAIL {q}: sibling {sib} is not oracle-backed")
                fail += 1
    print(f"\n{ok} ok, {fail} fail / {ok+fail} total")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
