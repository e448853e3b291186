#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <outDir> <sfDir>
Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
sfDir tables, sorts columns by name, and compares values.
"""
import json
import math
import multiprocessing
import os
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out), [cols[i] for i in order]


def connect(sf_dir):
    """Fresh bounded connection with the table views.

    One connection PER QUERY: after an OOM a DuckDB connection's buffer
    pool stays wedged (every later query fails on kilobyte allocations),
    so sharing one connection turns a single heavy oracle into a cascade
    of false failures. Memory is capped at 40% of RAM (ceiling 20GB) with
    a spill directory — an in-memory connection has NO temp_directory by
    default and OOMs at the cap instead of spilling — and threads are
    capped at 8: with the default one-thread-per-core (32 here) the
    per-thread allocator commit pushes past the kernel CommitLimit
    (overcommit_ratio 50, no swap) and malloc fails with ~120GB free.
    """
    con = duckdb.connect()
    try:
        ram_gb = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE") / 2**30
        con.execute(f"SET memory_limit='{max(1, min(20, int(ram_gb * 0.4)))}GB'")
        con.execute("SET threads=8")
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
    except (ValueError, OSError):
        pass
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).is_dir():
            # Spark-written table (ScaleGen output): a directory of part
            # files, not the driver's single-file parquet
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def compare_one(name, spark_dir, sql, sf_dir):
    """Compare one query; returns ("PASS"|"WARN"|"FAIL", message)."""
    con = connect(sf_dir)
    st = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").arrow()
    scols = list(st.column_names)
    stypes = {c: str(st.schema.field(c).type) for c in scols}
    srows = [tuple(r[c] for c in scols) for r in st.to_pylist()]
    try:
        dt = con.execute(sql).arrow()
        dcols = list(dt.column_names)
        dtypes = {c: str(dt.schema.field(c).type) for c in dcols}
        drows = [tuple(r[c] for c in dcols) for r in dt.to_pylist()]
    except Exception as e:
        return "FAIL", f"FAIL {name}: oracle error {e}"
    finally:
        con.close()
    sc, scn = canon(srows, scols)
    dc, dcn = canon(drows, dcols)
    # arrow-type agreement: a DuckDB HUGEINT (un-CAST integer sum())
    # surfaces as decimal128 vs Spark's int64 — a hash mismatch
    # driver-side even when str() values agree, so fail that case hard.
    # Anything else only warns when the values agree — but warns LOUDLY
    # (counted in the summary), because the driver's compare may still
    # be type-sensitive where this stringified one is not.
    allowed_pairs = {frozenset({"int32", "int64"})}
    tdiff = {c: (stypes[c], dtypes[c]) for c in scn
             if c in dtypes and stypes[c] != dtypes[c]
             and frozenset({stypes[c], dtypes[c]}) not in allowed_pairs}
    hard_tdiff = {c: p for c, p in tdiff.items()
                  if any(t.startswith("decimal") for t in p)}
    if scn != dcn:
        return "FAIL", f"FAIL {name}: columns {scn} != {dcn}"
    if hard_tdiff:
        return "FAIL", f"FAIL {name}: arrow types differ {hard_tdiff}"
    if tdiff and sc == dc:
        return "WARN", f"WARN {name}: arrow types differ {tdiff} (values agree)"
    if sc != dc:
        lines = [f"FAIL {name}: {len(sc)} vs {len(dc)} rows"]
        for a, b in list(zip(sc, dc))[:5]:
            if a != b:
                lines.append(f"  spark={a}\n  duck ={b}")
        diff = set(sc) ^ set(dc)
        if diff:
            lines.append(f"  {len(diff)} differing rows, e.g. {list(diff)[:3]}")
        return "FAIL", "\n".join(lines)
    return "PASS", f"PASS {name} ({len(sc)} rows)"


def raise_map_count():
    """DuckDB's bundled jemalloc fragments to ~65k memory mappings on a
    spill-heavy oracle (measured: 65,453 maps right before failure), and the
    kernel default vm.max_map_count=65530 then fails tiny mallocs with GBs
    free ("Failed to allocate block of 16384 bytes"). Raise the ceiling when
    we can (root); otherwise the heavy oracles may OOM spuriously.
    """
    p = Path("/proc/sys/vm/max_map_count")
    try:
        if int(p.read_text()) < 1048576:
            p.write_text("1048576")
    except (OSError, ValueError):
        pass


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    raise_map_count()
    n_pass = n_fail = n_warn = 0
    for name in sorted(oracle):
        spark_dir = out_dir / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        # One forked child PER QUERY: even with per-query connections, 96
        # prior arrow materializations leave glibc arenas committed in the
        # parent, and the kernel CommitLimit (overcommit_ratio 50, no swap)
        # then fails a heavy oracle that passes standalone. A child process
        # starts from a clean commit baseline and returns only the verdict.
        ctx = multiprocessing.get_context("fork")
        with ctx.Pool(1) as pool:
            status, msg = pool.apply(compare_one, (name, spark_dir, oracle[name], sf_dir))
        print(msg)
        if status == "FAIL":
            n_fail += 1
        else:
            n_pass += 1
            n_warn += status == "WARN"
    warn = f", {n_warn} TYPE WARNINGS (may still fail driver-side)" if n_warn else ""
    print(f"== {n_pass} pass, {n_fail} fail{warn} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
