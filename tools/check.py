#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [--json <artifact.json>]

Reads each parquet result written by graft.Verify plus outDir/oracle_sql.json,
runs every oracle statement in DuckDB with views registered over the sfDir
parquet tables, and value-compares (columns sorted by name, exact values).

--json records the sweep as a committable artifact (per-query verdicts +
summary) — the standing sf0.1 gate (CORRECTNESS_SF01_r{N}.json) is this
script's output, not a hand-written claim.
"""
import json
import sys
import glob
import os
import time

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.reset_index(drop=True)


def dtype_clashes(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list:
    """The driver hashes values WITHOUT canonicalizing dtypes, so an
    int64 Spark column vs a float64 DuckDB column (e.g. HUGEINT from
    sum(INTEGER) through pandas) hash-mismatches even when every value
    is numerically equal. Flag that class here so the local gate is at
    least as strict as the driver's."""
    clashes = []
    for c in sorted(set(spark_df.columns) & set(duck_df.columns)):
        a, b = spark_df[c], duck_df[c]
        a_int = pd.api.types.is_integer_dtype(a)
        b_int = pd.api.types.is_integer_dtype(b)
        a_f = pd.api.types.is_float_dtype(a)
        b_f = pd.api.types.is_float_dtype(b)
        if (a_int and b_f) or (a_f and b_int):
            clashes.append(
                f"col {c}: dtype clash spark={a.dtype} duck={b.dtype} "
                "(driver hashes raw values; cast the oracle side)")
    return clashes


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list:
    problems = dtype_clashes(spark_df, duck_df)
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av_n, bv_n = av.astype("float64"), bv.astype("float64")
            eq = (av_n.isna() & bv_n.isna()) | (av_n == bv_n)
        else:
            eq = (av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str))
        bad = (~eq).to_numpy().nonzero()[0]
        if len(bad):
            i = bad[0]
            problems.append(
                f"col {c}: {len(bad)} mismatched rows; first at {i}: "
                f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
    return problems


def main():
    argv = list(sys.argv[1:])
    json_out = None
    shard_i, shard_n = 0, 1
    threads = None
    def flag_value(flag):
        # every value-taking flag funnels through here so a trailing
        # `--json`/`--shard`/`--threads` hits the usage message, not an
        # IndexError
        idx = argv.index(flag)
        if idx + 1 >= len(argv):
            sys.exit(f"usage: {flag} requires a value")
        val = argv[idx + 1]
        del argv[idx:idx + 2]
        return val
    if "--json" in argv:
        json_out = flag_value("--json")
    if "--shard" in argv:  # "--shard i/n": process sorted(oracles)[i::n]
        shard_i, shard_n = map(int, flag_value("--shard").split("/"))
        if shard_n < 1 or not 0 <= shard_i < shard_n:
            sys.exit(f"usage: --shard i/n needs 0 <= i < n, got {shard_i}/{shard_n}")
    if "--threads" in argv:  # cap DuckDB threads (parallel shard runs)
        threads = int(flag_value("--threads"))
    if len(argv) != 2:
        sys.exit("usage: check.py <sfDir> <outDir> [--json <artifact.json>]"
                 " [--shard i/n] [--threads k]")
    sf_dir, out_dir = argv
    con = duckdb.connect()
    if threads:
        con.sql(f"SET threads={threads}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written directory layout (ScaleUp sf1)
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    ok, fail = [], []
    detail = {}  # driver-style per-query record (rows/schema/hash + timing)
    for name in sorted(oracles)[shard_i::shard_n]:
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            fail.append((name, ["no spark result parquet"]))
            detail[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": "no spark result parquet"}
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        t0 = time.monotonic()
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            fail.append((name, [f"oracle SQL failed: {e}"]))
            detail[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False,
                            "err": f"oracle SQL failed: {e}"[:300]}
            continue
        secs = round(time.monotonic() - t0, 1)
        problems = compare(name, spark_df, duck_df)
        (fail if problems else ok).append((name, problems))
        # incremental progress (long sf1 sweeps): one line per query as it
        # lands, flushed — the summary block below stays the artifact
        print(f"[{'ok' if not problems else 'XX'}] {name} ({secs}s)",
              flush=True)
        # compare() early-returns: a column mismatch means rows/values were
        # NEVER compared — record those dimensions as null (unknown), not
        # as a pass the check never ran
        schema_ok = not any("columns differ" in p or "dtype clash" in p
                            for p in problems)
        rows_checked = not any("columns differ" in p for p in problems)
        detail[name] = {
            "rows_match": (not any("row count differs" in p for p in problems)
                           ) if rows_checked else None,
            "schema_match": schema_ok,
            "hash_match": not problems,
            "spark_rows": len(spark_df),
            "oracle_secs": secs,
            "err": "; ".join(problems)[:300] or None,
        }
    for name, _ in ok:
        print(f"PASS {name}")
    for name, problems in fail:
        print(f"FAIL {name}")
        for p in problems:
            print(f"  - {p}")
    print(f"\n{len(ok)} passed, {len(fail)} failed")
    if json_out:
        artifact = {
            "sf_dir": sf_dir,
            "passed": len(ok),
            "failed": len(fail),
            "queries": detail,
        }
        if shard_n > 1:
            # a shard artifact must never masquerade as a full-sweep gate
            artifact["shard"] = f"{shard_i}/{shard_n}"
            artifact["oracle_total"] = len(oracles)
        with open(json_out, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
