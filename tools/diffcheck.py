"""Local differential harness: replicate the driver's correctness gate.

For every registered query: run the Spark DataFrame and the DuckDB
oracle at the given SF, compare row count, column names, and values
(rows sorted by all columns; exact equality after normalization).

Usage: python tools/diffcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s
        if np.issubdtype(s.dtype, np.datetime64):
            # unify resolution (Spark toPandas -> ns, DuckDB -> us);
            # the driver's canonicalizer is resolution-insensitive
            df[c] = s.astype("datetime64[ns]")
        if s.dtype == object and len(s) and isinstance(s.iloc[0], (list, np.ndarray)):
            df[c] = s.apply(lambda v: tuple(v))
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


# DuckDB logical types that survive pandas coercion with the same
# dtype the driver hashes for the matching Spark column. Anything
# else (HUGEINT from un-cast integer sum(), DECIMAL passthrough,
# unsigned ints) silently changes the hashed dtype/values — the
# exact bug class that shipped twice (sessionize r1, multimodal/
# docs_clean r2) because the old normalize() erased the distinction.
_SAFE_DUCK_TYPES = {
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE", "VARCHAR", "TIMESTAMP", "DATE",
    "TIMESTAMP WITH TIME ZONE",
}


def oracle_type_problems(rel) -> list[str]:
    """Strict pre-coercion gate on the DuckDB result schema."""
    problems = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ)
        base = t.split("(")[0].strip()
        if base.endswith("[]") or base in ("LIST", "STRUCT", "MAP"):
            continue  # nested: normalize() tuples these on both sides
        if base not in _SAFE_DUCK_TYPES:
            problems.append(
                f"oracle col {col} has unsafe DuckDB type {t} "
                f"(cast it — e.g. CAST(sum(x) AS BIGINT) for HUGEINT)"
            )
    return problems


def compare(name: str, spark_df, duck_df) -> list[str]:
    problems = []
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns: spark={list(a.columns)} oracle={list(b.columns)}")
        return problems
    # The driver's hash is insensitive to integer width (int32 rank vs
    # BIGINT) and datetime resolution, but NOT to dtype *kind*: a
    # HUGEINT/DECIMAL column coerces to object/float where Spark has
    # int64, changing the hashed values. Compare kinds (u folds to i).
    def _kind(s):
        k = np.asarray(s).dtype.kind if s.dtype != object else "O"
        return "i" if k == "u" else k

    for c in a.columns:
        ka, kb = _kind(a[c]), _kind(b[c])
        if ka != kb:
            problems.append(
                f"col {c}: dtype kind mismatch spark={a[c].dtype} "
                f"oracle={b[c].dtype} (driver hashes dtype-sensitively)"
            )
    if problems:
        return problems
    if len(a) != len(b):
        problems.append(f"rowcount: spark={len(a)} oracle={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af = av.astype(float)
            bf = bv.astype(float)
            both_nan = np.isnan(af) & np.isnan(bf)
            eq = (af == bf) | both_nan
        else:
            eq = av == bv
        bad = int((~eq).sum())
        if bad:
            i = int(np.argmax(~eq))
            problems.append(f"col {c}: {bad} mismatches, first at row {i}: spark={av[i]!r} oracle={bv[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from open_tlm_spark.plans import REGISTRY
    from open_tlm_spark.session import get_spark

    spark = get_spark("diffcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_ok = n_bad = 0
    for name, q in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            n_bad += 1
            continue
        if q.oracle is None:
            print(f"ok   {name}: rows={len(sdf)} (no oracle — rows-only)")
            n_ok += 1
            continue
        try:
            rel = con.sql(q.oracle)
            type_problems = oracle_type_problems(rel)
            ddf = rel.df()
        except Exception:
            print(f"FAIL {name}: oracle raised\n{traceback.format_exc()}")
            n_bad += 1
            continue
        problems = type_problems + compare(name, sdf, ddf)
        if problems:
            n_bad += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            n_ok += 1
            print(f"ok   {name}: rows={len(sdf)}")
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
