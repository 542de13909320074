"""DEV harness mimicking the driver's correctness gate: run every
__spark_entry__ query at sf0.01 via Spark AND its DuckDB oracle, compare
row count, column names, and order-insensitive values.

Usage: python scripts/check_entry.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
from decimal import Decimal
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def normalize(v):
    """TYPE-STRICT normalization: the tag prefix makes int 12345 differ
    from float 12345.0 — exactly the class of divergence the driver's
    hash gate catches (e.g. DuckDB HUGEINT materializing as float64)
    that a bare ``%.10g`` text compare masks (CORRECTNESS_r03
    pack_documents)."""
    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{int(v)}"
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            # pandas renders SQL NULL in numeric columns as NaN, so NaN
            # and NULL must normalize identically on both sides
            return "NULL"
        if v == 0:
            return "f:0"
        return f"f:{v:.10g}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, Decimal):
        # format(v, 'f') expands scientific notation (Decimal('1E+2') ->
        # '100'), so equal Decimals share one canonical text regardless of
        # exponent form
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        if s in ("", "-0"):
            s = "0"
        return f"d:{s}"
    if isinstance(v, (bytes, bytearray)):
        return f"y:{bytes(v).hex()}"
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    return f"s:{v}"


def _is_na_scalar(x):
    """True for scalar NaN/NaT/None out of pandas; never touches arrays."""
    import numpy as np
    import pandas as pd

    if isinstance(x, (list, tuple, dict, np.ndarray)):
        return False
    try:
        return bool(pd.isna(x))
    except (TypeError, ValueError):
        return False


def row_key(row, col_order):
    return tuple(normalize(row[i]) for i in col_order)


def main():
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # data-dependent oracle constants (trained-IVF centroids) must be
    # derived from the sf being checked, not a hardcoded default
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import duckdb

    import __spark_entry__ as E
    from aser_spark.config import get_spark

    spark = get_spark(app="check-entry", cpus=8, shuffle_partitions=16)

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            print(f"[SPARK-FAIL] {name}: {type(ex).__name__}: {str(ex)[:300]}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"[ROWS-ONLY ] {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols = [d[0] for d in ddf.description]
            # materialize through pandas like the driver does — this is
            # where HUGEINT becomes float64 and trips the type tags above
            dpdf = ddf.df()
            drows = [tuple(None if _is_na_scalar(x) else x for x in r)
                     for r in dpdf.itertuples(index=False, name=None)]
        except Exception as ex:
            print(f"[DUCK-FAIL ] {name}: {str(ex)[:300]}")
            n_bad += 1
            continue

        status = []
        if sorted(scols) != sorted(dcols):
            status.append(f"cols {scols} != {dcols}")
        if len(srows) != len(drows):
            status.append(f"rows {len(srows)} != {len(drows)}")
        if not status:
            s_order = [scols.index(c) for c in sorted(scols)]
            d_order = [dcols.index(c) for c in sorted(dcols)]
            a = sorted(row_key(tuple(r), s_order) for r in srows)
            b = sorted(row_key(tuple(r), d_order) for r in drows)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                status.append(f"values differ, e.g. {diffs}")
        if status:
            print(f"[MISMATCH  ] {name}: {'; '.join(status)}")
            n_bad += 1
        else:
            print(f"[OK        ] {name}: {len(srows)} rows")
            n_ok += 1

    print(f"\n{n_ok} ok, {n_bad} bad")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
