"""Local replica of the driver's correctness gate: run the graded-50
window through __spark_entry__.queries() and compare to oracle_sql()
via DuckDB (sorted-column value compare), at the given sf dir."""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e
from mongo_arrow_spark.battery import ORACLES, QUERIES
from mongo_arrow_spark.session import get_spark

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
spark = get_spark("gate-replica", shuffle_partitions=32)
qs, oracles = e.queries(), e.oracle_sql()
con = duckdb.connect()
for n in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {n} AS SELECT * FROM read_parquet('{sf}/{n}.parquet')")

def _canon(v, in_list=False):
    # array-typed cells (e.g. embed_project's projected vectors) come
    # back as unhashable ndarrays pandas can't sort, and str(ndarray) !=
    # str(list); duckdb's fetch_df also packs BIGINT lists into float
    # ndarrays, so inside lists integral floats ARE ints
    if isinstance(v, np.ndarray):
        return [_canon(e, True) for e in v.tolist()]
    if isinstance(v, list):
        return [_canon(e, True) for e in v]
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return int(f) if in_list and f.is_integer() else f
    return v


window = [n for n in QUERIES if n in ORACLES][:50]
names = only or window
bad = []
for name in names:
    try:
        g = qs[name](spark, sf).toPandas()
        x = con.execute(oracles[name]).fetch_df()
        cols_match = sorted(g.columns) == sorted(x.columns)
        g = g[sorted(g.columns)].apply(lambda c: c.map(_canon)).astype(str)
        x = x[sorted(x.columns)].apply(lambda c: c.map(_canon)).astype(str)
        g = g.sort_values(sorted(g.columns)).reset_index(drop=True)
        x = x.sort_values(sorted(x.columns)).reset_index(drop=True)
        count_match = len(g) == len(x)
        values_match = bool(
            count_match and cols_match and (g.values == x.values).all()
        )
        ok = cols_match and count_match and values_match
        print(json.dumps({"q": name, "rows": len(g), "cols": cols_match,
                          "count": count_match, "values": values_match}), flush=True)
        if not ok:
            bad.append(name)
    except Exception as ex:
        print(json.dumps({"q": name, "err": str(ex)[:300]}), flush=True)
        bad.append(name)
print("FAILED:" if bad else "ALL_GREEN", bad, flush=True)
