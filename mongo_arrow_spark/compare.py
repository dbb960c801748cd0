"""Spark-vs-DuckDB comparison harness — a local mirror of the driver's
correctness gate (row count + schema + order-insensitive value match)."""

from __future__ import annotations

import datetime as dt
import math
import os


def duckdb_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    try:
        import numpy as np

        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return float(v)
        if isinstance(v, np.bool_):
            return bool(v)
    except ImportError:
        pass
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def rows_to_multiset(columns, rows):
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = sorted(
        tuple(repr(_norm(r[i])) for i in idx) for r in rows
    )
    return [columns[i] for i in idx], out


def compare(spark_df, con, sql: str) -> dict:
    # run the DuckDB side in a worker thread while the Spark side
    # collects (r15, suite-wall item): both engines release the GIL
    # during execution, so the oracle's cost — seconds for the
    # recursive-CTE reachability oracles — overlaps the Spark jobs
    # instead of serializing after them. One thread at a time touches
    # the connection (the worker), same as the serial form.
    import threading

    duck: dict = {}

    def _duck():
        try:
            cur = con.execute(sql)
            duck["cols"] = [c[0] for c in cur.description]
            duck["rows"] = cur.fetchall()
        except BaseException as exc:  # re-raised on the test thread
            duck["err"] = exc

    worker = threading.Thread(target=_duck)
    worker.start()
    try:
        s_cols = spark_df.columns
        s_rows = [tuple(r) for r in spark_df.collect()]
    finally:
        # join even when the Spark side throws: a leaked worker would
        # still be driving the SHARED connection when the next
        # compare() call executes on it
        worker.join()
    if "err" in duck:
        raise duck["err"]
    d_cols = duck["cols"]
    d_rows = duck["rows"]
    sc, sm = rows_to_multiset(s_cols, s_rows)
    dc, dm = rows_to_multiset(d_cols, d_rows)
    result = {
        "rows": (len(s_rows), len(d_rows)),
        "cols_match": sc == dc,
        "count_match": len(s_rows) == len(d_rows),
        "values_match": sm == dm,
        "spark_cols": sc,
        "duck_cols": dc,
    }
    if not result["values_match"]:
        s_only = [r for r in sm if r not in set(dm)][:3]
        d_only = [r for r in dm if r not in set(sm)][:3]
        result["spark_only"] = s_only
        result["duck_only"] = d_only
    return result
