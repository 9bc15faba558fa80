"""Local correctness gate — replicate the round driver's CORRECTNESS check.

Runs every ``__ray_entry__.queries()`` entry against its ``oracle_sql()``
in DuckDB over a testdata dir (default sf0.01) and mirrors the driver's
compare: sort columns by name, sort rows, hash values.  Queries with no
oracle are checked rows-only (> 0 rows).

Run from /root/repo (workers must import json_schema_ray):

    python tools/local_gate.py [--sf /root/testdata/sf0.01] [--only a,b,...]

Exit 0 iff every oracled query hash-matches and every rows-only query
returns rows.  One JSON line per query + a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_frame(res):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    assert isinstance(res, pd.DataFrame), type(res)
    return res


def _canon(df):
    import numpy as np

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == np.float64:
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--retired", action="store_true",
                    help="also gate retired_queries() (pytest-only variants)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
                 include_dashboard=False)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb
    import pandas as pd

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = E.queries()
    oracles = E.oracle_sql()
    if args.retired:  # include the pytest-only retirees (full 80-query sweep)
        qs = {**qs, **E.retired_queries()}
        oracles = {**oracles, **E.retired_oracle_sql()}
    only = {s for s in args.only.split(",") if s}
    n_hash = n_rows_only = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        row = {"q": name}
        try:
            got = _canon(_to_frame(fn(args.sf)))
            row["rows"] = len(got)
            sql = oracles.get(name)
            if sql is None:
                ok = len(got) > 0
                row["mode"] = "rows_only"
                row["ok"] = bool(ok)
                n_rows_only += ok
                n_fail += not ok
            else:
                want = _canon(con.execute(sql).df())
                hm = bool(
                    len(got) == len(want)
                    and list(got.columns) == list(want.columns)
                    and pd.util.hash_pandas_object(got.astype(str), index=False).sum()
                    == pd.util.hash_pandas_object(want.astype(str), index=False).sum()
                )
                row["mode"] = "oracle"
                row["ok"] = hm
                row["oracle_rows"] = len(want)
                n_hash += hm
                n_fail += not hm
        except Exception as ex:  # noqa: BLE001
            row["mode"] = "err"
            row["ok"] = False
            row["err"] = f"{type(ex).__name__}: {str(ex)[:300]}"
            n_fail += 1
        row["sec"] = round(time.time() - t0, 2)
        print(json.dumps(row), flush=True)
    print(json.dumps({"summary": True, "hash_green": n_hash,
                      "rows_only_green": n_rows_only, "fail": n_fail}))
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
