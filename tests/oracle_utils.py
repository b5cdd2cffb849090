"""Differential-test harness mirroring the driver's DuckDB-oracle
compare: row-count + column names + order-insensitive value equality."""

from __future__ import annotations

import datetime

import duckdb
import numpy as np
import pandas as pd

from tfl_bikes_data_pipeline_spark.tables import TABLE_NAMES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:

            def _norm(v):
                if v is None:
                    return None
                if isinstance(v, datetime.datetime):
                    return v.strftime("%Y-%m-%d %H:%M:%S.%f")
                if isinstance(v, datetime.date):
                    return v.strftime("%Y-%m-%d 00:00:00.000000")
                return str(v)

            df[c] = s.map(_norm)
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def assert_within_bounds(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    """Bounded-error compare for sketch-valued queries: the oracle SQL
    returns exact-match key columns plus a ``<col>_lo``/``<col>_hi``
    interval per approximate column; every Spark estimate must land in
    its interval, with key sets equal (registry.BOUND_ORACLES)."""
    got = spark_df.toPandas()
    want = con.execute(sql).df()
    bound_cols = sorted(c[:-3] for c in want.columns if c.endswith("_lo"))
    key_cols = [c for c in want.columns if not (c.endswith("_lo") or c.endswith("_hi"))]
    assert bound_cols, f"{name}: bound oracle SQL has no *_lo columns"
    assert sorted(got.columns) == sorted(key_cols + bound_cols), (
        f"{name}: columns differ: {sorted(got.columns)} vs "
        f"{sorted(key_cols + bound_cols)}"
    )
    merged = got.merge(want, on=key_cols, how="outer", indicator=True)
    off_key = merged[merged["_merge"] != "both"]
    assert off_key.empty, f"{name}: key sets differ:\n{off_key[key_cols + ['_merge']]}"
    assert len(merged) == len(got) == len(want), f"{name}: duplicate keys in compare"
    for c in bound_cols:
        v = merged[c].astype(float).to_numpy()
        lo = merged[f"{c}_lo"].astype(float).to_numpy()
        hi = merged[f"{c}_hi"].astype(float).to_numpy()
        ok = (v >= lo) & (v <= hi)
        assert ok.all(), (
            f"{name}: col {c} out of bounds at keys "
            f"{merged.loc[~ok, key_cols].to_dict('records')[:5]}: "
            f"{v[~ok][:5]} not in [{lo[~ok][:5]}, {hi[~ok][:5]}]"
        )


def assert_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    got = normalize(spark_df.toPandas())
    want = normalize(con.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns differ: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        # Driver-faithful dtype parity: the driver's value hash renders
        # 1 != 1.0, so a DuckDB float64 paired with a Spark int/decimal
        # column is a FUTURE red driver row even though values coerce
        # equal here (exactly how r10's q_sessionize/q_cms_join_estimate
        # shipped green locally). Fail loudly instead of coercing.
        g_float = pd.api.types.is_float_dtype(g)
        w_float = pd.api.types.is_float_dtype(w)
        assert g_float == w_float, (
            f"{name}: col {c} dtype parity: spark={g.dtype} vs oracle={w.dtype} "
            "— driver hash treats 1 != 1.0; pin BOTH sides to one type "
            "(CAST ... AS BIGINT, or decimal→string→double house style)"
        )
        if g_float or w_float:
            ga = g.astype(float).to_numpy()
            wa = w.astype(float).to_numpy()
            both_nan = np.isnan(ga) & np.isnan(wa)
            eq = (ga == wa) | both_nan
            assert eq.all(), (
                f"{name}: float col {c} mismatch at rows {np.where(~eq)[0][:5]}: "
                f"{ga[~eq][:5]} vs {wa[~eq][:5]}"
            )
        else:
            g2 = g.fillna("\x00null") if g.dtype == object else g
            w2 = w.fillna("\x00null") if w.dtype == object else w
            mism = ~(g2.to_numpy() == w2.to_numpy())
            assert not mism.any(), (
                f"{name}: col {c} mismatch at rows {np.where(mism)[0][:5]}: "
                f"{g2.to_numpy()[mism][:5]} vs {w2.to_numpy()[mism][:5]}"
            )
