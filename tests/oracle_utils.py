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


def assert_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    got = normalize(spark_df.toPandas())
    want = normalize(con.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns differ: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
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
