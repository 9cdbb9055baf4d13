"""CI lock-in for the light round-5 canon queries: run the engine side and
its DuckDB oracle side-by-side at sf0.001 and compare the driver way
(sorted columns, order-insensitive rows, floats rounded to 6dp).  Only the
canons with no featured-corpus dependency run here — the heavy ones are
covered by tools/parity_check.py and the driver's own window."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = np.round(df[c].astype(np.float64), 6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _compare(name: str):
    import duckdb

    import __ray_entry__ as e

    mine = e.queries()[name](SF)
    mine = mine.to_pandas() if hasattr(mine, "to_pandas") else mine
    oracle = duckdb.sql(e.oracle_sql()[name]).df()
    assert sorted(mine.columns) == sorted(oracle.columns)
    assert len(mine) == len(oracle)
    a, b = _canon(mine), _canon(oracle)
    for c in a.columns:
        eq = a[c].eq(b[c]) | (a[c].isna() & b[c].isna())
        assert eq.all(), f"{name}: col {c} first diff at row {int(np.flatnonzero(~eq)[0])}"


@pytest.mark.parametrize(
    "name",
    ["doc_topics_canon", "multimodal_pipeline_canon", "sanctions_gt_canon"],
)
def test_canon_query_matches_oracle(ray_session, name):
    _compare(name)
