"""Differential test: the flagship Spark plan vs a literal pandas port
of the reference's per-series pipeline (PRACTICA3.py:85-175, MA-only
model path) on real sf0.001 data. This catches semantic drift the
DuckDB oracle can't (the oracle mirrors our design; this mirrors the
reference)."""

import numpy as np
import pandas as pd
import pytest

from dataframe_retail_e_inventarios_spark.plans.flagship import flagship
from tests.conftest import SF_SMOKE

H = 4
MIN_WEEKS = 12
MIN_TOTAL = 10
Z = 1.645
LT = 0.4285


def reference_process_sku(series: pd.DataFrame):
    """Literal port of PRACTICA3.py:85-175 with preds = [moving average]
    (Prophet/Holt-Winters unavailable in this environment, mirroring the
    reference's try/except fallback behavior)."""
    s = series.sort_values("InvoiceDate").set_index("InvoiceDate")
    s = s.resample("W-SUN").sum().fillna(0)
    if len(s) < MIN_WEEKS:
        return None
    if s["Units_Sold"].sum() < MIN_TOTAL:
        return None
    pos = s["Units_Sold"][s["Units_Sold"] > 0]
    if len(pos) > 5:
        s["Units_Sold"] = np.clip(s["Units_Sold"], pos.quantile(0.01), pos.quantile(0.99))
    train, test = s[:-H], s[-H:]
    ma = train["Units_Sold"].tail(4).mean() if len(train) >= 4 else train["Units_Sold"].mean()
    preds = [np.full(H, max(0.0, ma))]
    ensemble = np.median(np.vstack(preds), axis=0)
    hist_avg = max(1.0, train["Units_Sold"].mean())
    ensemble = np.clip(ensemble, 0.0, max(10 * hist_avg, ensemble.max()))
    y_true = test["Units_Sold"].astype(float).values
    mask = y_true != 0
    if mask.sum() == 0:
        mape = float(np.mean(np.abs(y_true - ensemble)))
    else:
        mape = float(np.mean(np.abs((y_true[mask] - ensemble[mask]) / y_true[mask])) * 100)
    tr = train["Units_Sold"]
    sigma = float(np.std(tr)) if len(tr) > 1 else 0.0
    SS = Z * sigma * np.sqrt(LT)
    rop = float(np.mean(ensemble)) * LT + SS
    last = float(tr.iloc[-1]) if len(tr) else 0.0
    return {
        "mape": round(mape, 3),
        "safety_stock": int(round(max(0.0, SS))),
        "reorder_point": int(round(max(0.0, rop))),
        "qty_to_order": int(round(max(0.0, max(0.0, rop - last)))),
        "forecast_wk": float(ensemble[0]),
    }


@pytest.fixture(scope="module")
def reference_results():
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    df = li.rename(
        columns={
            "l_partkey": "Product_ID",
            "l_suppkey": "Store_ID",
            "l_shipdate": "InvoiceDate",
            "l_quantity": "Units_Sold",
        }
    )[["Product_ID", "Store_ID", "InvoiceDate", "Units_Sold"]]
    df["Units_Sold"] = pd.to_numeric(df["Units_Sold"], errors="coerce").fillna(0)
    df = df[df["Units_Sold"] >= 0]
    out = {}
    for key, g in df.groupby(["Product_ID", "Store_ID"]):
        r = reference_process_sku(g[["InvoiceDate", "Units_Sold"]])
        if r is not None:
            out[key] = r
    return out


def test_flagship_matches_reference_port(spark, reference_results):
    got = flagship(spark, SF_SMOKE, top_k=None).toPandas()
    got_by_key = {
        (r.product_id, r.store_id): r for r in got.itertuples(index=False)
    }
    assert set(got_by_key) == set(reference_results)
    mismatches = []
    for key, exp in reference_results.items():
        g = got_by_key[key]
        for f in ("safety_stock", "reorder_point", "qty_to_order"):
            if getattr(g, f) != exp[f]:
                mismatches.append((key, f, getattr(g, f), exp[f]))
        if abs(g.mape - exp["mape"]) > 1e-6:
            mismatches.append((key, "mape", g.mape, exp["mape"]))
        if abs(g.forecast_wk - round(exp["forecast_wk"], 4)) > 1e-9:
            mismatches.append((key, "forecast_wk", g.forecast_wk, exp["forecast_wk"]))
    assert not mismatches, mismatches[:10]
