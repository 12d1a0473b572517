"""Per-series model-fit pipeline as a pandas group-map UDF
[SURVEY §2.9 U1-U6; reference PRACTICA3.py:85-175].

This is the literal per-group port: Spark's ``applyInPandas`` replaces
the reference's hand-rolled ``multiprocessing.Pool`` fan-out
(PRACTICA3.py:202-205) with distributed group-map execution — groups
hash-shuffle to executors and run in Arrow-fed Python workers.

Prophet / Holt-Winters are optional imports exactly as in the
reference (PRACTICA3.py:22-32): absent -> that ensemble member is
skipped, the moving-average member never fails, per-model try/except
isolation preserved (U6). With only the MA member the ensemble median
equals the MA forecast, which is what the native flagship plan
computes — the two paths are differential-tested against each other.

Everything SQL-expressible inside the loop also exists as native
relational ops (flagship.py) so the oracle can check it; only the
model fits genuinely need Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # optional, mirrors PRACTICA3.py:22-26
    from prophet import Prophet  # type: ignore

    PROPHET_AVAILABLE = True
except Exception:
    PROPHET_AVAILABLE = False

try:  # optional, mirrors PRACTICA3.py:28-32
    from statsmodels.tsa.holtwinters import ExponentialSmoothing  # type: ignore

    HW_AVAILABLE = True
except Exception:
    HW_AVAILABLE = False

FORECAST_HORIZON_WEEKS = 4
MIN_WEEKS = 12
MIN_TOTAL_SALES = 10
SERVICE_LEVEL_Z = 1.645
LEAD_TIME_WEEKS = 0.4285

RESULT_SCHEMA = StructType(
    [
        StructField("SKU", StringType()),
        StructField("Store", StringType()),
        StructField("MAPE", DoubleType()),
        StructField("Forecast", ArrayType(DoubleType())),
        StructField("Test", ArrayType(DoubleType())),
        StructField("Safety_Stock", LongType()),
        StructField("Reorder_Point", LongType()),
        StructField("Qty_to_Order", LongType()),
    ]
)


def _safe_mape(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Zero-masked MAPE with MAE fallback (PRACTICA3.py:44-51)."""
    y_true = np.asarray(y_true, dtype=float)
    y_pred = np.asarray(y_pred, dtype=float)
    mask = y_true != 0
    if mask.sum() == 0:
        return float(np.mean(np.abs(y_true - y_pred)))
    return float(np.mean(np.abs((y_true[mask] - y_pred[mask]) / y_true[mask])) * 100)


def _inventory(train_sales: pd.Series, forecast: np.ndarray) -> dict:
    """SS / ROP / Q formulas (PRACTICA3.py:68-81); np.std is ddof=0."""
    sigma = float(np.std(train_sales)) if len(train_sales) > 1 else 0.0
    ss = SERVICE_LEVEL_Z * sigma * np.sqrt(LEAD_TIME_WEEKS)
    avg_fc = float(np.mean(forecast)) if forecast.size else 0.0
    rop = avg_fc * LEAD_TIME_WEEKS + ss
    last = float(train_sales.iloc[-1]) if len(train_sales) else 0.0
    q = max(0.0, rop - last)
    return {
        "Safety_Stock": int(round(max(0.0, ss))),
        "Reorder_Point": int(round(max(0.0, rop))),
        "Qty_to_Order": int(round(max(0.0, q))),
    }


def process_series(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (product, store) weekly series -> one result row (or none if
    gated out). Input: columns product_id, store_id, week, units_sold —
    already densely resampled by the native plan, so the pandas side
    only does what SQL can't: the model fits."""
    sku = str(pdf["product_id"].iloc[0])
    store = str(pdf["store_id"].iloc[0])
    s = pdf.sort_values("week").set_index("week")["units_sold"].astype(float)

    if len(s) < MIN_WEEKS or s.sum() < MIN_TOTAL_SALES:
        return pd.DataFrame(columns=[f.name for f in RESULT_SCHEMA.fields])

    pos = s[s > 0]
    if len(pos) > 5:
        s = s.clip(pos.quantile(0.01), pos.quantile(0.99))

    train, test = s[:-FORECAST_HORIZON_WEEKS], s[-FORECAST_HORIZON_WEEKS:]
    preds: list[np.ndarray] = []

    if PROPHET_AVAILABLE and len(train) >= MIN_WEEKS:  # U2
        try:
            dfp = pd.DataFrame(
                {"ds": pd.to_datetime(train.index), "y": np.log1p(train.clip(lower=0.0).values)}
            )
            m = Prophet(
                yearly_seasonality=True,
                weekly_seasonality=False,
                daily_seasonality=False,
                seasonality_mode="additive",
                changepoint_prior_scale=0.1,
            )
            m.fit(dfp)
            future = m.make_future_dataframe(periods=FORECAST_HORIZON_WEEKS, freq="W-SUN")
            yhat = np.expm1(m.predict(future)["yhat"].iloc[-FORECAST_HORIZON_WEEKS:].values)
            preds.append(np.maximum(yhat, 0.0))
        except Exception:
            pass  # U6: model isolation

    if HW_AVAILABLE and len(train) >= 8:  # U3
        try:
            ts = np.log1p(train.values)
            seasonal = "add" if len(ts) >= 52 else None
            hw = ExponentialSmoothing(
                ts, trend="add", seasonal=seasonal, seasonal_periods=52 if seasonal else None
            ).fit(optimized=True)
            preds.append(np.maximum(np.expm1(hw.forecast(FORECAST_HORIZON_WEEKS)), 0.0))
        except Exception:
            pass

    # U4: the moving-average member never fails.
    ma = train.tail(4).mean() if len(train) >= 4 else train.mean()
    preds.append(np.full(FORECAST_HORIZON_WEEKS, max(0.0, float(ma))))

    ensemble = np.median(np.vstack(preds), axis=0)  # A16
    hist_avg = max(1.0, float(train.mean()))
    ensemble = np.clip(ensemble, 0.0, max(10 * hist_avg, float(ensemble.max())))

    y_true = test.values
    inv = _inventory(train, ensemble)
    return pd.DataFrame(
        [
            {
                "SKU": sku,
                "Store": store,
                "MAPE": round(_safe_mape(y_true, ensemble), 3),
                "Forecast": list(map(float, ensemble)),
                "Test": list(map(float, y_true)),
                **inv,
            }
        ]
    )


def forecast_with_models(dense_weekly: DataFrame) -> DataFrame:
    """groupBy(series).applyInPandas over the densified weekly table.

    The admission gates run BOTH natively before the shuffle (cheap
    group pruning Catalyst can't infer through a UDF — the reference
    does the same manually, PRACTICA3.py:97-99) and inside the UDF
    (defense in depth for direct callers)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = Window.partitionBy("product_id", "store_id")
    gated = (
        dense_weekly.withColumn("_n", F.count("*").over(w))
        .withColumn("_tot", F.sum("units_sold").over(w))
        .filter((F.col("_n") >= MIN_WEEKS) & (F.col("_tot") >= MIN_TOTAL_SALES))
        .drop("_n", "_tot")
    )
    return gated.groupBy("product_id", "store_id").applyInPandas(
        lambda pdf: process_series(pdf), RESULT_SCHEMA
    )
