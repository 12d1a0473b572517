"""Per-series model-fit pipeline as a pandas group-map UDF
[SURVEY §2.9 U1-U6; reference PRACTICA3.py:85-175].

This is the literal per-group port: Spark's ``applyInPandas`` replaces
the reference's hand-rolled ``multiprocessing.Pool`` fan-out
(PRACTICA3.py:202-205) with distributed group-map execution — groups
hash-shuffle to executors and run in Arrow-fed Python workers.

Prophet / Holt-Winters are optional imports exactly as in the
reference (PRACTICA3.py:22-32). When a library is absent, the member
does NOT silently vanish: a dependency-free numpy implementation of
the same public model family (functions/tsmodels.py — additive
Holt-Winters recursions; Prophet's piecewise-trend + Fourier
decomposition as one ridge solve) takes its slot, so the ensemble
median (PRACTICA3.py:151) is a genuine 3-member vote in every
environment. Per-model try/except isolation is preserved (U6), and
the moving-average member never fails. ``native_members=False``
restores the MA-only configuration, under which the UDF must agree
exactly with the native flagship plan — the two paths are
differential-tested against each other.

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
        # The moving-average member's (constant) forecast value. Unlike
        # the fitted members it is deterministic (PRACTICA3.py:143-145:
        # mean of the last 4 train weeks, floored at 0), which lets the
        # full-ensemble query carry an oracle-checkable column even when
        # real Prophet / Holt-Winters fits contribute to Forecast.
        StructField("MA_Member", DoubleType()),
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


def process_series(
    pdf: pd.DataFrame, native_members: bool = True, ma_only: bool = False
) -> pd.DataFrame:
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

    if len(train) >= MIN_WEEKS and not ma_only:  # U2: Prophet slot
        if PROPHET_AVAILABLE:
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
        elif native_members:
            # Same model family, native math: piecewise trend + yearly
            # Fourier seasonality on log1p'd sales, ridge-fit
            # (functions/tsmodels.fourier_trend_forecast).
            try:
                from ..functions.tsmodels import fourier_trend_forecast

                idx = pd.to_datetime(train.index)
                t_days = (idx - idx[0]).days.to_numpy(dtype=float)
                ylog = np.log1p(np.clip(train.values, 0.0, None))
                yhat = fourier_trend_forecast(ylog, t_days, FORECAST_HORIZON_WEEKS)
                preds.append(np.maximum(np.expm1(yhat), 0.0))
            except Exception:
                pass  # U6

    if len(train) >= 8 and not ma_only:  # U3: Holt-Winters slot
        if HW_AVAILABLE:
            try:
                ts = np.log1p(train.values)
                seasonal = "add" if len(ts) >= 52 else None
                hw = ExponentialSmoothing(
                    ts, trend="add", seasonal=seasonal, seasonal_periods=52 if seasonal else None
                ).fit(optimized=True)
                preds.append(np.maximum(np.expm1(hw.forecast(FORECAST_HORIZON_WEEKS)), 0.0))
            except Exception:
                pass
        elif native_members:
            try:
                from ..functions.tsmodels import holt_winters_forecast

                ts = np.log1p(train.values)
                sp = 52 if len(ts) >= 52 else None
                yhat = holt_winters_forecast(ts, FORECAST_HORIZON_WEEKS, seasonal_periods=sp)
                preds.append(np.maximum(np.expm1(yhat), 0.0))
            except Exception:
                pass

    # U4: the moving-average member never fails.
    ma = train.tail(4).mean() if len(train) >= 4 else train.mean()
    ma_member = max(0.0, float(ma))
    preds.append(np.full(FORECAST_HORIZON_WEEKS, ma_member))

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
                "MA_Member": ma_member,
            }
        ]
    )


def _gate_clip(y: "np.ndarray") -> "np.ndarray | None":
    """Admission gate + positive-quantile winsorize (PRACTICA3.py:97-99,
    105-107) — the pre-model prefix shared by the per-series and the
    batched fit paths."""
    if len(y) < MIN_WEEKS or y.sum() < MIN_TOTAL_SALES:
        return None
    pos = y[y > 0]
    if len(pos) > 5:
        y = np.clip(y, np.quantile(pos, 0.01), np.quantile(pos, 0.99))
    return y


def _member_fourier(wk_train: "np.ndarray", train: "np.ndarray") -> "np.ndarray | None":
    """U2 native slot: Prophet-family decomposition (see _series_result)."""
    try:
        from ..functions.tsmodels import fourier_trend_forecast

        # weeks are midnight-aligned datetime64[ns]; the /day division
        # is exact integer days (== DatetimeIndex.days)
        t_days = (wk_train - wk_train[0]) / np.timedelta64(1, "D")
        ylog = np.log1p(np.clip(train, 0.0, None))
        yhat = fourier_trend_forecast(ylog, t_days.astype(float), FORECAST_HORIZON_WEEKS)
        return np.maximum(np.expm1(yhat), 0.0)
    except Exception:
        return None  # U6


def _assemble_row(
    sku: str,
    store: str,
    train: "np.ndarray",
    test: "np.ndarray",
    preds: "list[np.ndarray]",
) -> dict:
    """Ensemble median + inventory formulas — the post-model suffix
    shared by the per-series and the batched fit paths."""
    ensemble = np.median(np.vstack(preds), axis=0)  # A16
    hist_avg = max(1.0, float(np.mean(train)))
    ensemble = np.clip(ensemble, 0.0, max(10 * hist_avg, float(ensemble.max())))

    sigma = float(np.std(train)) if len(train) > 1 else 0.0
    ss = SERVICE_LEVEL_Z * sigma * np.sqrt(LEAD_TIME_WEEKS)
    avg_fc = float(np.mean(ensemble)) if ensemble.size else 0.0
    rop = avg_fc * LEAD_TIME_WEEKS + ss
    last = float(train[-1]) if len(train) else 0.0
    q = max(0.0, rop - last)
    ma_member = float(preds[-1][0])  # U4 member is the constant MA
    return {
        "SKU": sku,
        "Store": store,
        "MAPE": round(_safe_mape(test, ensemble), 3),
        "Forecast": list(map(float, ensemble)),
        "Test": list(map(float, test)),
        "Safety_Stock": int(round(max(0.0, ss))),
        "Reorder_Point": int(round(max(0.0, rop))),
        "Qty_to_Order": int(round(max(0.0, q))),
        "MA_Member": ma_member,
    }


def _series_result(
    sku: str,
    store: str,
    weeks: "np.ndarray",
    y: "np.ndarray",
    native_members: bool,
    ma_only: bool,
) -> dict | None:
    """The process_series math on raw numpy arrays (weeks: datetime64[ns]
    week-sorted, y: float64 dense units) — one dict per admitted series,
    None when gated out.

    Exactness contract with process_series: every pandas op it used is
    replaced by the numpy op pandas itself dispatches to in this
    environment (no bottleneck installed): Series.sum/mean -> np.nansum
    /np.nanmean == np.sum/np.mean on NaN-free data; Series.quantile ->
    np.percentile's linear interpolation; Series.clip -> np.clip;
    np.std(Series) was already ndarray math. Verified bit-identical by
    tests/test_forecast_mapinpandas.py's map-vs-group differential and
    the ensemble certificate oracle."""
    y = _gate_clip(y)
    if y is None:
        return None

    train, test = y[:-FORECAST_HORIZON_WEEKS], y[-FORECAST_HORIZON_WEEKS:]
    preds: list[np.ndarray] = []

    if len(train) >= MIN_WEEKS and not ma_only:  # U2: Prophet slot
        wk_train = weeks[: len(train)]
        if PROPHET_AVAILABLE:
            try:
                dfp = pd.DataFrame(
                    {"ds": pd.DatetimeIndex(wk_train), "y": np.log1p(np.clip(train, 0.0, None))}
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
        elif native_members:
            fc = _member_fourier(wk_train, train)
            if fc is not None:
                preds.append(fc)

    if len(train) >= 8 and not ma_only:  # U3: Holt-Winters slot
        if HW_AVAILABLE:
            try:
                ts = np.log1p(train)
                seasonal = "add" if len(ts) >= 52 else None
                hw = ExponentialSmoothing(
                    ts, trend="add", seasonal=seasonal, seasonal_periods=52 if seasonal else None
                ).fit(optimized=True)
                preds.append(np.maximum(np.expm1(hw.forecast(FORECAST_HORIZON_WEEKS)), 0.0))
            except Exception:
                pass
        elif native_members:
            try:
                from ..functions.tsmodels import holt_winters_forecast

                ts = np.log1p(train)
                sp = 52 if len(ts) >= 52 else None
                yhat = holt_winters_forecast(ts, FORECAST_HORIZON_WEEKS, seasonal_periods=sp)
                preds.append(np.maximum(np.expm1(yhat), 0.0))
            except Exception:
                pass

    # U4: the moving-average member never fails.
    ma = np.mean(train[-4:]) if len(train) >= 4 else np.mean(train)
    ma_member = max(0.0, float(ma))
    preds.append(np.full(FORECAST_HORIZON_WEEKS, ma_member))

    return _assemble_row(sku, store, train, test, preds)


def _fit_series_batch(items: list) -> list[dict]:
    """Batched twin of per-series ``_series_result`` for the native
    fallback ensemble (no prophet/statsmodels importable — this
    container's configuration): the Holt-Winters grid search, whose
    Python-level time loop was ~60% of the fit stage, runs ONCE over
    all admitted series via ``holt_winters_forecast_many`` (elementwise
    identical recursions — see tsmodels); gate/clip, the Fourier
    member, MA and assembly reuse the exact helpers _series_result
    runs. ``items`` = [(sku, store, weeks, y), ...]; returns the same
    dicts in the same order as the per-series loop."""
    pend: list[tuple] = []
    hw_inputs: list[np.ndarray] = []
    for sku, store, weeks, y in items:
        y = _gate_clip(y)
        if y is None:
            continue
        train, test = y[:-FORECAST_HORIZON_WEEKS], y[-FORECAST_HORIZON_WEEKS:]
        preds: list[np.ndarray] = []
        if len(train) >= MIN_WEEKS:  # U2: Prophet slot (native member)
            fc = _member_fourier(weeks[: len(train)], train)
            if fc is not None:
                preds.append(fc)
        want_hw = len(train) >= 8  # U3: Holt-Winters slot
        if want_hw:
            hw_inputs.append(np.log1p(train))
        pend.append((sku, store, train, test, preds, want_hw))
    hw_fcs: list | None = None
    if hw_inputs:
        try:
            from ..functions.tsmodels import holt_winters_forecast_many

            # sp=52 for every series: holt_winters_forecast_many takes
            # the same internal len>=2*52 seasonal branch per series
            # that the scalar sp = 52 if len >= 52 else None dance
            # resolves to (len in [52, 104) is non-seasonal either way).
            hw_fcs = holt_winters_forecast_many(
                hw_inputs, FORECAST_HORIZON_WEEKS, seasonal_periods=52
            )
        except Exception:
            hw_fcs = None  # U6 fallback: per-series isolation below
    rows: list[dict] = []
    hw_i = 0
    for sku, store, train, test, preds, want_hw in pend:
        if want_hw:
            if hw_fcs is not None:
                yhat = hw_fcs[hw_i]
                preds.append(np.maximum(np.expm1(yhat), 0.0))
            else:
                try:
                    from ..functions.tsmodels import holt_winters_forecast

                    ts = np.log1p(train)
                    sp = 52 if len(ts) >= 52 else None
                    yhat = holt_winters_forecast(
                        ts, FORECAST_HORIZON_WEEKS, seasonal_periods=sp
                    )
                    preds.append(np.maximum(np.expm1(yhat), 0.0))
                except Exception:
                    pass
            hw_i += 1
        # U4: the moving-average member never fails.
        ma = np.mean(train[-4:]) if len(train) >= 4 else np.mean(train)
        ma_member = max(0.0, float(ma))
        preds.append(np.full(FORECAST_HORIZON_WEEKS, ma_member))
        rows.append(_assemble_row(sku, store, train, test, preds))
    return rows


def _fit_partition(
    batches, native_members: bool = True, ma_only: bool = False
):
    """Streaming fit loop for mapInPandas [guide §4.5 shape]: the caller
    sorts the partition by (series, week) in the JVM
    (sortWithinPartitions — same post-exchange stage, codegen), so each
    Arrow batch arrives as contiguous group runs and the per-series
    model math runs on numpy slices batch by batch. Only the (possibly
    incomplete) TRAILING group of each batch is carried into the next,
    so peak Python memory is one Arrow batch + one series —
    independent of partition size (r12 verdict #4: the previous
    whole-partition concat made peak memory grow with admitted volume
    / partition count at 100 TB). Replaces a per-group pandas
    DataFrame construction + Arrow slice round-trip per series
    (measured 239.6 -> 57.0 task-seconds on the sf0.1 full-ensemble
    python stage, 4.2x vs applyInPandas)."""
    cols = [f.name for f in RESULT_SCHEMA.fields]
    carry: pd.DataFrame | None = None
    out: list[dict] = []
    # The batched Holt-Winters grid applies to the native-fallback
    # ensemble configuration (this container: no prophet/statsmodels);
    # every other configuration keeps the per-series reference loop.
    use_batch = (
        native_members and not ma_only
        and not PROPHET_AVAILABLE and not HW_AVAILABLE
    )

    def fit_runs(pdf: pd.DataFrame, last_is_open: bool) -> pd.DataFrame | None:
        """Fit every complete group run in (sorted) pdf; return the
        trailing open run unfitted when ``last_is_open``."""
        pids = pdf["product_id"].to_numpy()
        sids = pdf["store_id"].to_numpy()
        change = np.flatnonzero((pids[1:] != pids[:-1]) | (sids[1:] != sids[:-1])) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(pids)]))
        if last_is_open:
            tail = pdf.iloc[starts[-1]:]
            starts, ends = starts[:-1], ends[:-1]
        else:
            tail = None
        if len(starts):
            wk = pd.to_datetime(pdf["week"]).to_numpy()
            vals = pdf["units_sold"].to_numpy(dtype=float)
            if use_batch:
                out.extend(
                    _fit_series_batch(
                        [
                            (str(pids[s]), str(sids[s]), wk[s:e], vals[s:e])
                            for s, e in zip(starts, ends)
                        ]
                    )
                )
            else:
                for s, e in zip(starts, ends):
                    row = _series_result(
                        str(pids[s]), str(sids[s]), wk[s:e], vals[s:e],
                        native_members, ma_only,
                    )
                    if row is not None:
                        out.append(row)
        return tail

    for pdf in batches:
        if pdf.empty:
            continue
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
        carry = fit_runs(pdf, last_is_open=True)
    if carry is not None and len(carry):
        fit_runs(carry.reset_index(drop=True), last_is_open=False)
    if out:
        yield pd.DataFrame(out, columns=cols)


def forecast_with_models(
    dense_weekly: DataFrame,
    native_members: bool = True,
    ma_only: bool = False,
    assume_gated: bool = False,
) -> DataFrame:
    """mapInPandas model-fit pass over the densified weekly table (the
    key-clustered repartition replaces groupBy().applyInPandas — r12).

    The admission gates run BOTH natively before the shuffle (cheap
    group pruning Catalyst can't infer through a UDF — the reference
    does the same manually, PRACTICA3.py:97-99) and inside the UDF
    (defense in depth for direct callers). ``native_members=False``
    drops the numpy Holt-Winters / Fourier-trend fallback members,
    leaving library members (if importable) + MA — the configuration
    the MA-only differential test against the native flagship uses.

    ``assume_gated=True`` (r12) skips the native window gating for
    callers whose ``dense_weekly`` was built with the equivalent
    resample pre-gates (weekly_dense_resample min_span_weeks/
    min_total) — that saves a full window sort over the dense table;
    the in-UDF gate still runs on every group either way."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    if assume_gated:
        gated = dense_weekly
    else:
        w = Window.partitionBy("product_id", "store_id")
        gated = (
            dense_weekly.withColumn("_n", F.count("*").over(w))
            .withColumn("_tot", F.sum("units_sold").over(w))
            .filter((F.col("_n") >= MIN_WEEKS) & (F.col("_tot") >= MIN_TOTAL_SALES))
            .drop("_n", "_tot")
        )
    # The model-fit stage is CPU-bound per GROUP, not per byte: a few
    # thousand weekly series are only ~tens of MB, so AQE's byte-based
    # partition coalescing folds the group-map exchange down to ONE
    # partition and every fit runs serially in a single Python worker
    # (measured exactly that: 1 post-AQE partition, 54 s -> 17 s at
    # sf0.01 after this pin). An explicit user repartition on the SAME
    # keys is AQE-exempt, sized by executor parallelism, and satisfies
    # the group-map's clustering requirement so no second shuffle is
    # planned.
    parallelism = dense_weekly.sparkSession.sparkContext.defaultParallelism
    gated = gated.repartition(parallelism * 2, "product_id", "store_id")
    # mapInPandas over the key-clustered partitions instead of
    # groupBy().applyInPandas (r12, guide §4.2/§4.5): the repartition
    # above already co-locates every series' rows, and the JVM-side
    # sortWithinPartitions (same post-exchange stage, codegen — r13)
    # delivers them as contiguous (series, week) runs, so the partition
    # function streams group runs batch by batch and runs the identical
    # per-series math on numpy slices — no per-group Arrow slice, no
    # per-group pandas DataFrame, and peak Python memory of one Arrow
    # batch + one series instead of the whole partition. Only the four
    # columns the fit needs cross the boundary (explicit select — Spark
    # cannot see inside the function; guide §4.1).
    cols = ["product_id", "store_id", "week", "units_sold"]
    return (
        gated.select(*cols)
        .sortWithinPartitions("product_id", "store_id", "week")
        .mapInPandas(
            lambda it: _fit_partition(it, native_members=native_members, ma_only=ma_only),
            RESULT_SCHEMA,
        )
    )
