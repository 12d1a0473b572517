"""Native numpy U2/U3 model members (functions/tsmodels.py): the
Holt-Winters recursions and the Prophet-style ridge decomposition are
real model fits, so these tests check MODEL behavior — trend recovery,
seasonality recovery, determinism, degenerate inputs — not just shape.
"""

import numpy as np

from dataframe_retail_e_inventarios_spark.functions.tsmodels import (
    fourier_trend_forecast,
    holt_winters_forecast,
)


# -- Holt-Winters ----------------------------------------------------------
def test_hw_recovers_linear_trend():
    """On an exact line the one-step SSE is minimized by following the
    trend; the forecast must continue it closely."""
    y = 2.0 + 3.0 * np.arange(40, dtype=float)
    fc = holt_winters_forecast(y, 4)
    expected = 2.0 + 3.0 * np.arange(40, 44, dtype=float)
    assert np.allclose(fc, expected, rtol=0.05)


def test_hw_constant_series_is_flat():
    y = np.full(30, 7.5)
    assert np.allclose(holt_winters_forecast(y, 4), 7.5, atol=1e-9)


def test_hw_seasonal_recovers_cycle():
    """Period-4 additive seasonality on a flat base: the 4-step
    forecast must reproduce the seasonal pattern in phase."""
    season = np.array([5.0, -1.0, -3.0, -1.0])
    y = 20.0 + np.tile(season, 10)  # 40 points, mean-zero season
    fc = holt_winters_forecast(y, 4, seasonal_periods=4)
    assert np.allclose(fc, 20.0 + season, atol=0.5)


def test_hw_degrades_to_holt_when_sample_short():
    """Fewer than two full seasons -> no seasonal state (mirrors the
    >= 52-week branch in the UDF): must equal the plain Holt result."""
    y = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    assert np.array_equal(
        holt_winters_forecast(y, 3, seasonal_periods=5),
        holt_winters_forecast(y, 3, seasonal_periods=None),
    )


def test_hw_degenerate_inputs():
    assert np.array_equal(holt_winters_forecast(np.array([]), 3), np.zeros(3))
    assert np.array_equal(
        holt_winters_forecast(np.array([4.0]), 3), np.full(3, 4.0)
    )


def test_hw_deterministic():
    rng = np.random.RandomState(0)
    y = 10 + rng.standard_normal(60)
    a = holt_winters_forecast(y, 4, seasonal_periods=12)
    b = holt_winters_forecast(y, 4, seasonal_periods=12)
    assert np.array_equal(a, b)


# -- Fourier/piecewise trend (Prophet-style) -------------------------------
def _weekly_days(n):
    return 7.0 * np.arange(n, dtype=float)


def test_fourier_recovers_linear_trend():
    t = _weekly_days(52)
    y = 1.0 + 0.5 * t
    fc = fourier_trend_forecast(y, t, 4)
    expected = 1.0 + 0.5 * (t[-1] + 7.0 * np.arange(1, 5))
    assert np.allclose(fc, expected, rtol=0.02)


def test_fourier_recovers_yearly_seasonality():
    """Two years of weekly data with a planted first-harmonic yearly
    cycle: the forecast must be in phase with the cycle, not flat."""
    t = _weekly_days(104)
    y = 50.0 + 10.0 * np.sin(2 * np.pi * t / 365.25)
    fc = fourier_trend_forecast(y, t, 4)
    tf = t[-1] + 7.0 * np.arange(1, 5)
    expected = 50.0 + 10.0 * np.sin(2 * np.pi * tf / 365.25)
    assert np.allclose(fc, expected, atol=1.0)


def test_fourier_changepoint_bends_trend():
    """Slope flips at midpoint; a straight-line fit would overshoot
    the recent regime badly, the changepoint basis must track it."""
    t = _weekly_days(80)
    y = np.where(t <= t[39], 100.0 + 1.0 * t, 100.0 + 1.0 * t[39] - 0.8 * (t - t[39]))
    fc = fourier_trend_forecast(y, t, 4)
    recent_slope = (y[-1] - y[-5]) / (t[-1] - t[-5])
    expected = y[-1] + recent_slope * 7.0 * np.arange(1, 5)
    assert np.allclose(fc, expected, atol=15.0)  # bent, not straight
    straight = y[-1] + 1.0 * 7.0 * np.arange(1, 5)  # pre-break slope
    # The forecast must track the post-break regime far better than a
    # straight pre-break extrapolation would.
    assert np.abs(fc - expected).sum() < 0.5 * np.abs(fc - straight).sum()


def test_fourier_degenerate_inputs():
    assert np.array_equal(
        fourier_trend_forecast(np.array([]), np.array([]), 3), np.zeros(3)
    )
    two = fourier_trend_forecast(np.array([3.0, 5.0]), np.array([0.0, 7.0]), 3)
    assert np.allclose(two, 4.0)  # < 3 points -> mean


def test_fourier_deterministic():
    rng = np.random.RandomState(1)
    t = _weekly_days(60)
    y = 10 + 0.1 * t + rng.standard_normal(60)
    assert np.array_equal(
        fourier_trend_forecast(y, t, 4), fourier_trend_forecast(y, t, 4)
    )
