"""Pure-Python/numpy kernels for the pandas-UDF operators.

IMPORTANT: this module must NOT import pyspark (directly or transitively).
Spark workers import it when deserializing applyInPandas closures; pulling
in the function-registry package there would try to build Column objects
with no active SparkContext.
"""

from __future__ import annotations

import math

import numpy as np

ALPHA, BETA, GAMMA = 0.1, 0.0035, 0.1


def round6(x: float) -> float:
    """Half-even rounding to 6 dp (helper.SafeRound, helper.go:225-231)."""
    if math.isnan(x):
        return x
    return float(np.round(x, 6))


def ema_series(vals: np.ndarray, wp: int, constant: float, preview: int,
               ts: np.ndarray):
    """EMA loop — exponentialMovingAverage/function.go:100-141."""
    n = len(vals)
    if wp > n:
        m = np.nanmean(vals) if np.any(~np.isnan(vals)) else np.nan
        return ts[:1] + preview, np.array([round6(m)])
    head = vals[:wp]
    ema = np.nanmean(head) if np.any(~np.isnan(head)) else 0.0
    if math.isnan(ema):
        ema = 0.0
    out = [round6(ema)]
    for v in vals[wp:]:
        if math.isnan(v):
            out.append(math.nan)
            continue
        ema = constant * v + (1 - constant) * ema
        out.append(round6(ema))
    return ts[: len(out)] + preview, np.array(out)


def hw_analysis(vals: np.ndarray, step: int, seasonality: int):
    """Triple-exponential smoothing — expr/holtwinters/hw.go:36-127."""
    season_len = max(2, seasonality // step)
    n = len(vals)
    intercepts = np.empty(n)
    slopes = np.empty(n)
    seasonals = np.empty(n)
    predictions = np.empty(n)
    deviations = np.empty(n)
    next_pred = math.nan

    for i, actual in enumerate(vals):
        if math.isnan(actual):
            intercepts[i] = math.nan
            slopes[i] = 0.0
            seasonals[i] = 0.0
            predictions[i] = next_pred
            deviations[i] = 0.0
            next_pred = math.nan
            continue
        if i == 0:
            last_intercept, last_slope = actual, 0.0
            prediction = actual
        else:
            last_intercept = intercepts[i - 1]
            last_slope = slopes[i - 1]
            if math.isnan(last_intercept):
                last_intercept = actual
            prediction = next_pred
        last_seasonal = seasonals[i - season_len] if i - season_len >= 0 else 0.0
        next_last_seasonal = (seasonals[i + 1 - season_len]
                              if i + 1 - season_len >= 0 else 0.0)
        last_dev = deviations[i - season_len] if i - season_len >= 0 else 0.0

        intercept = (ALPHA * (actual - last_seasonal)
                     + (1 - ALPHA) * (last_intercept + last_slope))
        slope = BETA * (intercept - last_intercept) + (1 - BETA) * last_slope
        seasonal = GAMMA * (actual - intercept) + (1 - GAMMA) * last_seasonal
        next_pred = intercept + slope + next_last_seasonal
        pred_for_dev = 0.0 if math.isnan(prediction) else prediction
        deviation = GAMMA * abs(actual - pred_for_dev) + (1 - GAMMA) * last_dev

        intercepts[i] = intercept
        slopes[i] = slope
        seasonals[i] = seasonal
        predictions[i] = prediction
        deviations[i] = deviation
    return predictions, deviations
