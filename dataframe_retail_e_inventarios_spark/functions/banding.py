"""Conditional banding + report-text assembly [SURVEY §2.7 M9, §2.8 T5].

The reference's report classifies MAPE into quality bands
(generador.py:126-136) and renders a per-SKU narrative with embedded
values (generador.py:97-158). Both are pure column expressions — the
narrative becomes a ``report_text`` string column built JVM-side;
only PDF rendering stays driver-side (out of engine scope).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def mape_band(mape: Column | str, lo: float = 10.0, hi: float = 50.0) -> Column:
    """MAPE < lo -> alta precision; < hi -> aceptable; else baja
    [generador.py:126-136; edges fuzz-injectable,
    tools/fuzz_oracles.py]."""
    m = _c(mape)
    return (
        F.when(m < lo, F.lit("alta precision"))
        .when(m < hi, F.lit("aceptable"))
        .otherwise(F.lit("baja precision"))
    )


def mape_band_color(mape: Column | str, lo: float = 10.0, hi: float = 50.0) -> Column:
    m = _c(mape)
    return (
        F.when(m < lo, F.lit("green"))
        .when(m < hi, F.lit("orange"))
        .otherwise(F.lit("red"))
    )


def pedido_text(need_reorder: Column | str, qty: Column | str) -> Column:
    """Order recommendation line [generador.py:110-116]."""
    return F.when(
        _c(need_reorder),
        F.format_string(
            "RECOMENDACION CLAVE: Se debe realizar un pedido de %d unidades "
            "para evitar una posible rotura de stock.",
            _c(qty),
        ),
    ).otherwise(
        F.lit(
            "RECOMENDACION CLAVE: No se requiere realizar un pedido inmediato "
            "(el inventario actual esta por encima del ROP)."
        )
    )


def report_text(
    sku: Column | str,
    store: Column | str,
    mape: Column | str,
    qty: Column | str,
    rop: Column | str,
    ss: Column | str,
    forecast_total: Column | str,
    forecast_weeks: Column | str,
    need_reorder: Column | str,
) -> Column:
    """Per-SKU narrative [generador.py:97-158] as one string column.

    Numeric embeds are pre-rounded (round(x,2)) before %.2f formatting
    so the rendered digits are locale/engine-stable.
    """
    m2 = F.round(_c(mape), 2)
    return F.concat_ws(
        "\n",
        F.format_string("Analisis Detallado de SKU: %s en %s", _c(sku).cast("string"), _c(store).cast("string")),
        pedido_text(need_reorder, qty),
        F.format_string(
            "El punto de reorden (ROP) es de %d unidades. "
            "El stock de seguridad (SS) calculado es de %d unidades. "
            "La demanda pronosticada para las %d semanas siguientes es de %d unidades.",
            _c(rop),
            _c(ss),
            _c(forecast_weeks),
            _c(forecast_total),
        ),
        F.format_string("Precision del modelo: %s (MAPE: %.2f%%).", mape_band(mape), m2),
    )
