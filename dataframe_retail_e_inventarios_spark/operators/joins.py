"""Join family [SURVEY §2.3].

The reference's only joins are implicit index alignments
(limpieza_de_datos.py:42-43, generador.py:67-69); the engine ships the
full equi-join family over the driver's star schema because any real
deployment of this pipeline joins facts to dimensions.

Scale posture: dimension tables (region/nation/supplier/part at
TPC-H-ish ratios) get explicit ``broadcast()`` hints — a broadcast-hash
join with zero shuffle of the fact side. AQE converts the rest to
broadcast at runtime when a post-filter side shrinks below the
threshold.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def join_fact_to_dims(
    fact: DataFrame, dims: dict[str, tuple[DataFrame, list[str] | str]], how: str = "inner"
) -> DataFrame:
    """Join a fact to several (broadcast) dimension tables.

    ``dims`` maps name -> (dim_df, join_on). Dimensions are broadcast:
    at 100 TB the fact never shuffles for these joins.
    """
    out = fact
    for _, (dim, on) in dims.items():
        out = out.join(F.broadcast(dim), on=on, how=how)
    return out


def align_forecast_to_actuals(
    preds: DataFrame, actuals: DataFrame, on: list[str]
) -> DataFrame:
    """The reference's index-alignment join [J1: limpieza_de_datos.py:42-43]:
    predictions aligned to test dates -> inner equi-join on the time key."""
    return actuals.join(preds, on=on, how="inner")
