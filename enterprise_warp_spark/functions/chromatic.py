"""F5/F6 — chromatic (radio-frequency-dependent) basis weights.

Reference: DM scaling ~ nu^-2 with fref=1400 MHz
(enterprise_models.py:238-241; libstempo_warp.py:14-15); general chromatic
index ~ nu^-idx, idx free in [0,6] (enterprise_models.py:245-286 chromred).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dm_weight(freq_mhz: Column, fref_mhz: float = 1400.0) -> Column:
    return F.pow(F.lit(fref_mhz) / freq_mhz, 2.0)


def chromatic_weight(freq_mhz: Column, idx: Column, fref_mhz: float = 1400.0) -> Column:
    return F.pow(F.lit(fref_mhz) / freq_mhz, idx)
