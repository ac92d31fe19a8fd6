"""F11 — white-noise variance transforms.

Reference conventions (enterprise_models.py:115-168 docstrings/constructors):
  tempo2    : sigma^2 = EFAC^2 * (sigma_toa^2 + EQUAD^2)
  temponest : sigma^2 = EFAC^2 * sigma_toa^2 + EQUAD^2
ECORR adds epoch-correlated blocks — handled inside the GP kernel
(likelihood/gp.py) via per-epoch grouping, not here.
"""

from __future__ import annotations

from pyspark.sql import Column


def white_sigma2(
    sigma_toa: Column, efac: Column, equad: Column, convention: str = "tempo2"
) -> Column:
    if convention == "tempo2":
        return efac * efac * (sigma_toa * sigma_toa + equad * equad)
    if convention == "temponest":
        return efac * efac * sigma_toa * sigma_toa + equad * equad
    raise ValueError(f"unknown white-noise convention: {convention}")
