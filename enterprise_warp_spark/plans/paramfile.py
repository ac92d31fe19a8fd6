"""§1.4 — parameter-file (.dat) front-end.

Grammar (docs/paramfile.rst:12-35; parser at enterprise_warp.py:98-215):
line-oriented `label: value [value ...]`; `{N}` headers open per-model
scopes; unscoped lines set global attributes, scoped lines set per-model
attributes. The label->type map is extended dynamically by model priors and
sampler kwargs (enterprise_warp.py:149,186-197) — here unknown labels are
kept as raw strings in `extra` instead of being eval'd (the reference evals
`--extra_model_terms`, enterprise_warp.py:154; we deliberately do not).

Defaults (set_default_params, enterprise_warp.py:251-304): ephemeris DE438,
fref=1400 MHz, priors filled from the signal registry.

White-noise constants: a scalar prior < 0 marks the parameter as FIXED, to
be bound from noise files (checkifconstpar/readconstpar,
enterprise_warp.py:561-581) — O2 constant folding in SURVEY §4.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# typed labels mirrored from the reference label_attr_map
# (enterprise_warp.py:121-144); everything else lands in `extra`.
_LABELS: dict[str, type] = {
    "paramfile_label": str,
    "datadir": str,
    "out": str,
    "overwrite": bool,
    "array_analysis": bool,
    "sampler": str,
    "nsamp": int,
    "mcmc_covm_csv": str,
    "psrlist": str,
    "psrcachedir": str,
    "ssephem": str,
    "clock": str,
    "AMweight": int,
    "SCAMweight": int,
    "DEweight": int,
    "fref": float,
    "tm": str,
    "noisefiles": str,
    "noise_model_file": str,
    # S8 — declared in the reference label map (enterprise_warp.py:130)
    # but never consumed there; here it resolves to sources/xlsx.py
    "job_config_xlsx": str,
}

_SECTION = re.compile(r"^\{(\d+)\}$")


@dataclass
class ModelParams:
    model_id: int
    values: dict[str, object] = field(default_factory=dict)


@dataclass
class Params:
    values: dict[str, object] = field(default_factory=dict)
    models: list[ModelParams] = field(default_factory=list)
    extra: dict[str, str] = field(default_factory=dict)

    def __getattr__(self, name):
        try:
            return self.__dict__["values"][name]
        except KeyError:
            raise AttributeError(name) from None

    def fixed_params(self) -> dict[str, bool]:
        """P10 — scalar prior < 0 => parameter fixed from noise files."""
        out = {}
        for k, v in self.values.items():
            if isinstance(v, (int, float)) and not isinstance(v, bool) and k in (
                "efac",
                "equad",
                "ecorr",
            ):
                out[k] = v < 0
        return out


def _coerce(label: str, parts: list[str]) -> object:
    typ = _LABELS.get(label)
    raw = " ".join(parts)
    if typ is bool:
        return raw.strip().lower() in ("true", "1", "yes")
    if typ in (int, float):
        return typ(parts[0])
    if typ is str:
        return raw
    # prior-style numeric lists ("efac: 0 10") and scalars stay numeric
    try:
        nums = [float(p) for p in parts]
        return nums[0] if len(nums) == 1 else nums
    except ValueError:
        return raw


DEFAULTS = {
    "ssephem": "DE438",  # enterprise_warp.py:260-262
    "clock": "TT(BIPM2019)",
    "fref": 1400.0,  # enterprise_warp.py:283-285
    "array_analysis": False,
    "overwrite": False,
}


def parse_paramfile(path_or_text: str) -> Params:
    if "\n" not in path_or_text:
        with open(path_or_text) as fh:
            text = fh.read()
    else:
        text = path_or_text
    params = Params(values=dict(DEFAULTS))
    scope: dict[str, object] | None = None
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _SECTION.match(line)
        if m:
            mp = ModelParams(int(m.group(1)))
            params.models.append(mp)
            scope = mp.values
            continue
        if ":" not in line:
            continue
        label, rest = line.split(":", 1)
        label = label.strip()
        parts = rest.split()
        value = _coerce(label, parts) if parts else ""
        target = scope if scope is not None else params.values
        if scope is None and label not in _LABELS:
            # dynamic labels (prior overrides, sampler kwargs) — keep raw
            params.extra[label] = rest.strip()
        if isinstance(value, object):
            target[label] = value
    return params
