"""§1.5 — noise-model JSON -> normalized logical-plan rows.

Reference format (examples/example_noisemodels/*.json; read_modeldicts at
enterprise_warp.py:306-345): `{"model_name", "universal": {...},
"common_signals": {...}, "<PSR>": {...}}` with options that are strings,
lists, or dicts. Two dicts merge with list-UNION semantics
(merge_two_noise_model_dicts, enterprise_warp.py:631-646) — J4.

Normalized table (SURVEY §1.5 mapping): rows of
(model_id, model_name, psr /* '*' = universal */, signal, option_json,
is_common); per-pulsar lookup with universal fallback (J3) becomes a left
join + coalesce over this table.
"""

from __future__ import annotations

import json

RESERVED = {"model_name", "universal", "common_signals"}


def read_noise_model_json(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def merge_noise_dicts(base: dict, extra: dict) -> dict:
    """J4 — recursive merge; lists union (order-stable), scalars overwrite."""
    out = dict(base)
    for k, v in extra.items():
        if k in out:
            a = out[k]
            if isinstance(a, dict) and isinstance(v, dict):
                out[k] = merge_noise_dicts(a, v)
            elif isinstance(a, list) and isinstance(v, list):
                out[k] = a + [x for x in v if x not in a]
            else:
                out[k] = v
        else:
            out[k] = v
    return out


def normalize_noise_model(model: dict, model_id: int = 0) -> list[dict]:
    """Flatten the nested config into logical-plan rows."""
    name = model.get("model_name", f"model_{model_id}")
    rows: list[dict] = []

    def emit(psr: str, signals: dict, common: bool) -> None:
        for signal, option in signals.items():
            rows.append(
                {
                    "model_id": model_id,
                    "model_name": name,
                    "psr": psr,
                    "signal": signal,
                    "option_json": json.dumps(option),
                    "is_common": common,
                }
            )

    emit("*", model.get("universal", {}), False)
    emit("*", model.get("common_signals", {}), True)
    for psr, signals in model.items():
        if psr in RESERVED:
            continue
        emit(psr, signals, False)
    return rows


def signals_for_pulsar(rows: list[dict], psr: str) -> list[dict]:
    """J3 — per-pulsar lookup with universal fallback: the reference uses
    noisemodel[psr.name] IF PRESENT else universal (enterprise_warp.py:
    527-530) — pulsar-specific sections REPLACE the universal block."""
    specific = [r for r in rows if r["psr"] == psr]
    if specific:
        return specific + [r for r in rows if r["psr"] == "*" and r["is_common"]]
    return [r for r in rows if r["psr"] == "*"]
