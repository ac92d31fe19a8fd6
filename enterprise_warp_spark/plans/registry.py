"""§2.6 — the signal registry: explicit plugin API replacing reflection.

Reference dispatch: config strings name methods on a StandardModels object
(getattr(allpsr_model, psp)(option=option), enterprise_warp.py:515-537);
users extend by subclassing and adding methods + prior defaults
(examples/custom_models.py:11-53; custom class loaded from a user .py at
results.py:1100-1110).

Here a signal is a plain entry: name -> builder(option, ctx) -> SignalSpec
(priors to sample, PSD kind, basis sizing, selection). `register_signal`
is the plugin point — no subclassing, no reflection, config strings resolve
through an explicit dict.

Option-string grammar reproduced (enterprise_models.py:170-199, 386-401):
  "30_nfreqs"      fixed Fourier component count
  "10_ndays"       cadence-derived count (A14)
  "powerlaw" / "turnover" / "free_spectrum" PSD kinds
  "by_backend" / flag-dict selections (P1)
  gwb: "hd_vary_gamma", "monopole", "dipole", and "+"-concatenation
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from enterprise_warp_spark.likelihood.sampling import Prior

# default prior ranges mirrored from the reference's StandardModels.priors
# (enterprise_models.py:72-92)
DEFAULT_PRIORS: dict[str, tuple[float, float]] = {
    "efac": (0.0, 10.0),
    "equad": (-10.0, -5.0),
    "ecorr": (-10.0, -5.0),
    "sn_lgA": (-20.0, -6.0),
    "sn_gamma": (0.0, 10.0),
    "sn_fc": (-10.0, -6.0),
    "dmn_lgA": (-20.0, -6.0),
    "dmn_gamma": (0.0, 10.0),
    "chrom_idx": (0.0, 6.0),
    "syn_lgA": (-20.0, -6.0),
    "syn_gamma": (0.0, 10.0),
    "gwb_lgA": (-20.0, -6.0),
    "gwb_gamma": (0.0, 10.0),
}


@dataclass(frozen=True)
class SignalSpec:
    signal: str
    kind: str  # white | red | common
    psd: str | None = None  # powerlaw | turnover | free_spectrum | None
    selection: str | dict | list | None = None  # P1 flag selection
    nfreqs: int | None = None  # None => A14 span-derived
    cadence_days: float | None = None
    orf: str | None = None  # hd | monopole | dipole (common signals)
    vary_gamma: bool = True
    priors: tuple[Prior, ...] = ()
    components: tuple["SignalSpec", ...] = ()  # '+'-concatenated GWB terms


def parse_option_nfreqs(option: str) -> tuple[str, int | None, float | None]:
    """'..._30_nfreqs' -> (rest, 30, None); '..._10_ndays' -> (rest, None, 10)."""
    m = re.search(r"(?:^|_)(\d+)_nfreqs", option)
    if m:
        rest = re.sub(r"(?:^|_)\d+_nfreqs", "", option).strip("_")
        return rest, int(m.group(1)), None
    m = re.search(r"(?:^|_)(\d+)_ndays", option)
    if m:
        rest = re.sub(r"(?:^|_)\d+_ndays", "", option).strip("_")
        return rest, None, float(m.group(1))
    return option, None, None


def _u(name: str, key: str) -> Prior:
    lo, hi = DEFAULT_PRIORS[key]
    return Prior(name, "uniform", lo, hi)


Builder = "Callable[[object], SignalSpec]"
SIGNAL_REGISTRY: dict[str, object] = {}


def register_signal(name: str):
    def wrap(fn):
        SIGNAL_REGISTRY[name] = fn
        return fn

    return wrap


def build_signal(signal: str, option) -> SignalSpec:
    if signal not in SIGNAL_REGISTRY:
        raise KeyError(
            f"unknown signal '{signal}'; register it with register_signal "
            f"(known: {sorted(SIGNAL_REGISTRY)})"
        )
    return SIGNAL_REGISTRY[signal](option)


@register_signal("efac")
def _efac(option) -> SignalSpec:
    return SignalSpec("efac", "white", selection=option, priors=(_u("efac", "efac"),))


@register_signal("equad")
def _equad(option) -> SignalSpec:
    return SignalSpec("equad", "white", selection=option, priors=(_u("equad", "equad"),))


@register_signal("ecorr")
def _ecorr(option) -> SignalSpec:
    return SignalSpec("ecorr", "white", selection=option, priors=(_u("ecorr", "ecorr"),))


@register_signal("white_noise")
@register_signal("measurement_noise")
def _measurement(option) -> SignalSpec:
    return SignalSpec(
        "measurement_noise",
        "white",
        selection=option,
        priors=(_u("efac", "efac"), _u("equad", "equad")),
    )


def _red(signal: str, option, lg_key: str, gamma_key: str) -> SignalSpec:
    opt, nf, cad = parse_option_nfreqs(option if isinstance(option, str) else "")
    psd = opt or "powerlaw"
    priors = [_u(f"{signal}_log10_A", lg_key)]
    if psd != "free_spectrum":
        priors.append(_u(f"{signal}_gamma", gamma_key))
    if psd == "turnover":
        priors.append(_u(f"{signal}_log10_fc", "sn_fc"))
    return SignalSpec(
        signal, "red", psd=psd, nfreqs=nf, cadence_days=cad, priors=tuple(priors)
    )


@register_signal("spin_noise")
def _spin(option="powerlaw") -> SignalSpec:
    return _red("spin_noise", option, "sn_lgA", "sn_gamma")


@register_signal("dm_noise")
def _dm(option="powerlaw") -> SignalSpec:
    spec = _red("dm_noise", option, "dmn_lgA", "dmn_gamma")
    return spec


@register_signal("chromred")
def _chrom(option="vary") -> SignalSpec:
    spec = _red("chromred", option if isinstance(option, str) else "", "sn_lgA", "sn_gamma")
    priors = spec.priors + ((_u("chromred_idx", "chrom_idx"),) if option == "vary" else ())
    return SignalSpec(
        "chromred",
        "red",
        psd=spec.psd,
        nfreqs=spec.nfreqs,
        cadence_days=spec.cadence_days,
        priors=priors,
    )


@register_signal("system_noise")
def _system(option) -> SignalSpec:
    # option: list of flag values (selection over flags['group'], P1)
    return SignalSpec(
        "system_noise",
        "red",
        psd="powerlaw",
        selection={"group": option if isinstance(option, list) else [option]},
        priors=(_u("system_noise_log10_A", "syn_lgA"), _u("system_noise_gamma", "syn_gamma")),
    )


@register_signal("ppta_band_noise")
def _band(option) -> SignalSpec:
    return SignalSpec(
        "ppta_band_noise",
        "red",
        psd="powerlaw",
        selection={"B": option if isinstance(option, list) else [option]},
        priors=(_u("band_noise_log10_A", "syn_lgA"), _u("band_noise_gamma", "syn_gamma")),
    )


@register_signal("gwb")
def _gwb(option="hd_vary_gamma") -> SignalSpec:
    """'+'-concatenation builds multi-term GWB specs (enterprise_models.py:
    386-401); each term gets its own ORF + amplitude."""
    terms = []
    for term in str(option).split("+"):
        rest, nf, cad = parse_option_nfreqs(term)
        orf = (
            "hd"
            if "hd" in rest
            else "monopole"
            if "monopole" in rest
            else "dipole"
            if "dipole" in rest
            else "none"
        )
        vary = "vary_gamma" in rest
        priors = [_u("gw_log10_A", "gwb_lgA")]
        if vary:
            priors.append(_u("gw_gamma", "gwb_gamma"))
        terms.append(
            SignalSpec(
                "gwb_term",
                "common",
                psd="powerlaw",
                orf=orf,
                vary_gamma=vary,
                nfreqs=nf,
                cadence_days=cad,
                priors=tuple(priors),
            )
        )
    if len(terms) == 1:
        return terms[0]
    return SignalSpec("gwb", "common", components=tuple(terms))


@register_signal("bayes_ephem")
def _bayes_ephem(option=True) -> SignalSpec:
    """F13 — deterministic Solar-System ephemeris perturbation (BayesEphem,
    enterprise_models.py:465-470): 11 common sampled coefficients over a
    precomputed per-TOA partial basis (functions/ephemeris.py; the kernel
    consumes them as a DetComponent)."""
    from enterprise_warp_spark.functions.ephemeris import (
        BAYESEPHEM_PARAMS,
        BAYESEPHEM_PRIOR_RANGES,
    )

    priors = tuple(
        Prior(p, "uniform", *BAYESEPHEM_PRIOR_RANGES[p]) for p in BAYESEPHEM_PARAMS
    )
    return SignalSpec("bayes_ephem", "common", psd=None, priors=priors)


def priors_for_model(rows: list[dict]) -> list[Prior]:
    """Collect the sampled-parameter list for a normalized model (§1.5 rows),
    de-duplicated by name — the sampling dimension of the inference query."""
    import json as _json

    seen: dict[str, Prior] = {}
    for row in rows:
        spec = build_signal(row["signal"], _json.loads(row["option_json"]))
        stack = [spec, *spec.components]
        for s in stack:
            for p in s.priors:
                seen.setdefault(p.name, p)
    return list(seen.values())
