"""Linearized timing-model design matrix M — the reference's `tm:` choice.

Reference: every reference inference run includes the linear timing model in
the PTA (enterprise_warp.py:500-508): `tm: default` -> gp_signals.TimingModel
(normalized basis, effectively-infinite 1e40 prior weight), `tm: fast` ->
gp_signals.MarginalizingTimingModel (exact analytic marginalization),
`tm: ridge_regression` -> BasisGP with a sampled ridge variance over the
scaled basis; `tm_svd: 1` (enterprise_warp.py:506, use_svd) stabilizes the
basis by replacing M with its left singular vectors.

The reference obtains M from libstempo/tempo2 (the exact partial derivatives
of the timing solution). This container has no tempo2, so M is BUILT from the
`.par` file's fit-flagged parameters with the standard column shapes of
pulsar-timing linearized models:

  - OFFSET                 : 1                      (always present)
  - F0, F1, ... (spin)     : (t - PEPOCH)^k / k!
  - DM, DM1, DM2           : (t - DMEPOCH)^k / (K_DM * freq_MHz^2)
  - JUMP -flag value (fit) : indicator[flags[flag] == value]
  - RAJ/DECJ               : sin/cos of the annual orbit angle
  - PMRA/PMDEC             : t * sin / t * cos (annual)
  - PX                     : sin/cos at the SEMI-annual period

The astrometric partials are the first-order circular-orbit harmonics: the
exact Roemer-delay partials are fixed linear combinations of these columns
(eccentricity corrections are O(e)=2%), so marginalizing this SUBSPACE
removes the same fit-uncertainty directions tempo2's exact partials would —
and since the marginalization is over the column SPAN, the per-column scale
and phase conventions drop out. Columns are 2-norm normalized like
enterprise's normed=True basis.

Scale shape: the spec is a tiny tuple-of-tuples compiled once on the driver
from the (KB-sized) .par file; each executor kernel materializes its own
pulsar's (n_toa x m) matrix from the TOA columns it already holds — M never
crosses the wire.
"""

from __future__ import annotations

import math

import numpy as np

YEAR_S = 365.25 * 86400.0
DAY_S = 86400.0
# dispersion constant: delay_s = DM / (K_DM * f_MHz^2)
K_DM = 2.41e-4

# spec entry kinds:
#   ("offset",)
#   ("spin", k, pepoch_s)          k >= 1: (t - pepoch)^k / k!
#   ("dm", k, dmepoch_s)           k >= 0: (t - dmepoch)^k / (K_DM freq^2)
#   ("jump", flag, value)          indicator over the TOA flag map
#   ("harm", cycles_per_year, fn, moment)  fn in ('sin','cos'); t^moment * fn
TMSpec = tuple[tuple, ...]


def tm_spec_from_par_file(
    path: str, include_astrometry: bool = True, mjd0: float | None = None
) -> TMSpec:
    """Compile a .par file (SURVEY §1.2 format) to a design-matrix spec.

    Only fit-flagged rows (trailing `1`, enterprise_warp.py reads the same
    convention via libstempo) contribute columns; OFFSET is always included.
    JUMP lines come in two tempo2 forms — `JUMP -flag value offset fit` and
    `JUMP -flag offset fit` — both keyed on the TOA flag map.

    mjd0: the MJD of t_s == 0 for the TOA times fed to design_matrix
    (defaults to PEPOCH so epochs line up when toa_s is PEPOCH-relative).
    """
    params: dict[str, tuple[str, bool]] = {}
    jumps: list[tuple[str, str]] = []
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            name = parts[0]
            if name == "JUMP" and len(parts) >= 3:
                if parts[-1] == "1":
                    flag = parts[1].lstrip("-")
                    # `JUMP -flag value offset 1` vs `JUMP -flag offset 1`
                    value = parts[2] if len(parts) >= 5 else "1"
                    jumps.append((flag, value))
                continue
            if len(parts) >= 2:
                fit = len(parts) >= 3 and parts[2] == "1"
                params[name] = (parts[1], fit)

    def val(name: str, default: float = 0.0) -> float:
        return float(params[name][0]) if name in params else default

    pepoch = val("PEPOCH", 0.0)
    if mjd0 is None:
        mjd0 = pepoch
    pepoch_s = (pepoch - mjd0) * DAY_S
    dmepoch_s = (val("DMEPOCH", pepoch) - mjd0) * DAY_S

    spec: list[tuple] = [("offset",)]
    for k in range(1, 13):
        fname = f"F{k - 1}"
        if fname in params and params[fname][1]:
            spec.append(("spin", k, pepoch_s))
    for k in range(0, 10):
        dname = "DM" if k == 0 else f"DM{k}"
        if dname in params and params[dname][1]:
            spec.append(("dm", k, dmepoch_s))
    if include_astrometry:
        if any(params.get(p, ("", False))[1] for p in ("RAJ", "DECJ")):
            spec += [("harm", 1.0, "sin", 0), ("harm", 1.0, "cos", 0)]
        if any(params.get(p, ("", False))[1] for p in ("PMRA", "PMDEC")):
            spec += [("harm", 1.0, "sin", 1), ("harm", 1.0, "cos", 1)]
        if params.get("PX", ("", False))[1]:
            spec += [("harm", 2.0, "sin", 0), ("harm", 2.0, "cos", 0)]
    spec += [("jump", flag, value) for flag, value in jumps]
    return tuple(spec)


def design_matrix(
    spec: TMSpec,
    t_s: np.ndarray,
    freq_mhz: np.ndarray | None = None,
    flag_of=None,
    normalize: bool = True,
    svd: bool = False,
    t_scale: float | None = None,
    drop_empty: bool = True,
) -> np.ndarray:
    """Materialize M (n_toa x m) for one pulsar from its spec.

    flag_of: callable flag_name -> per-TOA string array (for jump columns);
    jump columns whose flag never matches are dropped (a jump with no TOAs
    in this pulsar is not a fittable direction — keeping the zero column
    would make M rank-deficient) unless drop_empty=False (chunk-parallel
    callers need a FIXED column layout across chunks; they drop globally-
    empty columns at merge time instead).

    t_scale: divide the spin/dm time powers by this characteristic span so
    columns are O(1) WITHOUT data-dependent normalization — the scaling a
    chunk-parallel reduction needs, since per-chunk 2-norms would break
    associativity while raw (t)^k columns span ~16 orders and wreck the
    merge-side solve's conditioning.

    svd=True replaces M with its left singular vectors (orthonormal columns
    spanning col(M)) — the reference's tm_svd stabilization
    (enterprise_warp.py:277-279,506). The marginalized likelihood depends on
    M only through its column span up to a per-pulsar constant, but the
    basis must be consistent between runs being compared.
    """
    t = np.asarray(t_s, dtype=np.float64)
    ts = 1.0 if t_scale is None else float(t_scale)
    cols: list[np.ndarray] = []
    for entry in spec:
        kind = entry[0]
        if kind == "offset":
            cols.append(np.ones_like(t))
        elif kind == "spin":
            _, k, epoch_s = entry
            cols.append(((t - epoch_s) / ts) ** k / math.factorial(k))
        elif kind == "dm":
            _, k, epoch_s = entry
            if freq_mhz is None:
                raise ValueError("dm columns need freq_mhz")
            f = np.asarray(freq_mhz, dtype=np.float64)
            cols.append(((t - epoch_s) / ts) ** k / (K_DM * f**2))
        elif kind == "harm":
            _, cyc_per_yr, fn, moment = entry
            arg = 2.0 * math.pi * cyc_per_yr * t / YEAR_S
            base = np.sin(arg) if fn == "sin" else np.cos(arg)
            cols.append(base * (t / YEAR_S) ** moment if moment else base)
        elif kind == "jump":
            _, flag, value = entry
            if flag_of is None:
                raise ValueError("jump columns need flag_of")
            vals = flag_of(flag)
            ind = (np.asarray(vals, dtype=object) == value).astype(np.float64)
            if drop_empty and ind.sum() == 0:
                continue
            cols.append(ind)
        else:
            raise ValueError(f"unknown tm spec entry {entry!r}")
    M = np.column_stack(cols)
    if normalize or svd:
        # normalize BEFORE any SVD: raw column scales span ~16 orders
        # ((t-pepoch)^2/2 vs a jump indicator), so a relative singular-value
        # cutoff on the raw matrix would silently drop small-scale columns
        norms = np.linalg.norm(M, axis=0)
        norms[norms == 0.0] = 1.0
        M = M / norms
    if svd:
        # orthonormal span; also drops exactly-degenerate directions
        u, s, _ = np.linalg.svd(M, full_matrices=False)
        return u[:, s > s[0] * 1e-12]
    return M


def fit_residuals(
    M: np.ndarray, y: np.ndarray, w: np.ndarray | None = None
) -> np.ndarray:
    """Weighted-least-squares residual projection r = y - M (M^T W M)^+ M^T W y
    — the classic R-matrix applied to raw offsets; the reference gets this
    from tempo2's fit, we expose it for building residuals standalone."""
    w = np.ones_like(y) if w is None else np.asarray(w, dtype=np.float64)
    Mw = M * w[:, None]
    coef, *_ = np.linalg.lstsq(M.T @ Mw, Mw.T @ y, rcond=None)
    return y - M @ coef


def flag_array_from_pandas(series):
    """Normalize a Spark MAP<STRING,STRING> column collected via Arrow
    (per-row dict OR list of (k, v) tuples) into a flag->values lookup
    callable suitable for design_matrix's flag_of."""
    vals = series.to_numpy()

    def flag_of(flag: str) -> np.ndarray:
        out = np.empty(len(vals), dtype=object)
        for i, m in enumerate(vals):
            if m is None:
                out[i] = None
            elif isinstance(m, dict):
                out[i] = m.get(flag)
            else:  # arrow map -> list of (key, value) pairs
                out[i] = next((v for k, v in m if k == flag), None)
        return out

    return flag_of
