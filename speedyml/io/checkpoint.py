"""Prediction checkpoint/resume.

The reference can't checkpoint a running prediction (reservoir state x is
only saved at sync time, mod_reservoir.f90:1025; SURVEY.md section 5.4).
Here the full prediction state — reservoir states, global transformed
fields, calendar — is one pytree saved/restored atomically, so a multi-year
hybrid run resumes exactly.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from ..core.calendar import ModelDate


def save_prediction(path: str, x, atmo, logp, precip_t, date: ModelDate,
                    step: int = 0, extra: dict | None = None) -> None:
    """Atomic write (tmp + rename) of the prediction state."""
    payload = dict(
        x=np.asarray(x), atmo=np.asarray(atmo), logp=np.asarray(logp),
        date=np.asarray([date.iyear, date.imonth, date.iday, date.ihour]),
        step=np.asarray(step))
    if precip_t is not None:
        payload["precip_t"] = np.asarray(precip_t)
    for k, v in (extra or {}).items():
        payload["extra_" + k] = np.asarray(v)
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as fh:
            np.savez(fh, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def save_speedy_restart(path: str, state, coupler, date: ModelDate) -> None:
    """SPEEDY restart: spectral state + coupler slab fields + calendar
    (the reference's restart()/iogrid(69), ppo_restart.f90:1,
    ppo_iogrid.f90:400-435)."""
    payload = dict(
        date=np.asarray([date.iyear, date.imonth, date.iday, date.ihour]))
    for k in ("vor", "div", "t", "ps", "tr"):
        payload["spec_" + k] = np.asarray(getattr(state, k))
    for k, v in vars(coupler).items():
        if isinstance(v, np.ndarray):
            payload["cpl_" + k] = v
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as fh:
            np.savez(fh, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_speedy_restart(path: str):
    """Returns (SpectralState, coupler-field dict, ModelDate)."""
    from ..dynamics.state import SpectralState

    with np.load(path) as z:
        state = SpectralState(*(z["spec_" + k] for k in
                                ("vor", "div", "t", "ps", "tr")))
        cpl = {k[4:]: z[k] for k in z.files if k.startswith("cpl_")}
        y, m, d, h = (int(v) for v in z["date"])
    return state, cpl, ModelDate(iyear=y, imonth=m, iday=d, ihour=h)


def load_prediction(path: str):
    """Returns dict(x, atmo, logp, precip_t|None, date, step, extra)."""
    with np.load(path) as z:
        out = dict(x=z["x"], atmo=z["atmo"], logp=z["logp"],
                   precip_t=z["precip_t"] if "precip_t" in z else None,
                   step=int(z["step"]))
        y, m, d, h = (int(v) for v in z["date"])
        out["date"] = ModelDate(iyear=y, imonth=m, iday=d, ihour=h)
        out["extra"] = {k[6:]: z[k] for k in z.files
                        if k.startswith("extra_")}
    return out
