"""Climate-sanity scoring logic (utils.climate): a healthy synthetic
climatology passes every band; canonical failure modes are caught."""

import numpy as np

from speedyml.utils.climate import BANDS, climate_check, climate_scores

KX, IL, IX = 8, 48, 96
LAT = np.linspace(-87, 87, IL)


def _healthy():
    # jets: zonal wind maxima ~30 m/s near +-40 deg at upper levels
    uz = 30.0 * np.exp(-((np.abs(LAT) - 40.0) / 12.0) ** 2)
    u = np.zeros((KX, IL, IX))
    u[1:4] = uz[:, None]
    u[4:] = 0.3 * uz[:, None]
    # temperature: warm surface, cold aloft
    t = np.zeros((KX, IL, IX))
    for k in range(KX):
        t[k] = 210.0 + (85.0 * (k + 1) / KX) * np.cos(
            np.radians(LAT))[:, None] ** 0.5
    t[-1] = 288.0 * np.ones((IL, IX)) - 30 * (
        1 - np.cos(np.radians(LAT))[:, None])
    # precip: ITCZ maximum
    pr = 2.0 + 6.0 * np.exp(-(LAT / 10.0) ** 2)[:, None] * np.ones((1, IX))
    return u, t, pr


def test_healthy_climatology_passes():
    u, t, pr = _healthy()
    T = 90
    hours = np.arange(T) * 24.0
    t_series = 285.0 + 0.2 * np.sin(hours / 500.0)
    sc = climate_scores(LAT, u_mean=u, t_mean=t, precip_mm_day=pr,
                        tsr=240.0, olr=238.0,
                        t_low_series=t_series, hours=hours)
    ok, failures = climate_check(sc)
    assert ok, failures
    assert set(sc) == set(BANDS)


def test_failure_modes_caught():
    u, t, pr = _healthy()
    # jet collapse
    sc = climate_scores(LAT, u_mean=np.zeros_like(u))
    ok, f = climate_check(sc)
    assert not ok and any("jet_speed" in x for x in f)
    # inverted precip (midlatitudes wetter than tropics)
    sc = climate_scores(LAT, precip_mm_day=pr[::-1] * 0 + (
        8.0 - 6.0 * np.exp(-(LAT / 10.0) ** 2)[:, None]))
    ok, f = climate_check(sc)
    assert not ok and any("precip_tropics_ratio" in x for x in f)
    # runaway warming: +10 K over 90 days
    T = 90
    hours = np.arange(T) * 24.0
    sc = climate_scores(LAT, t_low_series=285.0 + hours / 216.0,
                        hours=hours)
    ok, f = climate_check(sc)
    assert not ok and any("drift" in x for x in f)
    # TOA imbalance
    sc = climate_scores(LAT, tsr=240.0, olr=200.0)
    ok, f = climate_check(sc)
    assert not ok and any("toa" in x for x in f)
    # frozen surface temperature
    sc = climate_scores(LAT, t_mean=t * 0 + 220.0)
    ok, f = climate_check(sc)
    assert not ok and any("t_low" in x for x in f)
