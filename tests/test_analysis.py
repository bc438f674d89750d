"""Tests for the offline analysis library (speedyml.utils.analysis) —
the framework counterpart of the reference's post-processing scripts
(scripts/hybrid_climo.py, scripts/enso_hybrid.py)."""

import numpy as np
import pytest

from speedyml.utils import analysis as an


class TestBasics:
    def test_rms(self):
        t = np.zeros((4, 5))
        p = np.full((4, 5), 2.0)
        assert an.rms(t, p) == pytest.approx(2.0)
        p[0, 0] = np.nan
        assert an.rms(t, p) == pytest.approx(2.0)

    def test_weighted_rms_uniform_field(self):
        lat = np.linspace(-87, 87, 48)
        t = np.zeros((48, 96))
        p = np.full((48, 96), 3.0)
        assert an.weighted_rms(t, p, lat) == pytest.approx(3.0)


class TestSigmaToPressure:
    def test_linear_in_pressure_field(self):
        """A field linear in pressure interpolates exactly."""
        il, ix = 6, 8
        logp = np.zeros((il, ix))                  # ps = 1000 hPa everywhere
        pres = an.SPEEDY_SIGMA[:, None, None] * 1000.0
        var = 2.0 * np.broadcast_to(pres, (8, il, ix)) + 5.0
        tgt = np.array([100.0, 500.0, 900.0])
        out = an.sigma_to_pressure(var, logp, tgt)
        for i, p in enumerate(tgt):
            np.testing.assert_allclose(out[i], 2.0 * p + 5.0, rtol=1e-12)

    def test_no_extrapolation(self):
        logp = np.zeros((4, 4))
        var = np.ones((8, 4, 4))
        out = an.sigma_to_pressure(var, logp, np.array([10.0, 990.0]))
        assert np.isnan(out[0]).all()              # above the top level
        assert np.isnan(out[1]).all()              # below the lowest level

    def test_surface_pressure_dependence(self):
        """Lower surface pressure pushes a fixed target level out of range."""
        logp = np.full((2, 2), np.log(0.5))        # ps = 500 hPa
        var = np.ones((8, 2, 2))
        out = an.sigma_to_pressure(var, logp, np.array([600.0]))
        assert np.isnan(out[0]).all()


class TestClimatologyAndEnso:
    def test_monthly_climatology_and_anomaly(self):
        T = 48
        months = np.tile(np.arange(1, 13), 4)
        fields = months.astype(float)[:, None] * np.ones((T, 3))
        clim = an.monthly_climatology(fields, months)
        np.testing.assert_allclose(clim[:, 0], np.arange(1, 13))
        np.testing.assert_allclose(an.anomalies(fields, months), 0.0,
                                   atol=1e-12)

    def test_box_mean_dateline_wrap(self):
        lat = np.linspace(-85, 85, 12)
        lon = np.arange(0, 360, 30.0)
        f = np.zeros((12, 12))
        box = (lon >= 330) | (lon <= 30)
        f[:, box] = 7.0
        m = an.box_mean(f, lat, lon, (-90, 90), (330.0, 30.0))
        assert m == pytest.approx(7.0)

    def test_nino34_constant_sst_is_zero(self):
        lat = np.linspace(-87, 87, 48)
        lon = np.arange(0, 360, 3.75)
        T = 36
        months = (np.arange(T) % 12) + 1
        sst = np.full((T, 48, 96), 300.0)
        idx = an.nino34_index(sst, lat, lon, months)
        np.testing.assert_allclose(idx, 0.0, atol=1e-12)
        assert idx.shape == (T,)

    def test_nino34_detects_warm_event(self):
        lat = np.linspace(-87, 87, 48)
        lon = np.arange(0, 360, 3.75)
        T = 60
        months = (np.arange(T) % 12) + 1
        sst = np.full((T, 48, 96), 300.0)
        box_la = (lat >= -5) & (lat <= 5)
        box_lo = (lon >= 190) & (lon <= 240)
        warm = np.ix_(np.arange(30, 42), np.where(box_la)[0],
                      np.where(box_lo)[0])
        sst[warm] += 2.0
        idx = an.nino34_index(sst, lat, lon, months, smooth=1)
        assert idx[30:42].mean() > 1.0
        assert abs(idx[:24].mean()) < 0.5

    def test_anomaly_correlation_perfect(self):
        lat = np.linspace(-87, 87, 48)
        rng = np.random.default_rng(0)
        clim = rng.standard_normal((48, 96))
        truth = clim + rng.standard_normal((48, 96))
        acc = an.anomaly_correlation(truth, truth, clim, lat)
        assert acc == pytest.approx(1.0)
        anti = 2 * clim - truth                     # anomaly = -(truth anom)
        assert an.anomaly_correlation(anti, truth, clim, lat) == \
            pytest.approx(-1.0)


class TestExtremesAndPrecip:
    def test_block_maxima(self):
        x = np.arange(20.0)[:, None] * np.ones((20, 2))
        bm = an.return_period_maxima(x, 5)
        np.testing.assert_allclose(bm[:, 0], [4.0, 9.0, 14.0, 19.0])

    def test_total_precip_inverts_log_transform(self):
        lat = np.linspace(-87, 87, 48)
        p_mm = np.full((48, 96), 4.0)
        plog = np.log(1.0 + p_mm / 0.001)
        tot = an.global_total_precip(plog, lat)
        assert tot == pytest.approx(4.0, rel=1e-10)

    def test_power_spectrum_peak(self):
        t = np.arange(512)
        x = np.sin(2 * np.pi * t / 16.0)
        f, psd = an.power_spectrum(x, dt=1.0)
        assert f[np.argmax(psd)] == pytest.approx(1.0 / 16.0, rel=0.1)


class TestMassAndTrends:
    def test_total_atmosphere_mass_isobaric(self):
        # uniform ps = 1000 hPa -> mass = 1e5 Pa / g everywhere
        lat = np.linspace(-87, 87, 48)
        logp = np.zeros((3, 48, 96))
        m = an.total_atmosphere_mass(logp, lat)
        np.testing.assert_allclose(m, 1e5 / 9.81, rtol=1e-12)

    def test_total_atmosphere_mass_area_weighting(self):
        # a ps bump at the pole must move the global mean less than the
        # same bump at the equator
        lat = np.linspace(-87, 87, 48)
        base = np.zeros((1, 48, 96))
        pole, eq = base.copy(), base.copy()
        pole[0, -1] = 0.01
        eq[0, 24] = 0.01
        dm_pole = an.total_atmosphere_mass(pole, lat)[0]
        dm_eq = an.total_atmosphere_mass(eq, lat)[0]
        ref = an.total_atmosphere_mass(base, lat)[0]
        assert dm_eq - ref > 3 * (dm_pole - ref) > 0

    def test_running_mean_preserves_length_and_smooths(self):
        rng = np.random.default_rng(0)
        x = np.sin(np.arange(200) / 10.0) + 0.1 * rng.standard_normal(200)
        s = an.running_mean(x, 11)
        assert s.shape == x.shape
        assert np.std(np.diff(s)) < np.std(np.diff(x))
        # a constant series is a fixed point regardless of n parity
        np.testing.assert_allclose(an.running_mean(np.full(50, 3.0), 10),
                                   3.0)

    def test_linear_trend_recovers_slope(self):
        t = np.arange(100, dtype=np.float64)
        y = 2.5 * (t * 0.25) + 1.0     # slope 2.5 per time unit, dt=0.25
        slope, intercept = an.linear_trend(y, dt=0.25)
        assert slope == pytest.approx(2.5, rel=1e-12)
        assert intercept == pytest.approx(1.0, abs=1e-9)

    def test_linear_trend_vectorized_over_trailing_axes(self):
        t = np.arange(60, dtype=np.float64)
        y = np.stack([0.5 * t, -1.0 * t + 4.0], axis=1)
        slope, intercept = an.linear_trend(y)
        np.testing.assert_allclose(slope, [0.5, -1.0], rtol=1e-12)
        np.testing.assert_allclose(intercept, [0.0, 4.0], atol=1e-9)


class TestAnalyzeForecastCli:
    def test_cli_end_to_end(self, tmp_path):
        """scripts/analyze_forecast.py runs against ForecastWriter output
        (the runnable analog of the reference's hybrid_climo/enso scripts)."""
        import subprocess
        import sys

        from speedyml.io.output import ForecastWriter

        rng = np.random.default_rng(1)
        lat = np.linspace(-87, 87, 48)
        lon = np.arange(0, 360, 3.75)
        paths = [str(tmp_path / n) for n in ("pred.nc", "truth.nc")]
        for path in paths:
            with ForecastWriter(path, 8, 48, 96, lat=lat, lon=lon,
                                with_sst=True) as w:
                for _ in range(6):
                    atmo = np.stack([
                        np.full((8, 48, 96), 260.0),
                        rng.standard_normal((8, 48, 96)),
                        rng.standard_normal((8, 48, 96)),
                        np.abs(rng.standard_normal((8, 48, 96)))])
                    w.append(atmo, rng.standard_normal((48, 96)) * 0.01,
                             precip_mm=np.abs(rng.standard_normal((48, 96))),
                             sst=np.full((48, 96), 300.0))
        import os
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts",
                                          "analyze_forecast.py"),
             paths[0], "--truth", paths[1], "--pressure", "500"],
            capture_output=True, text=True, timeout=180)
        assert out.returncode == 0, out.stderr
        assert "RMS vs truth" in out.stdout
        assert "T @ 500 hPa" in out.stdout
        assert "total atmosphere mass" in out.stdout
        assert "Nino-3.4 index" in out.stdout


class TestDecadeTableCli:
    def test_per_year_table_and_mass_drift(self, tmp_path):
        """scripts/decade_table.py emits per-year rows plus the
        mass-conservation drift (total_atmosphere_weight.py capability)."""
        import json
        import os
        import subprocess
        import sys

        from speedyml.io.output import ForecastWriter

        rng = np.random.default_rng(2)
        lat = np.linspace(-87, 87, 48)
        lon = np.arange(0, 360, 3.75)
        path = str(tmp_path / "run.nc")
        n = 48
        with ForecastWriter(path, 8, 48, 96, lat=lat, lon=lon,
                            with_sst=True) as w:
            for i in range(n):
                atmo = np.stack([
                    np.full((8, 48, 96), 260.0),
                    rng.standard_normal((8, 48, 96)),
                    rng.standard_normal((8, 48, 96)),
                    np.abs(rng.standard_normal((8, 48, 96)))])
                # small secular ps trend -> nonzero mass drift
                w.append(atmo, np.full((48, 96), 1e-4 * i, np.float32),
                         precip_mm=np.abs(rng.standard_normal((48, 96))),
                         sst=np.full((48, 96), 300.0))
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out_json = str(tmp_path / "table.json")
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts",
                                          "decade_table.py"),
             "--nc", path, "--steps-per-year", "16", "--out", out_json],
            capture_output=True, text=True, timeout=180)
        assert r.returncode == 0, r.stderr
        assert "DECADE TABLE OK" in r.stdout
        with open(out_json) as f:
            tab = json.load(f)
        assert len(tab["years"]) == 3
        assert tab["atmosphere_mass"] is not None
        assert tab["atmosphere_mass"]["drift_kg_m2_per_year"] > 0
        assert tab["atmosphere_mass"]["mean_kg_m2"] == pytest.approx(
            1e5 / 9.81, rel=0.01)
