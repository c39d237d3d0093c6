"""Engine policy calibration: thresholds derive from probed constants.

VERDICT r3 #8: the device-vs-native decision must come from measured
host<->device costs (persisted next to the JAX cache), not constants tuned
to one tunnel.  Both calibration regimes are exercised by injecting
measurements.
"""

import json

from prographmsa_tpu import engine_policy as EP
from prographmsa_tpu.config import Options


def _with_calib(monkeypatch, calib):
    if hasattr(EP.calibration, "cache_clear"):
        EP.calibration.cache_clear()
    monkeypatch.setattr(EP, "calibration", lambda: calib)


def test_threshold_scales_with_link_cost(monkeypatch):
    # tunneled TPU: 25 ms roundtrips, 15 MB/s downlink -> only huge level
    # batches pay off
    _with_calib(monkeypatch, {"roundtrip_s": 0.025, "fetch_mbps": 15.0})
    slow = EP.pallas_cells_threshold()
    # directly attached host: 0.2 ms roundtrips, GB/s downlink -> the
    # device takes over at small batch sizes
    _with_calib(monkeypatch, {"roundtrip_s": 0.0002, "fetch_mbps": 2000.0})
    fast = EP.pallas_cells_threshold()
    assert slow > 20e6
    assert fast <= 1e6
    assert slow / fast > 20


def test_use_pallas_dp_regimes(monkeypatch):
    monkeypatch.setattr(EP, "on_tpu", lambda: True)
    _with_calib(monkeypatch, {"roundtrip_s": 0.0002, "fetch_mbps": 2000.0})
    auto = Options()
    assert EP.use_pallas_dp(auto, level_cells=2_000_000)
    assert not EP.use_pallas_dp(auto, level_cells=10_000)
    _with_calib(monkeypatch, {"roundtrip_s": 0.025, "fetch_mbps": 15.0})
    assert not EP.use_pallas_dp(auto, level_cells=2_000_000)
    # explicit engines override the calibrated policy
    assert EP.use_pallas_dp(auto.replace(engine="pallas"), 1)
    assert not EP.use_pallas_dp(auto.replace(engine="native"), 10 ** 9)


def test_calibration_persists(tmp_path, monkeypatch):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
    pre = {"roundtrip_s": 0.007, "fetch_mbps": 99.0, "backend": "test"}
    (tmp_path / "pallas_calib.json").write_text(json.dumps(pre))
    # spot-check agrees (within 3x) -> persisted values are trusted
    monkeypatch.setattr(EP, "_probe_roundtrip", lambda reps=5: 0.01)
    EP.calibration.cache_clear()
    assert EP.calibration() == pre
    EP.calibration.cache_clear()


def test_calibration_reprobes_bad_persist(tmp_path, monkeypatch):
    # VERDICT r4 #10: a persisted unlucky probe (e.g. a 25x-too-slow
    # roundtrip captured during a load spike) must be detected by the
    # spot-check and corrected by a full re-probe, not trusted forever.
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
    bad = {"roundtrip_s": 0.4, "fetch_mbps": 2.0, "backend": "test"}
    (tmp_path / "pallas_calib.json").write_text(json.dumps(bad))
    fresh = {"roundtrip_s": 0.003, "fetch_mbps": 120.0, "backend": "test"}
    monkeypatch.setattr(EP, "_probe_roundtrip", lambda reps=5: 0.003)
    monkeypatch.setattr(EP, "_probe_all", lambda: dict(fresh))
    EP.calibration.cache_clear()
    assert EP.calibration() == fresh
    # and the corrected values were persisted back
    assert json.loads((tmp_path / "pallas_calib.json").read_text()) == fresh
    EP.calibration.cache_clear()


def test_calibration_spotcheck_unavailable_keeps_persisted(tmp_path,
                                                           monkeypatch):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
    pre = {"roundtrip_s": 0.007, "fetch_mbps": 99.0, "backend": "test"}
    (tmp_path / "pallas_calib.json").write_text(json.dumps(pre))
    monkeypatch.setattr(EP, "_probe_roundtrip", lambda reps=5: None)
    EP.calibration.cache_clear()
    assert EP.calibration() == pre
    EP.calibration.cache_clear()
