"""Unit tests for the H8 amplitude-ratio instrument
(scripts/amplitude_ratio.py, docs/fidelity/meso128/H8_PREREG.md): exact
ratio recovery on synthetic fields, time-coverage hard error, and the
no-samples hard error."""

import importlib.util
import pathlib

import numpy as np
import pytest

from climate2weather_tpu.data.grid import GridDataset

_ROOT = pathlib.Path(__file__).resolve().parents[1]

spec = importlib.util.spec_from_file_location(
    "amplitude_ratio", _ROOT / "scripts" / "amplitude_ratio.py"
)
amp = importlib.util.module_from_spec(spec)
spec.loader.exec_module(amp)


def _grid(fields, t0=0):
    T, H, W = next(iter(fields.values())).shape
    coords = {
        "time": (np.datetime64("2014-01-07T00", "ns")
                 + np.arange(t0, t0 + T) * np.timedelta64(3600, "s")),
        "rlat": np.linspace(-1.0, 1.0, H),
        "rlon": np.linspace(-1.0, 1.0, W),
    }
    return GridDataset({k: np.asarray(v, np.float32) for k, v in fields.items()},
                       coords, {})


def _write_case(cfg, gt_fields, sample_scales):
    cfg.mkdir(parents=True, exist_ok=True)
    _grid(gt_fields).to_file(str(cfg / "ground_truth.nc"))
    for i, s in enumerate(sample_scales):
        _grid({k: v * s for k, v in gt_fields.items()}).to_file(
            str(cfg / f"gen_sample_{i:03d}.nc")
        )


def test_exact_ratio_recovery(tmp_path):
    rng = np.random.default_rng(0)
    gt = {"uas": rng.normal(size=(5, 8, 8)), "vas": rng.normal(size=(5, 8, 8))}
    _write_case(tmp_path, gt, sample_scales=[3.0, 3.0])
    ratios = amp.amplitude_ratios(tmp_path)
    assert set(ratios) == {"uas", "vas"}
    assert ratios["uas"].shape == (2, 5)
    np.testing.assert_allclose(ratios["uas"], 3.0, rtol=1e-5)
    np.testing.assert_allclose(ratios["vas"], 3.0, rtol=1e-5)


def test_amplitude_offset_invariance(tmp_path):
    # std is mean-free: a constant bias must not move the ratio
    rng = np.random.default_rng(1)
    gt = {"tas": rng.normal(size=(3, 8, 8))}
    _write_case(tmp_path, gt, sample_scales=[2.0])
    cfg2 = tmp_path / "offset"
    cfg2.mkdir()
    _grid(gt).to_file(str(cfg2 / "ground_truth.nc"))
    _grid({"tas": gt["tas"] * 2.0 + 100.0}).to_file(
        str(cfg2 / "gen_sample_000.nc")
    )
    r1 = amp.amplitude_ratios(tmp_path)["tas"]
    r2 = amp.amplitude_ratios(cfg2)["tas"]
    np.testing.assert_allclose(r1, r2, rtol=1e-4)


def test_time_coverage_hard_error(tmp_path):
    rng = np.random.default_rng(2)
    gt = {"uas": rng.normal(size=(4, 8, 8))}
    _write_case(tmp_path, gt, sample_scales=[1.0])
    # sample whose times extend past the ground truth
    _grid({"uas": rng.normal(size=(6, 8, 8))}).to_file(
        str(tmp_path / "gen_sample_001.nc")
    )
    with pytest.raises(SystemExit, match="covers"):
        amp.amplitude_ratios(tmp_path)


def test_no_samples_hard_error(tmp_path):
    _grid({"uas": np.random.default_rng(3).normal(size=(2, 4, 4))}).to_file(
        str(tmp_path / "ground_truth.nc")
    )
    with pytest.raises(SystemExit, match="no gen_sample"):
        amp.amplitude_ratios(tmp_path)


def test_report_median_line(tmp_path):
    rng = np.random.default_rng(4)
    gt = {"psl": rng.normal(size=(3, 8, 8))}
    _write_case(tmp_path, gt, sample_scales=[4.0])
    text = amp.report([str(tmp_path)])
    assert "| psl | 4.000 |" in text
