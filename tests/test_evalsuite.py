"""Eval suite + viz tests: golden PSNR/SSIM values, EPE identity check, panels."""

import os
import numpy as np

from opticalflowscivis_tpu.evalsuite import (
    calculate_diff,
    calculate_metrics,
    calculate_psnr,
    calculate_ssim,
    evaluate_flow,
    flow_epe,
    flow_outlier_pct,
    linear_interpolation_baseline,
)


def test_psnr_golden():
    a = np.zeros((16, 16))
    b = np.full((16, 16), 10.0)
    # mse=100 → psnr = 20*log10(255/10) = 28.13
    assert abs(calculate_psnr(a, b) - 28.1308) < 1e-3
    assert calculate_psnr(a, a) == float("inf")


def test_ssim_identity_and_degradation():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (32, 32)).astype(np.float32)
    assert calculate_ssim(img, img) > 0.9999
    noisy = img + rng.normal(0, 25, img.shape).astype(np.float32)
    assert calculate_ssim(img, noisy) < 0.99


def test_calculate_metrics_splits_kept_frames():
    rng = np.random.default_rng(1)
    orig = rng.uniform(0, 255, (8, 16, 16)).astype(np.float32)
    interp = orig.copy()
    interp[1::2] += 20.0  # corrupt only interpolated frames (factor 2)
    psnr, ssim = calculate_metrics(orig, interp, factor=2)
    assert psnr < 30  # corrupted interpolated frames dominate
    # kept frames (even idx) are identical and must be excluded from the mean
    psnr_all_equal, _ = calculate_metrics(orig, orig, factor=2)
    assert psnr_all_equal == float("inf")


def test_linear_baseline_exact_for_linear_motion():
    t = np.arange(9, dtype=np.float32)[:, None, None] * np.ones((1, 4, 4), np.float32)
    rec = linear_interpolation_baseline(t, factor=4)
    np.testing.assert_allclose(rec, t, atol=1e-6)


def test_diff_contrast_stretch():
    a = np.zeros((4, 8, 8), np.float32)
    b = np.ones((4, 8, 8), np.float32) * np.arange(4)[:, None, None]
    d = calculate_diff(a, b)
    assert d.min() == 0.0 and d.max() == 1.0


def test_flow_epe_identity_is_zero():
    """Evaluation_bench identity self-check (kitti_dataset.py:672-685)."""
    rng = np.random.default_rng(2)
    gt = rng.normal(0, 5, (2, 16, 16, 2)).astype(np.float32)
    mask = np.ones((2, 16, 16, 1), np.float32)
    assert flow_epe(gt, gt, mask) < 1e-6
    assert flow_outlier_pct(gt, gt, mask) == 0.0
    res = evaluate_flow(gt, gt, mask, gt, mask)
    assert res["epe_all"] < 1e-6 and res["f1_all"] == 0.0


def test_flow_outlier_threshold():
    gt = np.zeros((1, 8, 8, 2), np.float32)
    pred = np.zeros_like(gt)
    pred[0, :4] = 5.0  # EPE ≈ 7.07 > 3.0 on half the pixels
    assert abs(flow_outlier_pct(gt, pred) - 50.0) < 1e-3


def test_viz_smoke(tmp_path):
    import json

    from opticalflowscivis_tpu.viz import (
        flow2rgb, flow_to_hsv, flow_to_image,
        plot_loss, visualize_large, visualize_series, visualize_series_flow,
        visualize_3d,
    )

    flow = np.random.default_rng(0).normal(0, 3, (8, 8, 2)).astype(np.float32)
    for fn in (flow2rgb, flow_to_hsv, flow_to_image):
        rgb = fn(flow)
        assert rgb.shape == (8, 8, 3)
        assert rgb.min() >= 0 and rgb.max() <= 1

    frames = np.random.default_rng(1).uniform(0, 1, (6, 16, 16)).astype(np.float32)
    flows = np.random.default_rng(2).normal(0, 2, (6, 16, 16, 2)).astype(np.float32)
    d = str(tmp_path)
    visualize_series(frames, d, "series")
    visualize_series_flow(frames, flows, d, "flowq")
    visualize_large(frames, frames, np.abs(frames - frames), frames,
                    flows, flows, d, "panel")
    visualize_3d(np.random.uniform(0, 1, (8, 8, 8)), d, "vol")

    loss_path = tmp_path / "loss.json"
    loss_path.write_text(json.dumps({"val_loss": [[1, 2, 3, 4, 5, 6, 7]] * 3}))
    plot_loss(str(loss_path), d)
    import os
    assert len(os.listdir(d)) >= 5


def test_yuv_io_roundtrip(tmp_path):
    """YUV420 write → read round-trips RGB to within chroma-subsample error."""
    from opticalflowscivis_tpu.data.yuv_io import YUVReader, YUVWriter

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (32, 48, 3), dtype=np.uint8) for _ in range(3)]
    # smooth the chroma so 4:2:0 subsampling loses little
    frames = [np.repeat(np.repeat(f[::2, ::2], 2, 0), 2, 1) for f in frames]
    path = str(tmp_path / "seq.yuv")
    with YUVWriter(path) as w:
        for f in frames:
            w.write(f)
    with YUVReader(path, 32, 48) as r:
        for f in frames:
            got, ok = r.read()
            assert ok
            assert got.shape == (32, 48, 3)
            assert np.mean(np.abs(got.astype(int) - f.astype(int))) < 6.0
        _, ok = r.read()
        assert not ok
    with YUVReader(path, 32, 48) as r:  # seek path
        got2, ok = r.read(2)
        assert ok
        assert np.mean(np.abs(got2.astype(int) - frames[2].astype(int))) < 6.0


def test_bench_hd_yuv_protocol(tmp_path):
    """bench_hd_yuv runs the HD.py loop on a synthetic yuv with a stub
    interpolator; a perfect midpoint predictor scores very high Y-PSNR."""
    from opticalflowscivis_tpu.data.yuv_io import YUVWriter
    from opticalflowscivis_tpu.evalsuite.benchmarks import bench_hd_yuv

    h, w = 64, 64
    os.makedirs(tmp_path / "HD_dataset" / "HD544p_GT", exist_ok=True)
    path = str(tmp_path / "HD_dataset" / "HD544p_GT" / "toy.yuv")
    t = np.linspace(0, 1, w, dtype=np.float32)
    with YUVWriter(path) as wr:
        for i in range(8):
            # No wrap: a clipped ramp is piecewise-linear in time, so the
            # midpoint-lerp stub below reconstructs it almost exactly.
            ramp = np.clip(t[None, :] * 0.5 + i * 0.05, 0, 1)
            frame = np.repeat(ramp[..., None], 3, -1)
            wr.write(np.repeat(frame, h, 0).reshape(h, w, 3) * 255)

    class _LerpInterp:
        def pair(self, a, b, timestep=0.5):
            m = (a + b) / 2
            return m, np.zeros(a.shape[:-1] + (2,), np.float32), m

    res = bench_hd_yuv(_LerpInterp(), str(tmp_path), multi=1, max_index=6,
                       name_list=[("HD_dataset/HD544p_GT/toy.yuv", h, w)])
    assert "HD_dataset/HD544p_GT/toy.yuv" in res["per_sequence"]
    assert res["mean"] > 20.0
