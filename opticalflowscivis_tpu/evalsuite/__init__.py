"""Evaluation suite — the reference's metric surface (error.py, KITTI protocol)."""

from opticalflowscivis_tpu.evalsuite.metrics import (
    calculate_diff,
    calculate_metrics,
    calculate_psnr,
    calculate_ssim,
    linear_interpolation_baseline,
)
from opticalflowscivis_tpu.evalsuite.flow_eval import flow_epe, flow_outlier_pct, evaluate_flow
from opticalflowscivis_tpu.evalsuite.selection import select_timesteps, selection_curve

__all__ = [
    "calculate_psnr", "calculate_ssim", "calculate_metrics", "calculate_diff",
    "linear_interpolation_baseline", "flow_epe", "flow_outlier_pct", "evaluate_flow",
    "select_timesteps", "selection_curve",
]
