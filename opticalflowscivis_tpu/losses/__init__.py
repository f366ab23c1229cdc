"""Loss library — the reference's full loss menu as pure functions.

Parity map:
- charbonnier          ⇔ Flow-2D/model/RIFE.py:190-191
- epe                  ⇔ Flow-2D/model/loss.py:10-17
- sobel_loss           ⇔ Flow-2D/model/loss.py:58-81
- photometric_loss     ⇔ Flow-2D/model/RIFE.py:264-281
- smoothness_loss      ⇔ Flow-2D/model/RIFE.py:196-218 (disabled in reference)
- flow_supervision     ⇔ Flow-2D/model/RIFE.py:131-141
- rife_losses          ⇔ Flow-2D/model/RIFE.py:80-301 (full update composition)
- lap_loss / census / ssim live in ``ops`` (shared with metrics).
- UPFlow-side photometric/census/smooth variants ⇔ UPFlow/utils/loss.py, in
  ``losses.upflow`` (added with the UPFlow model).
"""

from opticalflowscivis_tpu.losses.basic import (
    charbonnier,
    epe,
    flow_supervision,
    l1_loss,
    photometric_loss,
    smoothness_loss,
    sobel_loss,
)
from opticalflowscivis_tpu.losses.rife import RIFELossWeights, rife_losses
from opticalflowscivis_tpu.losses.selfsup import (
    SPTransformConfig,
    eq_loss,
    oi_loss,
    sp_transform_pair,
)
from opticalflowscivis_tpu.losses.upflow import UPFlowLossConfig, upflow_losses
from opticalflowscivis_tpu.losses.perceptual import vgg_perceptual_loss

__all__ = [
    "charbonnier", "epe", "l1_loss", "photometric_loss", "smoothness_loss",
    "sobel_loss", "flow_supervision", "RIFELossWeights", "rife_losses",
    "UPFlowLossConfig", "upflow_losses", "vgg_perceptual_loss",
    "SPTransformConfig", "sp_transform_pair", "eq_loss", "oi_loss",
]
