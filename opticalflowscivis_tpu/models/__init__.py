"""Model zoo: RIFE-style IFNet (2-D/3-D) and UPFlow-style pyramid flow nets."""

from opticalflowscivis_tpu.models.ifnet import IFNet, IFBlock, ifnet_2d, ifnet_3d
from opticalflowscivis_tpu.models.refine import Contextnet, Unet
from opticalflowscivis_tpu.models.upflow import UPFlowConfig, UPFlowNet

__all__ = [
    "IFNet", "IFBlock", "ifnet_2d", "ifnet_3d", "Contextnet", "Unet",
    "UPFlowConfig", "UPFlowNet",
]
