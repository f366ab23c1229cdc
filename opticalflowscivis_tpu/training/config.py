"""Training configuration — one dataclass tree replacing the reference's three
config mechanisms (SURVEY.md §5): argparse flags (Flow-2D/train.py:556-564),
code-as-config (the 140-line model_name block, train.py:589-728; module
constants IFNet.py:29-32; hard-coded lambdas RIFE.py:283-289) and UPFlow's
abstract_config dicts (UPFlow/utils/tools.py:36-109)."""

from __future__ import annotations

import dataclasses
import json
from typing import Any

from opticalflowscivis_tpu.losses.rife import RIFELossWeights


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """AdamW + warmup-cosine schedule (RIFE.py:26; train.py:47-53,162)."""

    lr_max: float = 3e-4
    lr_min: float = 3e-6
    warmup_steps: int = 2000
    weight_decay: float = 1e-3
    world_scale: float = 1.0  # reference multiplies lr by world_size/4 (train.py:162)
    grad_clip: float = 0.0  # 0 = off (reference has none)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """IFNet architecture knobs (IFNet.py:29-32,124-138; Flow-3D/model/IFNet.py:125-128)."""

    ndim: int = 2
    in_channels: int = 1
    block_channels: tuple[int, ...] = (128, 96, 64)
    scales: tuple[int, ...] = (4, 2, 1)
    teacher_channels: int = 64
    teacher_scale: int = 1  # >1 only for the single-chip 256^3 training mode
    conv0_kernel: int = 3
    arbitrary_timestep: bool = False
    refine: bool = False
    bfloat16: bool = True  # compute dtype on TPU (params stay f32)
    fast_warp_r: int = 16  # 2-D MXU warp radius on TPU (0 = exact gather warp)
    bounded_warp_rz: int = 0  # 3-D slab-warp radius (0 = exact gather warp)
    remat: bool = False  # rematerialize IFBlocks (jax.checkpoint) for 3-D memory

    @staticmethod
    def preset_2d(**kw) -> "ModelConfig":
        return ModelConfig(**kw)

    @staticmethod
    def preset_3d(**kw) -> "ModelConfig":
        kw.setdefault("bounded_warp_rz", 8)  # data velocities <= 8 px/step
        kw.setdefault("fast_warp_r", 8)
        kw.setdefault("block_channels", (128, 64, 64))
        kw.setdefault("conv0_kernel", 4)
        return ModelConfig(ndim=3, **kw)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    dataset: str = "rectangle2d"
    exp: int = 1  # interpolation factor 2**exp (train.py:163-184)
    epochs: int = 300
    batch_size: int | None = None  # None → registry per-dataset default
    seed: int = 1234  # train.py:569
    data_dir: str = "data_cache"
    results_dir: str = "Results"
    log_dir: str = "train_log"
    model_name: str = "flownet"
    eval_every: int = 1  # evaluate() runs per epoch (train.py:230)
    keep_best_only: bool = False  # Flow-3D best-val checkpointing (train.py:400-412)
    early_stop_patience: int = 0  # 0 = off; Flow-3D uses 1000
    pad_multiple: int = 32
    n_data: int | None = None  # data-parallel degree (None → all devices)
    hbm_dataset_gb: float = 6.0  # cache train/val sets in HBM when they fit
    #   (0 = always stream): one upload, then only batch *indices* cross the
    #   host↔device boundary per step — the TPU answer to DataLoader workers;
    #   essential behind the axon relay, whose per-step H2D bandwidth is low
    hbm_dataset_dtype: str = "float32"  # "bfloat16" halves cached bytes (the
    #   model computes in bf16 anyway; targets quantize to ~3 decimal digits)
    device_flip_aug: bool = False  # flip-augment per batch on device instead
    #   of 4x-ing the host arrays — with bf16 this makes 64^3 volume training
    #   fully HBM-resident (unaugmented base tuples only)
    n_space: int = 1  # spatial-shard degree (volume depth over the 'space' axis)
    spatial_shard: bool = False  # shard 3-D volumes spatially (GSPMD halos)
    debug_nans: bool = False
    compiler_options: dict | None = None  # per-run XLA overrides (e.g. 256^3
    #   training disables XLA's remat-compression, whose "compressed" layout
    #   for [*, 6]-channel flow tensors pads 21.3x — four 4 GB buffers)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    loss: RIFELossWeights = dataclasses.field(default_factory=RIFELossWeights)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "TrainConfig":
        raw: dict[str, Any] = json.loads(s)
        model_raw = dict(raw.get("model", {}))
        for k in ("block_channels", "scales"):
            if k in model_raw:
                model_raw[k] = tuple(model_raw[k])
        raw["model"] = ModelConfig(**model_raw)
        raw["optim"] = OptimConfig(**raw.get("optim", {}))
        raw["loss"] = RIFELossWeights(**raw.get("loss", {}))
        return TrainConfig(**raw)
