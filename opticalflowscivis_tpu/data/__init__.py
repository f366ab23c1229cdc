"""Datasets: synthetic generators, registry, host pipeline (reference L0+L1)."""

from opticalflowscivis_tpu.data.pipeline import (
    TupleDataset,
    flip_augment,
    group_tuples,
    minmax_normalize,
    pad_to_multiple,
    temporal_resample,
)
from opticalflowscivis_tpu.data.registry import (
    REGISTRY,
    DatasetSpec,
    get_spec,
    load_data,
    load_raw_series,
    select_split,
)
from opticalflowscivis_tpu.data.device_synthetic import (
    box_density_device,
    pan_pairs_device,
    pan_scene_host,
    tuple_positions,
)
from opticalflowscivis_tpu.data.synthetic import rectangle_2d, rectangle_3d, rectangles_2d

__all__ = [
    "TupleDataset", "flip_augment", "group_tuples", "minmax_normalize",
    "pad_to_multiple", "temporal_resample",
    "REGISTRY", "DatasetSpec", "get_spec", "load_data", "load_raw_series",
    "select_split",
    "rectangle_2d", "rectangle_3d", "rectangles_2d",
    "box_density_device", "pan_pairs_device", "pan_scene_host",
    "tuple_positions",
]
