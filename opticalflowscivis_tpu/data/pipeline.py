"""Host-side data pipeline: normalization, resampling, augmentation, grouping.

Re-implements the in-process preparation of ``Flow-2D/load_datasets.py`` /
``Flow-3D/load_datasets.py`` on channels-last numpy arrays ``[T, *S, C]`` where
channel 0 is the scalar field and channels 1..ndim are optional GT flow.

Parity map:
- ``minmax_normalize``       ⇔ load_datasets.py:82-141 (per-dataset min-max).
- ``temporal_resample``      ⇔ load_datasets.py:227-240 — every 3rd frame, three
  phase shifts concatenated (applies to all datasets: the reference's guard
  ``dataset != "rectangle2d" or dataset != "lbs2d"`` is a tautology).
- ``flip_augment``           ⇔ load_datasets.py:246-252 — append copies flipped
  along each spatial axis.  Deviation: we negate the flow channel of the flipped
  axis so GT flow stays correct on the mirrored copies (the reference flips the
  stacked channels verbatim, corrupting GT flow signs for its supervised runs).
- ``group_tuples``           ⇔ load_datasets.py:266-364 — exp=1 consecutive
  (img0, img1, gt)=(t, t+2, t+1); exp=2 5-tuples (t, t+4, t+1..t+3); exp=3
  9-tuples (t, t+8, t+1..t+7).  Output ``[N, slots, *S, C]`` with slot order
  (img0, img1, gts...) exactly as the reference concatenates them.
- ``pad_to_multiple``        — replaces the reference's per-step "correct
  shapes" cropping (IFNet.py:162-188) with one static edge-pad to /32.
"""

from __future__ import annotations

import numpy as np


def minmax_normalize(data: np.ndarray) -> np.ndarray:
    """Min-max normalize the scalar channel to [0, 1]; flow channels untouched."""
    data = np.asarray(data, np.float32)
    if not np.isfinite(data).all():  # NaN sanitization (Flow-3D/load_datasets.py:85-89)
        data = np.nan_to_num(data)
    data = data.copy()
    field = data[..., 0]
    lo, hi = field.min(), field.max()
    if hi > lo:
        np.subtract(field, lo, out=field)
        np.divide(field, hi - lo, out=field)
    return data


def temporal_resample(data: np.ndarray, stride: int = 3) -> np.ndarray:
    """Concatenate the ``stride`` phase-shifted every-N subsequences."""
    return np.concatenate([data[s::stride] for s in range(stride)], axis=0)


def flip_augment(
    data: np.ndarray, flow_channels: bool = True, n_axes: int | None = None
) -> np.ndarray:
    """Append copies mirrored along spatial axes (axes 1.. of [T,*S,C]).

    ``n_axes`` limits how many leading spatial axes are mirrored — the
    reference flips exactly TWO axes in both 2-D and 3-D (load_datasets.py:
    246-252; Flow-3D/load_datasets.py:147-152), so 3-D volumes get x4, not x8.
    With ``flow_channels`` the flow component along the flipped axis is negated
    (flow channel i corresponds to spatial axis i, row-major).
    """
    ndim = data.ndim - 2
    if n_axes is None:
        n_axes = min(ndim, 2)
    has_flow = flow_channels and data.shape[-1] == 1 + ndim
    out = data
    for axis in range(n_axes):
        flipped = np.flip(out, axis=1 + axis).copy()
        if has_flow:
            flipped[..., 1 + axis] *= -1.0
        out = np.concatenate([out, flipped], axis=0)
    return out


def device_flip_augment(batch, code, ndim: int):
    """On-device twin of ``flip_augment`` for the HBM-resident path.

    ``batch [B, slots, *S, C]``, ``code [B]`` ∈ {0..3} indexes the host
    augmentation order [base, flip_ax0, flip_ax1, flip_both]: bit0 mirrors
    spatial axis 0 (negating flow channel 1), bit1 mirrors spatial axis 1
    (negating flow channel 2).  Caching only the unaugmented tuples in HBM and
    flipping per sample inside the jitted step cuts the cached bytes 4x —
    what makes 64^3 volume training HBM-resident.
    """
    import jax
    import jax.numpy as jnp

    fa = (code & 1).astype(bool)
    fb = (code >> 1).astype(bool)
    channels = batch.shape[-1]
    has_flow = channels == 1 + ndim

    def one(x, a, b):
        y = jnp.where(a, jnp.flip(x, axis=1), x)  # spatial axis 0 = dim 1
        y = jnp.where(b, jnp.flip(y, axis=2), y)
        if has_flow:
            sign = jnp.ones((channels,), y.dtype)
            sign = sign.at[1].set(jnp.where(a, -1.0, 1.0).astype(y.dtype))
            sign = sign.at[2].set(jnp.where(b, -1.0, 1.0).astype(y.dtype))
            y = y * sign
        return y

    return jax.vmap(one)(batch, fa, fb)


def group_tuples(data: np.ndarray, exp: int = 1) -> np.ndarray:
    """Group frames into training tuples ``[N, slots, *S, C]``.

    exp=1 → slots (img0, img1, gt) from frame triples (t, t+2, t+1);
    exp=2 → (img0, img1, gt1, gt2, gt3) from 5-frame runs;
    exp=3 → (img0, img1, gt1..gt7) from 9-frame runs.
    """
    run = 2**exp + 1
    n = (data.shape[0] // run) * run
    if n == 0:
        raise ValueError(f"need at least {run} frames, got {data.shape[0]}")
    blocks = data[:n].reshape(data.shape[0] // run, run, *data.shape[1:])
    order = [0, run - 1] + list(range(1, run - 1))
    return blocks[:, order]


def pad_to_multiple(
    data: np.ndarray, multiple: int = 32, leading_axes: int = 1
) -> tuple[np.ndarray, tuple[tuple[int, int], ...]]:
    """Edge-pad the spatial axes up to a multiple; returns (padded, pads).

    ``leading_axes`` counts non-spatial leading axes (1 for ``[T, *S, C]``,
    2 for grouped tuples ``[N, slots, *S, C]``); the last axis is channels.
    """
    nd = data.ndim
    pads = [(0, 0)] * nd
    for axis in range(leading_axes, nd - 1):
        s = data.shape[axis]
        target = ((s + multiple - 1) // multiple) * multiple
        pads[axis] = (0, target - s)
    padded = np.pad(data, pads, mode="edge")
    return padded, tuple(pads)


class TupleDataset:
    """Shuffled minibatch iterator over grouped tuples (host numpy → device).

    The reference relies on torch DataLoader with pinned memory and 8 workers
    (Flow-2D/train.py:90); here batches are sliced from one contiguous array —
    the whole dataset lives in RAM exactly as in the reference
    (load_datasets.py:203-205) — and handed to jax for the H2D copy.
    """

    def __init__(self, tuples: np.ndarray, batch_size: int, seed: int = 0,
                 drop_last: bool = True):
        self.tuples = tuples
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = self.tuples.shape[0]
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, shuffle: bool = True):
        idx = np.arange(self.tuples.shape[0])
        if shuffle:
            self.rng.shuffle(idx)
        for i in range(len(self)):
            sel = idx[i * self.batch_size : (i + 1) * self.batch_size]
            yield self.tuples[sel]

    def epoch_indices(self, shuffle: bool = True, n_virtual: int | None = None):
        """Index batches (same shuffle stream as ``epoch``) — for the
        HBM-resident dataset path, where only indices cross the host↔device
        boundary each step.  ``n_virtual`` extends the index space beyond the
        stored tuples (e.g. 4x for on-device flip augmentation)."""
        n = n_virtual if n_virtual is not None else self.tuples.shape[0]
        idx = np.arange(n)
        if shuffle:
            self.rng.shuffle(idx)
        for i in range(n // self.batch_size):
            yield idx[i * self.batch_size : (i + 1) * self.batch_size]

    def epoch_device(self, sharding, shuffle: bool = True):
        """One-step-lookahead device prefetch (⇔ tools.data_prefetcher's
        CUDA-stream prefetch, UPFlow/utils/tools.py:177-249): the next batch's
        H2D copy is issued while the current step computes — jax transfers are
        async, so device_put alone provides the overlap."""
        import jax

        nxt = None
        for batch in self.epoch(shuffle):
            cur, nxt = nxt, jax.device_put(batch, sharding)
            if cur is not None:
                yield cur
        if nxt is not None:
            yield nxt


class PrefetchSampler:
    """Background-thread batch prefetch over any ``.sample(batch)`` dataset.

    ⇔ the reference's ``tools.data_prefetcher`` / ``DataProvider`` (UPFlow/
    utils/tools.py:177-296): its 8 DataLoader workers + CUDA-stream prefetch
    hide per-sample cv2 decode + crop time behind the train step.  Here
    ``workers`` threads each loop ``dataset.sample(batch_size)`` into a bounded
    queue (cv2/numpy release the GIL for the heavy parts), so the train loop's
    ``sample`` is a queue pop.  Thread-safety note: ``KittiPairDataset.sample``
    uses a per-dataset numpy Generator — with workers > 1 pass ``make_dataset``
    so each worker owns an independently-seeded dataset instance.
    """

    def __init__(self, dataset=None, batch_size: int = 8, depth: int = 4,
                 workers: int = 2, make_dataset=None):
        import queue
        import threading

        self.batch_size = batch_size
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._threads = []
        for w in range(workers):
            ds = make_dataset(w) if make_dataset is not None else dataset
            if workers > 1 and make_dataset is None:
                raise ValueError("workers > 1 needs make_dataset (per-worker RNG)")
            t = threading.Thread(target=self._loop, args=(ds,), daemon=True)
            t.start()
            self._threads.append(t)

    def _loop(self, ds):
        while not self._stop.is_set():
            batch = ds.sample(self.batch_size)
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.2)
                    break
                except Exception:  # queue.Full
                    continue

    def sample(self, batch_size: int):
        if batch_size > self.batch_size:
            raise ValueError(
                f"prefetch built for batch {self.batch_size}, asked {batch_size}")
        batch = self._q.get()
        if batch_size == self.batch_size:
            return batch
        return {k: v[:batch_size] for k, v in batch.items()}

    def close(self):
        self._stop.set()
        # drain so producers blocked on put() can observe the stop flag
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
