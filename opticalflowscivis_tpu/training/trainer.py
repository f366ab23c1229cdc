"""RIFE training runtime — one jitted train step over a device mesh.

Replaces the reference's train loop (Flow-2D/train.py:70-232, Flow-3D/train.py)
and Model.update (RIFE.py:80-317):

- functional ``TrainState`` (params + AdamW state + step) instead of the
  ``Model`` wrapper class;
- a single jitted ``train_step`` containing forward, all losses, grads and the
  optimizer update — batch sharded over the mesh ``data`` axis, params
  replicated, so the gradient allreduce is XLA's psum over ICI (the DDP/NCCL
  equivalent, train.py:567);
- AdamW(weight_decay=1e-3) with the warmup-cosine schedule (RIFE.py:26,
  train.py:47-53);
- per-epoch ``evaluate`` appending the reference's 7-component loss tuple to
  ``Results/<ds>/<factor>x/<model>/loss.json`` (train.py:516-544) and writing a
  checkpoint (RIFE.py:61-64) — ours also stores optimizer state (the reference
  never does, SURVEY.md §5), via Orbax;
- Flow-3D's best-val-only checkpointing + early stopping as config options
  (Flow-3D/train.py:400-412).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state
from jax.sharding import NamedSharding, PartitionSpec as P

from opticalflowscivis_tpu.data import TupleDataset, get_spec, load_data, pad_to_multiple
from opticalflowscivis_tpu.losses.rife import rife_losses
from opticalflowscivis_tpu.models.ifnet import IFNet
from opticalflowscivis_tpu.parallel import make_mesh
from opticalflowscivis_tpu.training.config import TrainConfig
from opticalflowscivis_tpu.training.schedule import warmup_cosine


class TrainState(train_state.TrainState):
    pass


def build_model(cfg: TrainConfig) -> IFNet:
    m = cfg.model
    return IFNet(
        ndim=m.ndim,
        in_channels=m.in_channels,
        block_channels=tuple(m.block_channels),
        scales=tuple(m.scales),
        teacher_channels=m.teacher_channels,
        teacher_scale=m.teacher_scale,
        arbitrary_timestep=m.arbitrary_timestep,
        refine=m.refine,
        conv0_kernel=m.conv0_kernel,
        fast_warp_r=m.fast_warp_r,
        bounded_warp_rz=m.bounded_warp_rz,
        remat=m.remat,
        dtype=jnp.bfloat16 if m.bfloat16 else None,
    )


def split_batch(batch: jax.Array, ndim: int, has_flow: bool):
    """``[B, slots, *S, C]`` → (img0, img1, gt, gt_flow|None).

    Slot order is (img0, img1, gt...) per ``data.group_tuples``; channel 0 is
    the scalar field, channels 1..ndim GT flow (RIFE.py:84-104 equivalent).
    """
    img0 = batch[:, 0, ..., :1]
    img1 = batch[:, 1, ..., :1]
    gt = batch[:, 2, ..., :1]
    gt_flow = batch[:, 2, ..., 1 : 1 + ndim] if has_flow else None
    return img0, img1, gt, gt_flow


def make_train_step(model: IFNet, cfg: TrainConfig, has_flow: bool,
                    gt_flow_scale: float = 1.0):
    ndim = cfg.model.ndim

    def loss_fn(params, batch):
        img0, img1, gt, gt_flow = split_batch(batch, ndim, has_flow)
        if gt_flow is not None and gt_flow_scale != 1.0:
            gt_flow = gt_flow * gt_flow_scale  # stored units → px/frame
        outputs = model.apply(params, img0, img1, gt)
        return rife_losses(
            outputs, img0, img1, gt, params, cfg.loss, ndim, gt_flow=gt_flow,
            fast_warp_r=cfg.model.fast_warp_r,
        )

    def train_step(state: TrainState, batch: jax.Array):
        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        state = state.apply_gradients(grads=grads)
        return state, parts

    def eval_step(state: TrainState, batch: jax.Array):
        img0, img1, gt, gt_flow = split_batch(batch, ndim, has_flow)
        if gt_flow is not None and gt_flow_scale != 1.0:
            gt_flow = gt_flow * gt_flow_scale
        outputs = model.apply(state.params, img0, img1, gt)
        _, parts = rife_losses(
            outputs, img0, img1, gt, state.params, cfg.loss, ndim,
            gt_flow=gt_flow, fast_warp_r=cfg.model.fast_warp_r,
        )
        # merged prediction + teacher + flow for metric/visual consumers
        extras = {
            "pred": outputs["merged"][-1],
            "pred_tea": outputs["merged_teacher"],
            "flow": outputs["flow_list"][-1],
            "mask": outputs["mask_list"][-1],
        }
        return parts, extras

    return train_step, eval_step


class Trainer:
    """End-to-end RIFE trainer (2-D and 3-D via config)."""

    def __init__(self, cfg: TrainConfig, mesh=None):
        self.cfg = cfg
        if cfg.debug_nans:
            # the jax-native detect_anomaly (⇔ Flow-3D/train.py:34-36 comments)
            jax.config.update("jax_debug_nans", True)
        self.spec = get_spec(cfg.dataset)
        if cfg.model.ndim != self.spec.ndim:
            raise ValueError(
                f"model ndim {cfg.model.ndim} != dataset ndim {self.spec.ndim}"
            )
        self.mesh = mesh if mesh is not None else make_mesh(cfg.n_data, cfg.n_space)
        self.model = build_model(cfg)
        self.has_flow = self.spec.has_flow and cfg.loss.flow > 0
        self._train_step_fn, self._eval_step_fn = make_train_step(
            self.model, cfg, self.has_flow,
            gt_flow_scale=self.spec.gt_flow_stride,
        )
        if cfg.spatial_shard:
            # volumes: depth axis over 'space' (GSPMD inserts conv halos)
            from opticalflowscivis_tpu.parallel.spatial import volume_batch_sharding

            self.batch_sharding = volume_batch_sharding(self.mesh, n_leading=2)
        else:
            self.batch_sharding = NamedSharding(self.mesh, P("data"))
        self.repl = NamedSharding(self.mesh, P())
        self.state: TrainState | None = None
        self.steps_per_epoch = 1  # set by fit()
        self._jit_train = None
        self._jit_eval = None
        self._jit_train_idx = None

    # -- state ------------------------------------------------------------
    def init_state(self, sample_batch: np.ndarray, total_steps: int) -> TrainState:
        cfg = self.cfg
        img0, img1, gt, _ = split_batch(
            jnp.asarray(sample_batch[:1]), cfg.model.ndim, self.has_flow
        )
        params = jax.jit(self.model.init)(jax.random.PRNGKey(cfg.seed), img0, img1, gt)
        sched = warmup_cosine(
            cfg.optim.lr_max,
            cfg.optim.lr_min,
            cfg.optim.warmup_steps,
            total_steps,
            cfg.optim.world_scale,
        )
        tx = optax.adamw(sched, weight_decay=cfg.optim.weight_decay)
        if cfg.optim.grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(cfg.optim.grad_clip), tx)
        state = TrainState.create(apply_fn=self.model.apply, params=params, tx=tx)
        self.state = jax.device_put(state, self.repl)
        copts = dict(cfg.compiler_options or {}) or None
        self._jit_train = jax.jit(
            self._train_step_fn,
            in_shardings=(self.repl, self.batch_sharding),
            out_shardings=(self.repl, self.repl),
            donate_argnums=(0,),
            compiler_options=copts,
        )
        self._jit_eval = jax.jit(
            self._eval_step_fn,
            in_shardings=(self.repl, self.batch_sharding),
            compiler_options=copts,
        )

        def train_step_idx(state, data, idx):
            # HBM-resident path: gather the minibatch on device; constrain it
            # to the batch sharding so data-parallel compute is unchanged.
            # Virtual indices >= len(data) select on-device flip augmentation.
            n = data.shape[0]
            batch = jnp.take(data, idx % n, axis=0)
            if cfg.device_flip_aug and self.spec.flip_aug:
                from opticalflowscivis_tpu.data.pipeline import device_flip_augment

                batch = device_flip_augment(batch, idx // n, cfg.model.ndim)
            batch = jax.lax.with_sharding_constraint(
                batch.astype(jnp.float32), self.batch_sharding
            )
            return self._train_step_fn(state, batch)

        self._jit_train_idx = jax.jit(
            train_step_idx,
            in_shardings=(self.repl, self.repl, self.repl),
            out_shardings=(self.repl, self.repl),
            donate_argnums=(0,),
            compiler_options=copts,
        )
        return self.state

    # -- data -------------------------------------------------------------
    def load_datasets(self):
        cfg = self.cfg
        train, val = load_data(
            cfg.dataset, cfg.exp, "train", cfg.data_dir,
            # on-device augmentation → keep the host arrays unaugmented
            host_flip_aug=False if cfg.device_flip_aug else None,
        )
        return self._pad_spatial(train), self._pad_spatial(val)

    def _pad_spatial(self, arr: np.ndarray) -> np.ndarray:
        out, _ = pad_to_multiple(arr, self.cfg.pad_multiple, leading_axes=2)
        return out

    # -- loops ------------------------------------------------------------
    def fit(self, train_tuples: np.ndarray, val_tuples: np.ndarray,
            epochs: int | None = None, log_every: int = 50,
            on_epoch_end=None, resume: bool = False):
        """Train.  ``resume=True`` restores the checkpoint after building the
        optimizer with the *actual* step count (aug-extended, mesh-rounded) —
        resuming from a CLI-side init would mis-size the LR schedule."""
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epochs
        batch = cfg.batch_size or self.spec.batch_size
        batch = min(batch, train_tuples.shape[0])
        # keep batch divisible by mesh data axis
        n_data = self.mesh.shape["data"]
        batch = max(n_data, (batch // n_data) * n_data)
        # HBM-resident dataset: one bulk upload, then only indices per step.
        # device_flip_aug keeps only the unaugmented base tuples in HBM and
        # extends the index space 4x (bit-equal to host flip_augment order).
        cache_dtype = (
            jnp.bfloat16 if cfg.hbm_dataset_dtype == "bfloat16" else jnp.float32
        )
        cache_bytes = train_tuples.nbytes * (
            0.5 if cache_dtype == jnp.bfloat16 else 1.0
        )
        use_hbm = bool(cfg.hbm_dataset_gb and cache_bytes <= cfg.hbm_dataset_gb * 1e9)
        aug = 1
        if cfg.device_flip_aug and self.spec.flip_aug:
            if use_hbm:
                aug = 4
            else:  # streaming fallback: materialize the host augmentation
                from opticalflowscivis_tpu.data.pipeline import flip_augment

                # flip_augment expects [T, *S, C] — flatten the tuple slots
                # first (flipping the 5-D tuple array directly would mirror
                # the slots axis and miss the flow-sign negation)
                flat = train_tuples.reshape((-1,) + train_tuples.shape[2:])
                train_tuples = flip_augment(flat).reshape(
                    (-1,) + train_tuples.shape[1:]
                )

        ds = TupleDataset(train_tuples, batch, seed=cfg.seed)
        self.steps_per_epoch = (train_tuples.shape[0] * aug) // batch
        total_steps = max(self.steps_per_epoch * epochs, 1)
        if self.state is None:
            self.init_state(train_tuples[:batch], total_steps)
            if resume:
                self.load_checkpoint()

        if val_tuples.shape[0] == 0:
            # tiny series can produce an empty val split — fall back to a
            # train batch so per-epoch eval/checkpoint logic still runs
            val_tuples = train_tuples[:batch]
        data_dev = None
        val_dev = val_tuples
        if use_hbm:
            data_dev = jax.device_put(
                jnp.asarray(train_tuples, cache_dtype), self.repl
            )
            if (
                val_tuples.nbytes <= cfg.hbm_dataset_gb * 1e9 / 4
                and val_tuples.shape[0] >= self.mesh.shape["data"]
            ):
                val_dev = jax.device_put(jnp.asarray(val_tuples), self.repl)

        def epoch_batches():
            if use_hbm:
                for idx in ds.epoch_indices(
                    n_virtual=train_tuples.shape[0] * aug
                ):
                    yield self._jit_train_idx, (data_dev, jnp.asarray(idx))
            else:
                for batch_dev in ds.epoch_device(self.batch_sharding):
                    yield self._jit_train, (batch_dev,)

        history = []
        best_val = np.inf
        patience = 0
        t0 = time.time()
        step = 0
        for epoch in range(epochs):
            for step_fn, args in epoch_batches():
                self.state, parts = step_fn(self.state, *args)
                step += 1
                if log_every and step % log_every == 0:
                    g = float(parts["loss_G"])
                    rate = step / (time.time() - t0)
                    print(f"epoch {epoch} step {step} loss_G {g:.5f} "
                          f"({rate:.2f} it/s)", flush=True)
            val_parts = self.evaluate(val_dev, batch)
            history.append(val_parts)
            self._append_loss_json(val_parts)
            val_g = val_parts["loss_G"]
            improved = val_g < best_val
            if improved:
                best_val = val_g
                patience = 0
            else:
                patience += 1
            if not cfg.keep_best_only or improved:
                self.save_checkpoint()
            if cfg.early_stop_patience and patience >= cfg.early_stop_patience:
                print(f"early stopping at epoch {epoch}", flush=True)
                break
            if on_epoch_end is not None:
                on_epoch_end(epoch, val_parts)
        return history

    def fit_stream(self, sample_fn, val_tuples: np.ndarray,
                   steps_per_epoch: int, epochs: int | None = None,
                   log_every: int = 50, resume: bool = False):
        """Train from a host-side batch sampler instead of a fixed tuple array.

        ``sample_fn() -> [B, slots, *S, C]`` is called once per step — the
        Vimeo90K path, where every batch is freshly random-cropped/augmented
        (Flow-2D/train.py:78-100 w/ VimeoDataset + DataLoader), so the
        HBM-resident dataset path does not apply.  Per-epoch eval, loss.json
        append, checkpointing and early stopping match ``fit``.
        """
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epochs
        self.steps_per_epoch = steps_per_epoch
        total_steps = max(steps_per_epoch * epochs, 1)
        first = sample_fn()
        if self.state is None:
            self.init_state(first, total_steps)
            if resume:
                self.load_checkpoint()
        if val_tuples.shape[0] == 0:
            val_tuples = first
        history = []
        best_val = np.inf
        patience = 0
        t0 = time.time()
        step = 0
        for epoch in range(epochs):
            for _ in range(steps_per_epoch):
                batch = jax.device_put(
                    jnp.asarray(sample_fn(), jnp.float32), self.batch_sharding
                )
                self.state, parts = self._jit_train(self.state, batch)
                step += 1
                if log_every and step % log_every == 0:
                    g = float(parts["loss_G"])
                    rate = step / (time.time() - t0)
                    print(f"epoch {epoch} step {step} loss_G {g:.5f} "
                          f"({rate:.2f} it/s)", flush=True)
            val_parts = self.evaluate(val_tuples, first.shape[0])
            history.append(val_parts)
            self._append_loss_json(val_parts)
            val_g = val_parts["loss_G"]
            improved = val_g < best_val
            if improved:
                best_val = val_g
                patience = 0
            else:
                patience += 1
            if not cfg.keep_best_only or improved:
                self.save_checkpoint()
            if cfg.early_stop_patience and patience >= cfg.early_stop_patience:
                print(f"early stopping at epoch {epoch}", flush=True)
                break
        return history

    def fit_device_gen(self, gen_fn, pos_sampler, val_positions: np.ndarray,
                       steps_per_epoch: int, epochs: int | None = None,
                       log_every: int = 50, resume: bool = False):
        """Train from device-GENERATED batches: positions in, volumes stay in HBM.

        The host↔device relay bounds how much data an HBM-resident dataset can
        hold (the r3 192³ run fit 8 tuples and memorized them); here the
        samples are synthesized on device inside the jitted step, so each
        fresh tuple costs bytes of transfer, not tens of MB:

        - ``gen_fn(pos [B, slots, nd] int32) -> [B, slots, *S, C]`` — traced
          into the train step (e.g. ``device_synthetic.box_density_device``);
        - ``pos_sampler(epoch) -> [steps_per_epoch * B, slots, nd]`` — host
          ints, a fresh trajectory every epoch;
        - ``val_positions [Nv, slots, nd]`` — fixed held-out set, generated
          once and kept device-resident for per-epoch eval.

        Per-epoch eval, loss.json, checkpointing and early stopping match
        ``fit``.  Spatial dims must already satisfy ``cfg.pad_multiple``.
        """
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epochs
        self.steps_per_epoch = steps_per_epoch
        total_steps = max(steps_per_epoch * epochs, 1)
        # Resume offset: a resumed run must NOT replay pos_sampler(0..k) seeds
        # (it would re-train on the exact scenes already seen) nor restart the
        # step counter; completed epochs are recovered from loss.json, which
        # fit appends once per epoch (ADVICE r3, medium).  The offset only
        # applies when the checkpoint actually RESTORES — a failed restore
        # with a non-zero offset would silently train fresh params while
        # appearing to continue the run (ADVICE r4, medium).
        guess = self._completed_epochs() if resume else 0
        first_pos = pos_sampler(guess)
        n_pos = jax.tree.leaves(first_pos)[0].shape[0]
        if n_pos % steps_per_epoch:
            raise ValueError(
                f"{n_pos} positions do not divide into {steps_per_epoch} steps"
            )
        batch = n_pos // steps_per_epoch
        n_data = self.mesh.shape["data"]
        if batch % n_data:
            raise ValueError(
                f"device-gen batch {batch} must be a multiple of the data "
                f"mesh axis ({n_data} devices)"
            )
        gen_sharded = jax.jit(
            lambda p: jax.lax.with_sharding_constraint(
                gen_fn(p), self.batch_sharding
            )
        )
        if self.state is None:
            # shape/dtype only — materializing a generated batch via
            # np.asarray would pull ~85 MB (192^3) D2H over the ~2 MB/s relay
            # for values init never reads (ADVICE r3)
            out = jax.eval_shape(gen_fn, jnp.asarray(first_pos[:batch]))
            for d in out.shape[2:-1]:
                if d % cfg.pad_multiple:
                    raise ValueError(
                        f"generated spatial dim {d} violates "
                        f"pad_multiple={cfg.pad_multiple}"
                    )
            self.init_state(np.zeros(out.shape, np.float32), total_steps)
            if resume:
                restored = self.load_checkpoint()
        else:
            restored = resume  # a live in-memory state continues its run
        start_epoch = guess if (resume and restored) else 0
        if resume and not restored:
            print(
                "resume requested but no checkpoint restored; starting from "
                "epoch 0", flush=True,
            )

        def step_pos(state, pos):
            b = jax.lax.with_sharding_constraint(
                gen_fn(pos).astype(jnp.float32), self.batch_sharding
            )
            return self._train_step_fn(state, b)

        jit_step = jax.jit(
            step_pos,
            in_shardings=(self.repl, self.repl),
            out_shardings=(self.repl, self.repl),
            donate_argnums=(0,),
            compiler_options=dict(cfg.compiler_options or {}) or None,
        )
        val_dev = gen_sharded(jnp.asarray(val_positions))
        history = []
        best_val = np.inf
        patience = 0
        t0 = time.time()
        step = start_epoch * steps_per_epoch
        for epoch in range(start_epoch, start_epoch + epochs):
            pos = first_pos if epoch == guess else pos_sampler(epoch)
            for s in range(steps_per_epoch):
                p = jnp.asarray(pos[s * batch : (s + 1) * batch])
                self.state, parts = jit_step(self.state, p)
                step += 1
                if log_every and step % log_every == 0:
                    g = float(parts["loss_G"])
                    rate = (step - start_epoch * steps_per_epoch) / (time.time() - t0)
                    print(f"epoch {epoch} step {step} loss_G {g:.5f} "
                          f"({rate:.2f} it/s)", flush=True)
            val_parts = self.evaluate(val_dev, batch)
            history.append(val_parts)
            self._append_loss_json(val_parts)
            val_g = val_parts["loss_G"]
            improved = val_g < best_val
            if improved:
                best_val = val_g
                patience = 0
            else:
                patience += 1
            if not cfg.keep_best_only or improved:
                self.save_checkpoint()
            if cfg.early_stop_patience and patience >= cfg.early_stop_patience:
                print(f"early stopping at epoch {epoch}", flush=True)
                break
        return history

    def evaluate(self, val_tuples: np.ndarray, batch_size: int | None = None):
        n_val = val_tuples.shape[0]
        batch = min(batch_size or 16, n_val)
        n_data = self.mesh.shape["data"]
        batch = max(n_data, (batch // n_data) * n_data)
        if n_val < batch:  # tiny val set: repeat to fill one sharded batch
            reps = -(-batch // n_val)
            val_tuples = np.tile(val_tuples, (reps,) + (1,) * (val_tuples.ndim - 1))
            n_val = val_tuples.shape[0]
        sums: dict[str, float] = {}
        total_w = 0.0
        for i in range(0, n_val, batch):
            chunk = val_tuples[i : i + batch]
            r = chunk.shape[0]  # real samples in this chunk
            if r < batch:
                # tail chunk: cycle its own samples to fill the static batch
                # shape (keeps one compiled eval step; a few tail samples get
                # up to one extra repetition in this chunk's mean, but every
                # val sample is covered — previously the tail was dropped)
                chunk = np.resize(np.asarray(chunk), (batch,) + chunk.shape[1:])
            b = jax.device_put(jnp.asarray(chunk), self.batch_sharding)
            parts, _ = self._jit_eval(self.state, b)
            for k, v in parts.items():
                sums[k] = sums.get(k, 0.0) + float(v) * r
            total_w += r
        return {k: v / max(total_w, 1.0) for k, v in sums.items()}

    def predict(self, batch_np: np.ndarray):
        """Eval-mode forward returning (loss parts, extras dict)."""
        b = jax.device_put(jnp.asarray(batch_np), self.batch_sharding)
        return self._jit_eval(self.state, b)

    # -- persistence --------------------------------------------------------
    @property
    def results_dir(self) -> str:
        cfg = self.cfg
        factor = 2**cfg.exp
        return os.path.join(cfg.results_dir, cfg.dataset, f"{factor}x", cfg.model_name)

    def _completed_epochs(self) -> int:
        """Epochs already recorded in this run's loss.json (one append per
        epoch) — the resume offset for seeds/steps in ``fit_device_gen``."""
        path = os.path.join(self.results_dir, "loss.json")
        if not os.path.exists(path):
            return 0
        with open(path) as f:
            return len(json.load(f).get("val_loss", []))

    def _append_loss_json(self, parts: dict[str, float]):
        """loss.json parity: append the 7-tuple (train.py:516-544)."""
        os.makedirs(self.results_dir, exist_ok=True)
        path = os.path.join(self.results_dir, "loss.json")
        tup = [
            parts["loss_G"], parts["loss_l1"], parts["loss_tea"],
            parts["loss_distill"], parts["l1_reg"], parts["loss_photo"],
            parts["loss_flow"],
        ]
        data = {"val_loss": []}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
        data["val_loss"].append(tup)
        with open(path, "w+") as f:
            json.dump(data, f, indent=4)

    def checkpoint_path(self) -> str:
        # scoped by dataset — the reference disambiguates runs by encoding the
        # experiment into model_name (train.py:589-728); with a shared default
        # model_name two datasets would silently overwrite each other
        return os.path.abspath(
            os.path.join(self.cfg.log_dir, self.cfg.dataset,
                         self.cfg.model_name + ".ckpt")
        )

    def save_checkpoint(self):
        if jax.process_index() != 0:  # rank-0 save (RIFE.py:61-64)
            return
        from opticalflowscivis_tpu.training.checkpoint import save_state

        save_state(self.checkpoint_path(), self.state)

    def load_checkpoint(self) -> bool:
        """Restore if a checkpoint exists; fall back to scratch (train.py:117-122)."""
        from opticalflowscivis_tpu.training.checkpoint import restore_state

        try:
            self.state = restore_state(self.checkpoint_path(), self.state)
            return True
        except Exception as e:  # noqa: BLE001 — parity with reference fallback
            print(f"No usable checkpoint ({e}); training from scratch.", flush=True)
            return False
