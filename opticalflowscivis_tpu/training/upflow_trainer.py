"""UPFlow training runtime — parity with UPFlow/scripts/simple_train.py.

- Adam(lr=1e-4, weight_decay=1e-4) with exponential decay gamma=1 (i.e. constant;
  simple_train.py:147-151,189-190); batch 8 (:141).
- ``Loss_manager``'s sum of photo/smooth/census/msd losses (:74-105) is the
  ``upflow_losses`` composition.
- Frame pairs: consecutive SciVis frames (im1=frame t, im2=frame t+1) stacked to
  the network channel count — the reference tiles grayscale to 3-channel RGB
  (upflow.py:376-395 scivis_data_dict).
- Per-epoch checkpoint + loss.json append (:229-268); the reference wraps every
  batch in a blanket try/except "Unexpected crash, continuing" (:206,309-310) —
  we do not reproduce that (a jitted step either compiles or raises once).

Same mesh/data-parallel structure as the RIFE Trainer: batch sharded over the
``data`` axis, params replicated.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state
from jax.sharding import NamedSharding, PartitionSpec as P

from opticalflowscivis_tpu.data import TupleDataset, pad_to_multiple
from opticalflowscivis_tpu.losses.upflow import UPFlowLossConfig, upflow_losses
from opticalflowscivis_tpu.models.upflow import UPFlowConfig, UPFlowNet
from opticalflowscivis_tpu.parallel import make_mesh


@dataclasses.dataclass(frozen=True)
class UPFlowTrainConfig:
    batch_size: int = 8
    n_epoch: int = 1000
    lr: float = 1e-4
    weight_decay: float = 1e-4
    lr_gamma: float = 1.0  # per-epoch exponential decay (simple_train.py:190 γ=1)
    grad_clip: float = 0.0  # global-norm clip (0 = off, the reference's
    #   behavior).  Measured round 4: lr 1e-3 with census=1/smooth=0.1
    #   explodes the flow to ~250 px within one epoch on pan8
    #   (Results/pan_long_lr1e3_abort) — clipping is the knob that makes
    #   hot-lr recipes usable at all.
    seed: int = 0
    ckpt_every: int = 1  # save the Orbax checkpoint every K epochs.  A save
    #   pulls the full params+opt state D2H over the ~2 MB/s relay (~20-40 s
    #   for the 3.5M-param UPFlow) — at 100-step epochs a per-epoch save is
    #   a third of the wall time.  Resume correctness is kept by ckpt_meta
    #   .json (epochs_completed written WITH each save): a crash between
    #   saves resumes from the last saved epoch, replaying the deterministic
    #   per-epoch seeds since, and truncating loss.json to match.
    scan_chunk: int = 25  # max steps fused into ONE dispatched XLA program.
    #   The per-epoch lax.scan keeps relay dispatch off the step path, but the
    #   axon TPU worker dies ("kernel fault") on single program executions
    #   that run too long: measured round 4, the b32 128² UPFlow epoch as one
    #   scan(100) (~18 s device) kills the worker deterministically while
    #   scan(3) at b32 and scan(100) at b8 (~5 s) both pass.  Chunking the
    #   epoch into <=scan_chunk-step programs keeps each dispatch ~5 s while
    #   still amortizing the ~0.8 s relay dispatch cost 25x.
    exp_dir: str = "./demo_exp"
    bfloat16: bool = True
    pad_multiple: int = 64  # 6 stride-2 levels
    n_data: int | None = None
    hbm_dataset_gb: float = 6.0  # keep the pair set HBM-resident when it fits
    #   (0 = always stream): one bulk upload, then only batch indices cross
    #   the host↔device boundary per step — the relay's ~2 MB/s H2D otherwise
    #   caps long runs at well under 1 it/s (CLAUDE.md)
    # ARFlow/ex_runner spatial-transform distillation (losses/selfsup.py)
    eq_weight: float = 0.0  # equivariance distillation on transformed pairs
    oi_weight: float = 0.0  # occlusion-photometric loss on transformed pairs
    # Training default = the reference's simple_train.py param_dict
    # (:321-329): cost-volume feature normalization ON with per-image,
    # per-channel moments (if_norm_before_cost_volume=True, both moment-
    # sharing flags False).  UPFlowConfig itself keeps the UPFlow_net.config
    # default (False, upflow.py:313) — but training without it does not
    # learn: measured (round 2), a 64x64 pure 3-px translation converges to
    # the shift in ~100 steps with normalization on, while with it off the
    # photometric loss moves flow by <0.2 px/100 steps (unnormalized feature
    # dot products leave the correlation features badly scaled for the
    # shared decoder) — exactly the flat-EPE stall seen in long runs.
    model: UPFlowConfig = dataclasses.field(
        default_factory=lambda: UPFlowConfig(
            if_norm_before_cost_volume=True,
            norm_moments_across_channels=False,
            norm_moments_across_images=False,
        )
    )
    loss: UPFlowLossConfig = dataclasses.field(default_factory=UPFlowLossConfig)

    @classmethod
    def preset_ex_runner(cls, **kw) -> "UPFlowTrainConfig":
        """The ex_runner training recipe (UPFlow/scripts/ex_runner.py:23-58):
        ARFlow-style spatial-transform distillation (eq) + occlusion-masked
        photometric loss on the transformed pair (oi), both at the reference's
        ``spatial_trans_loss_weight=0.01``; Adam lr=1e-2, wd=1e-5, per-epoch
        exponential decay γ=0.95 (:26-29).  The reference uses this to finetune
        from a pretrained checkpoint (:31) — call ``load_checkpoint`` first for
        the same workflow."""
        defaults = dict(
            lr=1e-2, weight_decay=1e-5, lr_gamma=0.95,
            eq_weight=0.01, oi_weight=0.01,
        )
        return cls(**defaults | kw)  # explicit kwargs override the recipe


def frames_to_pairs(frames: np.ndarray, in_channels: int = 3) -> np.ndarray:
    """``[T, H, W, 1]`` scalar series → ``[T-1, 2, H, W, C]`` (im1, im2) pairs.

    Grayscale is tiled to ``in_channels`` like scivis_data_dict (upflow.py:383-390).
    """
    if frames.ndim == 3:
        frames = frames[..., None]
    f = np.repeat(frames[..., :1], in_channels, axis=-1) if in_channels > 1 else frames[..., :1]
    return np.stack([f[:-1], f[1:]], axis=1)


class UPFlowTrainer:
    def __init__(self, cfg: UPFlowTrainConfig, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.n_data)
        self.net = UPFlowNet(
            cfg=cfg.model, dtype=jnp.bfloat16 if cfg.bfloat16 else None
        )
        self.batch_sharding = NamedSharding(self.mesh, P("data"))
        self.repl = NamedSharding(self.mesh, P())
        self.state = None

        use_sp = cfg.eq_weight > 0 or cfg.oi_weight > 0

        def train_step(state, batch, rng):
            # dict batch: im1/im2 crops (+ optional im1_raw/im2_raw/start for
            # boundary-dilated warping — the KITTI multiview training path,
            # kitti_dataset.py:341-431 + tools.py:393-541)
            im1, im2 = batch["im1"], batch["im2"]
            raw = (
                (batch["im1_raw"], batch["im2_raw"], batch["start"])
                if "im1_raw" in batch else None
            )

            def loss_fn(params):
                out = self.net.apply(params, im1, im2)
                total, parts = upflow_losses(out, im1, im2, cfg.loss, raw=raw)
                if use_sp:
                    # ex_runner-style spatial-transform distillation: student
                    # runs on the transformed pair, teacher flow is the
                    # stop-gradded un-transformed prediction
                    from opticalflowscivis_tpu.losses.selfsup import (
                        SPTransformConfig,
                        eq_loss,
                        oi_loss,
                        sp_transform_pair,
                    )

                    t1, t2, sp = sp_transform_pair(rng, im1, im2, SPTransformConfig())
                    out_t = self.net.apply(params, t1, t2)
                    if cfg.eq_weight > 0:
                        parts["eq_loss"] = cfg.eq_weight * eq_loss(
                            out_t["flow_f"], out["flow_f"], sp
                        )
                        total = total + parts["eq_loss"]
                    if cfg.oi_weight > 0:
                        parts["oi_loss"] = cfg.oi_weight * oi_loss(
                            t1, t2, out_t["flow_f"], out_t["flow_b"]
                        )
                        total = total + parts["oi_loss"]
                    parts["loss_total"] = total
                return total, parts

            (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            return state.apply_gradients(grads=grads), parts

        def eval_step(state, batch):
            im1, im2 = batch["im1"], batch["im2"]
            out = self.net.apply(state.params, im1, im2)
            total, parts = upflow_losses(out, im1, im2, cfg.loss)
            return parts, {"flow_f": out["flow_f"], "flow_b": out["flow_b"]}

        def train_step_idx(state, data, idx, rng):
            # HBM-resident path: gather the minibatch on device from the
            # replicated pair set; constrain to the batch sharding so the
            # data-parallel compute is identical to the streamed path.
            b = jnp.take(data, idx, axis=0).astype(jnp.float32)
            batch = jax.lax.with_sharding_constraint(
                {"im1": b[:, 0], "im2": b[:, 1]}, self.batch_sharding
            )
            return train_step(state, batch, rng)

        self._train_step = train_step
        self._train_step_idx = train_step_idx
        self._eval_step = eval_step
        self._jit_train = None
        self._jit_train_idx = None
        self._jit_eval = None

    def init_state(self, sample_pair: np.ndarray, steps_per_epoch: int = 0):
        cfg = self.cfg
        im1 = jnp.asarray(sample_pair[:1, 0])
        im2 = jnp.asarray(sample_pair[:1, 1])
        params = jax.jit(self.net.init)(jax.random.PRNGKey(cfg.seed), im1, im2)
        lr = cfg.lr
        if cfg.lr_gamma != 1.0 and steps_per_epoch > 0:
            # ExponentialLR stepped per epoch (ex_runner.py:28 γ=0.95)
            lr = optax.exponential_decay(
                cfg.lr, transition_steps=steps_per_epoch,
                decay_rate=cfg.lr_gamma, staircase=True,
            )
        tx = optax.adamw(lr, weight_decay=cfg.weight_decay)
        if cfg.grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
        state = train_state.TrainState.create(
            apply_fn=self.net.apply, params=params, tx=tx
        )
        self.state = jax.device_put(state, self.repl)
        self._jit_train = jax.jit(
            self._train_step,
            in_shardings=(self.repl, self.batch_sharding, self.repl),
            out_shardings=(self.repl, self.repl),
            donate_argnums=(0,),
        )
        self._jit_train_idx = jax.jit(
            self._train_step_idx,
            in_shardings=(self.repl, self.repl, self.repl, self.repl),
            out_shardings=(self.repl, self.repl),
            donate_argnums=(0,),
        )
        self._jit_eval = jax.jit(
            self._eval_step, in_shardings=(self.repl, self.batch_sharding)
        )
        return self.state

    def fit(self, pairs: np.ndarray, epochs: int | None = None,
            log_every: int = 20, resume: bool = False,
            val_pairs: np.ndarray | None = None,
            val_flow: np.ndarray | None = None):
        """``val_pairs [N,2,*S,C]`` + ``val_flow [N,*S,ndim]`` (GT per-frame
        displacement, already gt_flow_stride-scaled): per-epoch mean EPE of the
        forward flow is logged to loss.json as ``val_epe`` next to the constant
        ``val_epe_zero_flow`` baseline — the skill-vs-trivial-predictor
        trajectory the quality reports quote."""
        cfg = self.cfg
        try:  # stale sentinel from a previous stop must not kill a new run
            os.remove(os.path.join(cfg.exp_dir, "STOP"))
        except OSError:
            pass
        pairs, _ = pad_to_multiple(pairs, cfg.pad_multiple, leading_axes=2)
        epochs = epochs if epochs is not None else cfg.n_epoch
        n_data = self.mesh.shape["data"]
        batch = max(n_data, (min(cfg.batch_size, pairs.shape[0]) // n_data) * n_data)
        if pairs.shape[0] < batch:
            raise ValueError(
                f"{pairs.shape[0]} pairs < batch {batch} (data axis = {n_data} "
                f"devices needs at least one pair per device)"
            )
        ds = TupleDataset(pairs, batch, seed=cfg.seed)
        restored = self.state is not None  # a live in-memory state continues
        if self.state is None:
            self.init_state(pairs[:1],
                            steps_per_epoch=max(1, pairs.shape[0] // batch))
            if resume:
                restored = self.load_checkpoint()
        # Resume offset (ADVICE r4): without it, STOP+resume restarts the
        # step counter/rng at 0 and appends duplicate epochs to loss.json.
        # Applied only after a SUCCESSFUL restore (same guard as
        # fit_device_gen); the shuffle stream is advanced past the completed
        # epochs so the data order continues where the original run left off.
        start_epoch = 0
        if resume:
            if restored:
                start_epoch = self._completed_epochs()
                self._truncate_loss_json(start_epoch)
                for _ in range(start_epoch):
                    for _ in ds.epoch_indices():
                        pass
            else:
                print(
                    "resume requested but no checkpoint restored; starting "
                    "from epoch 0 with untruncated loss.json left in place",
                    flush=True,
                )
        use_hbm = bool(
            cfg.hbm_dataset_gb and pairs.nbytes <= cfg.hbm_dataset_gb * 1e9
        )
        data_dev = (
            jax.device_put(jnp.asarray(pairs), self.repl) if use_hbm else None
        )
        # HBM path: one jitted lax.scan per epoch (same relay-dispatch
        # economics as fit_device_gen — per-step dispatch costs ~0.8 s on the
        # axon relay vs ~0.2 s of device compute for the 128² step)
        root_key_dev = jax.random.PRNGKey(cfg.seed + 1)
        if use_hbm:
            def epoch_fn(state, data, idx_all, step0):
                def body(carry, xs):
                    idx, i = xs
                    rng = jax.random.fold_in(root_key_dev, i)
                    b = jnp.take(data, idx, axis=0).astype(jnp.float32)
                    batch_d = jax.lax.with_sharding_constraint(
                        {"im1": b[:, 0], "im2": b[:, 1]}, self.batch_sharding
                    )
                    return self._train_step(carry, batch_d, rng)
                idxs = step0 + jnp.arange(idx_all.shape[0])
                state, stack = jax.lax.scan(body, state, (idx_all, idxs))
                return state, jax.tree.map(lambda a: jnp.mean(a, axis=0), stack)

            jit_epoch = jax.jit(
                epoch_fn,
                in_shardings=(self.repl,) * 4,
                out_shardings=(self.repl, self.repl),
                donate_argnums=(0,),
            )
        # Device-resident validation: pairs + GT upload ONCE, per-epoch EPE is
        # computed on device and only a scalar crosses the relay (predict()
        # per epoch re-uploads ~20 MB over the ~2 MB/s link — measured round-2
        # overhead; this also lifts the 33-pair cap, VERDICT r2 'weak').
        val_dev = gt_dev = None
        if val_pairs is not None and val_flow is not None:
            jit_val, val_dev, gt_dev, val_zero = self._device_val(
                val_pairs, val_flow
            )
        history = []
        t0 = time.time()
        steps_per_epoch = max(1, len(ds))
        step = start_epoch * steps_per_epoch
        root_key = root_key_dev
        for epoch in range(start_epoch, start_epoch + epochs):
            if use_hbm:
                idx_np = np.stack(list(ds.epoch_indices()))
                # chunked dispatch (see UPFlowTrainConfig.scan_chunk): one
                # program per <=chunk steps, weighted-mean meter across chunks
                meter = None
                done = 0
                for c in range(0, idx_np.shape[0], cfg.scan_chunk):
                    idx_c = jnp.asarray(idx_np[c : c + cfg.scan_chunk])
                    w = idx_c.shape[0]
                    self.state, m_c = jit_epoch(
                        self.state, data_dev, idx_c, jnp.int32(step + c)
                    )
                    meter = jax.tree.map(lambda a, b: a + w * b, meter, m_c) \
                        if meter is not None else jax.tree.map(
                            lambda b: w * b, m_c)
                    done += w
                step += int(idx_np.shape[0])
                epoch_means = {k: float(v) / done for k, v in meter.items()}
                if log_every:
                    done_total = step - start_epoch * steps_per_epoch
                    print(
                        f"epoch {epoch} step {step} loss "
                        f"{epoch_means['loss_total']:.5f} "
                        f"({done_total/(time.time()-t0):.2f} it/s)",
                        flush=True,
                    )
            else:
                # streamed fallback: device-side meter — scalars accumulate on
                # device and materialize once per epoch (a float() per part
                # per step costs a relay round trip each)
                meter_dev = None
                n = 0
                for idx in ds.epoch_indices():
                    rng = jax.random.fold_in(root_key, step)
                    b = jnp.asarray(pairs[idx])
                    self.state, parts = self._jit_train(
                        self.state,
                        jax.device_put({"im1": b[:, 0], "im2": b[:, 1]},
                                       self.batch_sharding),
                        rng,
                    )
                    step += 1
                    meter_dev = parts if meter_dev is None else jax.tree.map(
                        jnp.add, meter_dev, parts
                    )
                    n += 1
                    if log_every and step % log_every == 0:
                        done_total = step - start_epoch * steps_per_epoch
                        print(
                            f"epoch {epoch} step {step} loss "
                            f"{float(meter_dev['loss_total'])/n:.5f} "
                            f"({done_total/(time.time()-t0):.2f} it/s)",
                            flush=True,
                        )
                epoch_means = {
                    k: float(v) / max(n, 1) for k, v in (meter_dev or {}).items()
                }
            if val_dev is not None:
                epoch_means["val_epe"] = float(jit_val(self.state, val_dev, gt_dev))
                epoch_means["val_epe_zero_flow"] = val_zero
                print(
                    f"epoch {epoch} val_epe {epoch_means['val_epe']:.4f} "
                    f"(zero-flow {epoch_means['val_epe_zero_flow']:.4f})",
                    flush=True,
                )
            history.append(epoch_means)
            self._append_loss_json(epoch_means)
            saved = False
            if ((epoch - start_epoch + 1) % cfg.ckpt_every == 0
                    or epoch == start_epoch + epochs - 1):
                self.save_checkpoint(epochs_completed=epoch + 1)
                saved = True
            if self._stop_requested():
                if not saved:  # each save is a 20-40 s D2H over the relay
                    self.save_checkpoint(epochs_completed=epoch + 1)
                print(f"STOP sentinel: ending after epoch {epoch}", flush=True)
                break
        return history

    def _device_val(self, val_pairs: np.ndarray, val_flow: np.ndarray):
        """Device-resident per-epoch EPE: pairs + GT upload ONCE, only a scalar
        crosses the relay per epoch.  Returns (jit_val, val_dev, gt_dev,
        val_epe_zero_flow)."""
        cfg = self.cfg
        n_data = self.mesh.shape["data"]
        vp, _ = pad_to_multiple(val_pairs, cfg.pad_multiple, leading_axes=2)
        k = (vp.shape[0] // n_data) * n_data
        if k == 0:
            reps = -(-n_data // vp.shape[0])
            vp = np.tile(vp, (reps,) + (1,) * (vp.ndim - 1))
            val_flow = np.tile(val_flow, (reps,) + (1,) * (val_flow.ndim - 1))
            k = n_data
        val_dev = jax.device_put(
            {"im1": jnp.asarray(vp[:k, 0]), "im2": jnp.asarray(vp[:k, 1])},
            self.batch_sharding,
        )
        gt_dev = jax.device_put(jnp.asarray(val_flow[:k]), self.batch_sharding)
        gt_sl = tuple(slice(0, s) for s in val_flow.shape[1:-1])

        def val_epe_step(state, batch, gt):
            out = self.net.apply(state.params, batch["im1"], batch["im2"])
            flow = out["flow_f"][(slice(None),) + gt_sl]
            return jnp.mean(
                jnp.linalg.norm(flow.astype(jnp.float32) - gt, axis=-1)
            )

        jit_val = jax.jit(
            val_epe_step,
            in_shardings=(self.repl, self.batch_sharding, self.batch_sharding),
            out_shardings=self.repl,
        )
        val_zero = float(np.linalg.norm(val_flow[:k], axis=-1).mean())
        return jit_val, val_dev, gt_dev, val_zero

    def fit_device_gen(self, gen_fn, pos_sampler, steps_per_epoch: int,
                       epochs: int | None = None, log_every: int = 20,
                       resume: bool = False,
                       val_pairs: np.ndarray | None = None,
                       val_flow: np.ndarray | None = None):
        """Train from device-GENERATED pairs — unlimited distinct samples.

        The HBM path caps training data at one fixed relay-uploadable array;
        here frames are composed on device inside the jitted step (e.g.
        ``device_synthetic.pan_pairs_device``), so every epoch can be a fresh
        scene at a per-step upload cost of a few hundred bytes of int32
        positions:

        - ``gen_fn(const, pos) -> (im1, im2, gt_flow)`` traced into the train
          step (gt_flow is unused for training — unsupervised — but lets
          callers reuse the same generator for val);
        - ``pos_sampler(epoch) -> (const, pos)``: ``const`` is a pytree of
          per-EPOCH scene constants (textures/backgrounds, uploaded once per
          epoch — they must be jit arguments, not closure captures, or the
          first epoch's scene would be baked into the compiled step);
          ``pos`` is a pytree whose leaves lead with
          ``steps_per_epoch * batch`` and are sliced per step;
        - ``val_pairs/val_flow``: fixed held-out arrays for the per-epoch
          ``val_epe`` trajectory (same contract as ``fit``).
        """
        cfg = self.cfg
        try:  # stale sentinel from a previous stop must not kill a new run
            os.remove(os.path.join(cfg.exp_dir, "STOP"))
        except OSError:
            pass
        epochs = epochs if epochs is not None else cfg.n_epoch
        # Resume offset: replaying pos_sampler(0..k) seeds would re-train on
        # the exact scenes already seen before reaching fresh data, and the
        # fold_in(root_key, step) rng would replay from 0 (ADVICE r3, medium).
        # The offset (and the loss.json truncation) must only apply when
        # checkpoint params were actually RESTORED — a failed restore
        # ("training from scratch") combined with a non-zero epoch offset
        # would silently discard the run while appearing to continue it
        # (ADVICE r4, medium) — so both are decided after the restore attempt
        # below; the sampler probe uses the guessed offset so a successful
        # resume samples exactly the epochs it will train on.
        guess = self._completed_epochs() if resume else 0
        probe = pos_sampler(guess)
        n_pos = jax.tree.leaves(probe[1])[0].shape[0]
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

        def take(pos, s):
            return jax.tree.map(
                lambda a: jnp.asarray(a[s * batch : (s + 1) * batch]), pos
            )

        restored = self.state is not None  # a live in-memory state continues
        if self.state is None:
            # shape/dtype only (jax.eval_shape): init never reads the values,
            # so don't generate-and-download a real batch (ADVICE r3)
            s1, _, _ = jax.eval_shape(gen_fn, probe[0], take(probe[1], 0))
            for d in s1.shape[1:-1]:
                if d % cfg.pad_multiple:
                    raise ValueError(
                        f"generated spatial dim {d} violates "
                        f"pad_multiple={cfg.pad_multiple}"
                    )
            self.init_state(
                np.zeros((1, 2) + s1.shape[1:], np.float32),
                steps_per_epoch=steps_per_epoch,
            )
            if resume:
                restored = self.load_checkpoint()
        start_epoch = 0
        if resume:
            if restored:
                start_epoch = guess
                self._truncate_loss_json(start_epoch)
            else:
                print(
                    "resume requested but no checkpoint restored; starting "
                    "from epoch 0 with untruncated loss.json left in place",
                    flush=True,
                )

        # One jitted lax.scan per EPOCH, not one dispatch per step: measured
        # on the axon relay, per-step host work (position upload + fold_in +
        # step dispatch) costs ~0.8 s/step against ~0.2 s of device compute
        # (~1 it/s wall for a step the profiler times at 5/s).  Scanning the
        # whole epoch on device — positions uploaded once as [spe, batch,
        # ...], rng folded in-scan from the step index — leaves ONE dispatch
        # per epoch, so wall time ~= device time regardless of relay latency.
        def epoch_fn(state, const, pos_all, step0):
            def body(carry, xs):
                pos_s, idx = xs
                rng = jax.random.fold_in(root_key_dev, idx)
                im1, im2, _ = gen_fn(const, pos_s)
                batch_d = jax.lax.with_sharding_constraint(
                    {"im1": im1.astype(jnp.float32),
                     "im2": im2.astype(jnp.float32)},
                    self.batch_sharding,
                )
                carry, parts = self._train_step(carry, batch_d, rng)
                return carry, parts
            n_scan = jax.tree.leaves(pos_all)[0].shape[0]
            idxs = step0 + jnp.arange(n_scan)
            state, parts_stack = jax.lax.scan(body, state, (pos_all, idxs))
            return state, jax.tree.map(lambda a: jnp.mean(a, axis=0), parts_stack)

        jit_epoch = jax.jit(
            epoch_fn,
            in_shardings=(self.repl, self.repl, self.repl, self.repl),
            out_shardings=(self.repl, self.repl),
            donate_argnums=(0,),
        )
        jit_val = val_dev = gt_dev = None
        if val_pairs is not None and val_flow is not None:
            jit_val, val_dev, gt_dev, val_zero = self._device_val(
                val_pairs, val_flow
            )
        history = []
        t0 = time.time()
        step = start_epoch * steps_per_epoch
        root_key_dev = jax.random.PRNGKey(cfg.seed + 1)
        for epoch in range(start_epoch, start_epoch + epochs):
            const, pos = probe if epoch == guess else pos_sampler(epoch)
            const = jax.device_put(const, self.repl)
            pos_np = jax.tree.map(
                lambda a: np.asarray(a).reshape(
                    (steps_per_epoch, batch) + np.asarray(a).shape[1:]),
                pos,
            )
            # chunked dispatch (see UPFlowTrainConfig.scan_chunk)
            meter_dev = None
            done = 0
            for c in range(0, steps_per_epoch, cfg.scan_chunk):
                pos_c = jax.tree.map(
                    lambda a: jnp.asarray(a[c : c + cfg.scan_chunk]), pos_np
                )
                w = jax.tree.leaves(pos_c)[0].shape[0]
                self.state, m_c = jit_epoch(
                    self.state, const, pos_c, jnp.int32(step + c)
                )
                meter_dev = jax.tree.map(lambda a, b: a + w * b, meter_dev, m_c) \
                    if meter_dev is not None else jax.tree.map(
                        lambda b: w * b, m_c)
                done += w
            step += steps_per_epoch
            epoch_means = {k: float(v) / done for k, v in meter_dev.items()}
            if log_every:
                done = step - start_epoch * steps_per_epoch
                print(
                    f"epoch {epoch} step {step} loss "
                    f"{epoch_means['loss_total']:.5f} "
                    f"({done/(time.time()-t0):.2f} it/s)",
                    flush=True,
                )
            if val_dev is not None:
                epoch_means["val_epe"] = float(jit_val(self.state, val_dev, gt_dev))
                epoch_means["val_epe_zero_flow"] = val_zero
                print(
                    f"epoch {epoch} val_epe {epoch_means['val_epe']:.4f} "
                    f"(zero-flow {epoch_means['val_epe_zero_flow']:.4f})",
                    flush=True,
                )
            history.append(epoch_means)
            self._append_loss_json(epoch_means)
            saved = False
            if ((epoch - start_epoch + 1) % cfg.ckpt_every == 0
                    or epoch == start_epoch + epochs - 1):
                self.save_checkpoint(epochs_completed=epoch + 1)
                saved = True
            if self._stop_requested():
                if not saved:  # each save is a 20-40 s D2H over the relay
                    self.save_checkpoint(epochs_completed=epoch + 1)
                print(f"STOP sentinel: ending after epoch {epoch}", flush=True)
                break
        return history

    def _completed_epochs(self) -> int:
        """Epochs completed AT THE LAST CHECKPOINT — the resume offset for
        device-gen seeds and the step rng.  Prefers ckpt_meta.json (written
        with each save, consistent with the restored params even when
        ckpt_every > 1); falls back to loss.json length for runs from before
        the meta file existed."""
        meta = os.path.join(self.cfg.exp_dir, "ckpt_meta.json")
        if os.path.exists(meta):
            with open(meta) as f:
                return int(json.load(f).get("epochs_completed", 0))
        path = os.path.join(self.cfg.exp_dir, "loss.json")
        if not os.path.exists(path):
            return 0
        with open(path) as f:
            return len(json.load(f).get("loss", []))

    def val_epe(self, val_pairs: np.ndarray, val_flow: np.ndarray) -> float:
        """Mean EPE of the forward flow vs GT displacement on val pairs."""
        n_data = self.mesh.shape["data"]
        k = (val_pairs.shape[0] // n_data) * n_data
        if k == 0:  # fewer val pairs than devices: repeat to fill one shard each
            reps = -(-n_data // val_pairs.shape[0])
            val_pairs = np.tile(val_pairs, (reps,) + (1,) * (val_pairs.ndim - 1))
            val_flow = np.tile(val_flow, (reps,) + (1,) * (val_flow.ndim - 1))
            k = n_data
        _, extras = self.predict(val_pairs[:k])
        flow = np.asarray(extras["flow_f"])
        sl = tuple(slice(0, s) for s in val_flow.shape[1:-1])
        flow = flow[(slice(None),) + sl]
        return float(np.linalg.norm(flow - val_flow[:k], axis=-1).mean())

    def fit_kitti(self, dataset, steps_per_epoch: int,
                  epochs: int | None = None, log_every: int = 20,
                  resume: bool = False):
        """Streamed KITTI-multiview training ⇔ simple_train.py w/
        kitti_data_with_start_point: per-step random crops with rho-margin
        offsets feeding boundary-dilated warping in the photometric term.

        ``dataset`` is a ``data.kitti.KittiPairDataset`` (or anything with
        ``sample(batch) -> dict``)."""
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.n_epoch
        n_data = self.mesh.shape["data"]
        batch = max(n_data, (cfg.batch_size // n_data) * n_data)
        if self.state is None:
            first = dataset.sample(1)
            self.init_state(
                np.stack([first["im1"], first["im2"]], axis=1),
                steps_per_epoch=steps_per_epoch,
            )
            if resume:
                self.load_checkpoint()
        history = []
        t0 = time.time()
        step = 0
        root_key = jax.random.PRNGKey(cfg.seed + 1)
        for epoch in range(epochs):
            meter: dict[str, float] = {}
            n = 0
            for _ in range(steps_per_epoch):
                b = dataset.sample(batch)
                self.state, parts = self._jit_train(
                    self.state,
                    jax.device_put(
                        {k: jnp.asarray(v) for k, v in b.items()},
                        self.batch_sharding,
                    ),
                    jax.random.fold_in(root_key, step),
                )
                step += 1
                for k, v in parts.items():
                    meter[k] = meter.get(k, 0.0) + float(v)
                n += 1
                if log_every and step % log_every == 0:
                    print(
                        f"epoch {epoch} step {step} loss "
                        f"{meter['loss_total']/n:.5f} ({step/(time.time()-t0):.2f} it/s)",
                        flush=True,
                    )
            epoch_means = {k: v / max(n, 1) for k, v in meter.items()}
            history.append(epoch_means)
            self._append_loss_json(epoch_means)
            self.save_checkpoint(epochs_completed=epoch + 1)
        return history

    def fit_kitti_hbm(self, cache, steps_per_epoch: int,
                      epochs: int | None = None, log_every: int = 20,
                      resume: bool = False):
        """HBM-resident multiview training: frames upload ONCE, then crops,
        rho-dilated raw windows, hflip and temporal-swap augmentation run on
        device inside the jitted step — per step only pair indices + offsets +
        aug bits cross the host↔device boundary (see data.kitti.KittiHBMCache;
        the streamed ``fit_kitti`` is capped by the relay's ~2 MB/s H2D)."""
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.n_epoch
        n_data = self.mesh.shape["data"]
        batch = max(n_data, (cfg.batch_size // n_data) * n_data)
        ch, cw = cache.crop
        rho = cache.rho
        store = jnp.bfloat16 if cfg.bfloat16 else jnp.float32
        # Upload the frame cache once per (trainer, cache) — repeated calls
        # (resume, staged schedules, benchmarks) must not re-pay the ~2 MB/s
        # relay H2D cost for an array that is already device-resident.
        if getattr(self, "_hbm_frames_key", None) != id(cache):
            self._hbm_frames_dev = jax.device_put(
                jnp.asarray(cache.frames, store), self.repl)
            self._hbm_frames_key = id(cache)
        frames_dev = self._hbm_frames_dev
        f_count, fh, fw, fc = cache.frames.shape

        def crop_at(img, oy, ox, h, w):
            return jax.lax.dynamic_slice(img, (oy, ox, 0), (h, w, fc))

        def step_fn(state, frames, pid, offs, flip, swap, rng):
            i1 = jnp.take(frames, pid[:, 0], axis=0)
            i2 = jnp.take(frames, pid[:, 1], axis=0)
            c1 = jax.vmap(lambda im, o: crop_at(im, o[0], o[1], ch, cw))(i1, offs)
            c2 = jax.vmap(lambda im, o: crop_at(im, o[0], o[1], ch, cw))(i2, offs)
            r1 = jax.vmap(
                lambda im, o: crop_at(im, o[0] - rho, o[1] - rho,
                                      ch + 2 * rho, cw + 2 * rho))(i1, offs)
            r2 = jax.vmap(
                lambda im, o: crop_at(im, o[0] - rho, o[1] - rho,
                                      ch + 2 * rho, cw + 2 * rho))(i2, offs)
            fl = flip[:, None, None, None]
            c1, c2, r1, r2 = (
                jnp.where(fl, t[:, :, ::-1], t) for t in (c1, c2, r1, r2)
            )
            sw = swap[:, None, None, None]
            c1, c2 = jnp.where(sw, c2, c1), jnp.where(sw, c1, c2)
            r1, r2 = jnp.where(sw, r2, r1), jnp.where(sw, r1, r2)
            batch_d = {
                "im1": c1.astype(jnp.float32),
                "im2": c2.astype(jnp.float32),
                "im1_raw": r1.astype(jnp.float32),
                "im2_raw": r2.astype(jnp.float32),
                "start": jnp.full((c1.shape[0], 2), float(rho), jnp.float32),
            }
            batch_d = jax.lax.with_sharding_constraint(batch_d, self.batch_sharding)
            return self._train_step(state, batch_d, rng)

        if self.state is None:
            sample0 = cache.frames[:1, : ch, : cw]
            self.init_state(
                np.stack([sample0, sample0], axis=1),
                steps_per_epoch=steps_per_epoch,
            )
            if resume:
                self.load_checkpoint()
        # step_fn is a fresh closure per call, so a bare jax.jit would
        # recompile on every fit_kitti_hbm invocation (minutes per remote
        # compile); cache the jitted wrapper on the geometry it closes over.
        jit_key = (ch, cw, rho, f_count, fh, fw, fc, batch)
        if getattr(self, "_hbm_jit_key", None) != jit_key:
            self._hbm_jit_step = jax.jit(
                step_fn,
                in_shardings=(self.repl,) * 7,
                out_shardings=(self.repl, self.repl),
                donate_argnums=(0,),
            )
            self._hbm_jit_key = jit_key
        jit_step = self._hbm_jit_step
        rng_np = np.random.default_rng(cfg.seed + 2)
        root_key = jax.random.PRNGKey(cfg.seed + 1)
        history = []
        t0 = time.time()
        step = 0
        for epoch in range(epochs):
            meter_dev = None
            n = 0
            for _ in range(steps_per_epoch):
                pid = cache.pair_idx[
                    rng_np.integers(len(cache.pair_idx), size=batch)
                ]
                offs = np.stack(
                    [
                        rng_np.integers(rho, max(fh - ch - rho, rho) + 1,
                                        size=batch),
                        rng_np.integers(rho, max(fw - cw - rho, rho) + 1,
                                        size=batch),
                    ],
                    axis=1,
                ).astype(np.int32)
                flip = rng_np.random(batch) < 0.5
                swap = rng_np.random(batch) < 0.5
                self.state, parts = jit_step(
                    self.state, frames_dev, jnp.asarray(pid),
                    jnp.asarray(offs), jnp.asarray(flip), jnp.asarray(swap),
                    jax.random.fold_in(root_key, step),
                )
                step += 1
                meter_dev = parts if meter_dev is None else jax.tree.map(
                    jnp.add, meter_dev, parts
                )
                n += 1
                if log_every and step % log_every == 0:
                    print(
                        f"epoch {epoch} step {step} loss "
                        f"{float(meter_dev['loss_total'])/n:.5f} "
                        f"({step/(time.time()-t0):.2f} it/s)",
                        flush=True,
                    )
            epoch_means = {
                k: float(v) / max(n, 1) for k, v in (meter_dev or {}).items()
            }
            history.append(epoch_means)
            self._append_loss_json(epoch_means)
            self.save_checkpoint(epochs_completed=epoch + 1)
        return history

    def predict(self, pairs: np.ndarray):
        pairs, _ = pad_to_multiple(pairs, self.cfg.pad_multiple, leading_axes=2)
        if self.state is None:
            self.init_state(pairs[:1])
        pairs = jnp.asarray(pairs)
        return self._jit_eval(
            self.state,
            jax.device_put({"im1": pairs[:, 0], "im2": pairs[:, 1]},
                           self.batch_sharding),
        )

    def _append_loss_json(self, parts: dict[str, float]):
        os.makedirs(self.cfg.exp_dir, exist_ok=True)
        path = os.path.join(self.cfg.exp_dir, "loss.json")
        data = {"loss": []}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
        data["loss"].append(parts)
        with open(path, "w+") as f:
            json.dump(data, f, indent=4)

    def _stop_requested(self) -> bool:
        """Graceful-stop sentinel: ``<exp_dir>/STOP`` ends the run at the next
        epoch boundary.  Killing the process mid-dispatch instead wedges the
        axon relay for ~15 min (measured round 4) — touch the file, wait for
        the epoch to finish, and the trainer exits cleanly after its
        checkpoint save."""
        return os.path.exists(os.path.join(self.cfg.exp_dir, "STOP"))

    def save_checkpoint(self, epochs_completed: int | None = None):
        if jax.process_index() != 0:
            return
        from opticalflowscivis_tpu.training.checkpoint import save_state

        save_state(
            os.path.abspath(os.path.join(self.cfg.exp_dir, "upflow.ckpt")), self.state
        )
        if epochs_completed is not None:
            meta = os.path.join(self.cfg.exp_dir, "ckpt_meta.json")
            with open(meta, "w") as f:
                json.dump({"epochs_completed": int(epochs_completed)}, f)

    def _truncate_loss_json(self, n_epochs: int):
        """Drop loss.json entries past the restored checkpoint (resume after a
        crash between ckpt_every saves re-runs those epochs)."""
        path = os.path.join(self.cfg.exp_dir, "loss.json")
        if not os.path.exists(path):
            return
        with open(path) as f:
            data = json.load(f)
        if len(data.get("loss", [])) > n_epochs:
            data["loss"] = data["loss"][:n_epochs]
            with open(path, "w") as f:
                json.dump(data, f, indent=4)

    def load_checkpoint(self) -> bool:
        from opticalflowscivis_tpu.training.checkpoint import restore_state

        try:
            self.state = restore_state(
                os.path.abspath(os.path.join(self.cfg.exp_dir, "upflow.ckpt")),
                self.state,
            )
            return True
        except Exception as e:  # noqa: BLE001
            print(f"No usable checkpoint ({e}); training from scratch.", flush=True)
            return False
