"""Verify drive: library surface end-to-end on CPU (moving-box smoke flow)."""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from opticalflowscivis_tpu.ops import backward_warp, cost_volume, ssim, lap_loss
from opticalflowscivis_tpu.data import rectangle_2d, group_tuples

# 1. moving-box pair: warp frame1 back by the true flow -> recovers frame0
arr = rectangle_2d(n_frames=12, grid=(48, 48), box=(16, 16), seed=11)
# pick a frame whose box actually moves (nonzero GT flow)
t = next(t for t in range(11) if np.abs(arr[t, ..., 1:]).max() >= 2)
f0 = jnp.asarray(arr[t:t+1, ..., :1]); f1 = jnp.asarray(arr[t+1:t+2, ..., :1])
flow = jnp.asarray(arr[t:t+1, ..., 1:])
rec = backward_warp(f1, flow)
inside = np.asarray(arr[t, ..., 0] > 0)
err = float(np.abs(np.asarray(rec[0, ..., 0]) - np.asarray(f0[0, ..., 0]))[inside].mean())
assert err < 1e-5, f"warp recovery failed: {err}"

# 2. cost volume argmax at the known displacement
md = 3
ky, kx = 2, -1
feat = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 8))
shifted = jnp.roll(feat, (ky, kx), axis=(1, 2))
cv = cost_volume(feat, shifted, max_disp=md)
# f2[p + d] == f1[p] when d = -(ky,kx)?  f2 = roll(f1, +k): f2[p] = f1[p-k] -> f1[p] = f2[p+k]
expect = (ky + md) * (2 * md + 1) + (kx + md)
interior = cv[0, md+2:-md-2, md+2:-md-2, :]
am = int(jnp.argmax(interior.sum((0, 1))))
assert am == expect, f"cost volume argmax {am} != {expect}"

# 3. ssim / lap_loss rank the recovered frame above the raw pair
s_rec = float(ssim(rec, f0)); s_raw = float(ssim(f1, f0))
l_rec = float(lap_loss(rec, f0)); l_raw = float(lap_loss(f1, f0))
assert s_rec > s_raw, (s_rec, s_raw)
assert l_rec < l_raw, (l_rec, l_raw)

# 4. grouped tuples feed the model + losses (tiny IFNet forward & loss)
from opticalflowscivis_tpu.models import IFNet
from opticalflowscivis_tpu.losses import rife_losses, RIFELossWeights
tuples = jnp.asarray(group_tuples(arr, 1)[:2])
img0, img1, gt = tuples[:, 0, ..., :1], tuples[:, 1, ..., :1], tuples[:, 2, ..., :1]
gt_flow = tuples[:, 2, ..., 1:]
net = IFNet(ndim=2, block_channels=(16, 12, 8), teacher_channels=8)
params = net.init(jax.random.PRNGKey(1), img0, img1, gt)
out = net.apply(params, img0, img1, gt)
loss, parts = rife_losses(out, img0, img1, gt, params,
                          RIFELossWeights.preset_2d(flow_supervised=True), 2, gt_flow)
assert np.isfinite(float(loss)), parts
print("drive OK:",
      f"warp_err={err:.2e} ssim {s_raw:.4f}->{s_rec:.4f} lap {l_raw:.4f}->{l_rec:.4f}",
      f"loss_G={float(loss):.4f}")

# 5. UPFlow surface: forward + unsupervised losses on a moving-box pair
from opticalflowscivis_tpu.models import UPFlowNet, UPFlowConfig
from opticalflowscivis_tpu.losses import UPFlowLossConfig, upflow_losses
from opticalflowscivis_tpu.training.upflow_trainer import frames_to_pairs
tinycfg = UPFlowConfig(num_chs=(3,4,8,8,12,16,16), estimator_f_channels=(16,16,12,8,8),
                       context_f_channels=(16,16,16,12,8,8,2), search_range=2)
unet_ = UPFlowNet(cfg=tinycfg)
pairs = frames_to_pairs(np.pad(arr[..., :1], ((0,0),(8,8),(8,8),(0,0))), 3)
im1u, im2u = jnp.asarray(pairs[:2,0]), jnp.asarray(pairs[:2,1])
up = unet_.init(jax.random.PRNGKey(2), im1u, im2u)
uout = unet_.apply(up, im1u, im2u)
utotal, uparts = upflow_losses(uout, im1u, im2u, UPFlowLossConfig(census_weight=0.5))
assert np.isfinite(float(utotal))
assert uout['flow_f'].shape == im1u.shape[:3] + (2,)
print('upflow drive OK: loss_total=%.4f flow_f=%s' % (float(utotal), uout['flow_f'].shape))
