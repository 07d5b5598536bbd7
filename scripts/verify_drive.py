"""End-to-end verify drive: multi-chip balanced training on the
8-virtual-CPU mesh (user-style: build scene -> Trainer -> PSNR rises ->
sharded == unsharded -> PLY round trip). ~25 min on CPU (interpret-mode
kernels). Referenced by .claude/skills/verify/SKILL.md.
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, "/root/repo")
assert len(jax.devices()) == 8, jax.devices()
from tpu2dgs.core import cameras
from tpu2dgs.model import splats as splats_lib
from tpu2dgs.raster.api import RasterSettings, render
from tpu2dgs.train.loop import TrainConfig, Trainer
from tpu2dgs.train import losses
from tpu2dgs.parallel.sharded import make_mesh

rng = np.random.default_rng(0)
w = h = 32
def orbit(i, n):
    a = 2*np.pi*i/n
    fwd = np.array([-np.sin(a), 0.0, -np.cos(a)]); pos = -2.5*fwd
    up = np.array([0.,1.,0.]); right = np.cross(up, fwd); right/=np.linalg.norm(right)
    tu = np.cross(fwd, right); Rw2v = np.stack([right, tu, fwd])
    return cameras.Camera(uid=i, image_name=f"v{i}", R=Rw2v.T, T=-Rw2v@pos,
                          fovx=np.pi/3, fovy=np.pi/3, width=w, height=h)
# GT scene: 24 spread splats
n_gt = 24
gt_xyz = rng.uniform(-0.5, 0.5, (n_gt,3)).astype(np.float32)
gt_rgb = rng.uniform(0.2, 0.9, (n_gt,3)).astype(np.float32)
gt_model = splats_lib.create_from_pcd(gt_xyz, gt_rgb, capacity=32)
p = gt_model.params
s_gt = RasterSettings(width=w, height=h, sh_degree=0, backend="tiled",
                      bin_capacity=128, tile_capacity=128)
cams = []
for i in range(8):
    c = orbit(i, 8)
    out = render(c.arrays(), s_gt, p.xyz, jnp.exp(p.scaling), p.rotation,
                 jax.nn.sigmoid(p.opacity[:,0]), splats_lib.features(p),
                 jnp.zeros(3), live=gt_model.live)
    c.image = np.asarray(out["render"])
    cams.append(c)

mesh = make_mesh(8)
model = splats_lib.create_from_pcd(
    gt_xyz + rng.normal(0, 0.06, gt_xyz.shape).astype(np.float32),
    np.clip(gt_rgb + rng.normal(0, 0.2, gt_rgb.shape).astype(np.float32), 0, 1),
    capacity=32)
cfg = TrainConfig(densify_from_iter=10**9, opacity_reset_interval=10**9,
                  normal_from_iter=0, dist_from_iter=0, loss_sync_interval=20)
tr = Trainer(model, cams, w, h, spatial_lr_scale=1.0, scene_extent=2.0,
             train_cfg=cfg, max_sh_degree=0, mesh=mesh,
             raster_kwargs=dict(backend="pallas", bin_capacity=128,
                                tile_capacity=128, debug=True), seed=0)
def psnr_now():
    vals = []
    for c in cams[:2]:
        out = tr.render_view(c)
        vals.append(float(losses.psnr(jnp.clip(out["render"],0,1),
                                      jnp.asarray(c.image))))
        assert np.isfinite(np.asarray(out["render"])).all()
        assert np.isfinite(np.asarray(out["surf_depth"])).all()
    return sum(vals)/len(vals)
p0 = psnr_now()
tr.train(num_iters=40)
p1 = psnr_now()
print(f"PSNR {p0:.2f} -> {p1:.2f} dB (multi-chip balanced pallas)")
assert p1 > p0 + 0.5, (p0, p1)
# sharded render == unsharded render on the trained model
pp = tr.model.params
s8 = RasterSettings(width=w, height=h, sh_degree=0, backend="pallas",
                    bin_capacity=128, tile_capacity=128, debug=True)
args = (pp.xyz, jnp.exp(pp.scaling), pp.rotation,
        jax.nn.sigmoid(pp.opacity[:,0]), splats_lib.features(pp))
o1 = render(cams[0].arrays(), s8, *args, jnp.zeros(3), live=tr.model.live)
o8 = render(cams[0].arrays(), s8, *args, jnp.zeros(3), live=tr.model.live, mesh=mesh)
np.testing.assert_allclose(np.asarray(o8["render"]), np.asarray(o1["render"]),
                           rtol=1e-4, atol=1e-4)
sw = np.asarray(o8["strip_work"])
assert sw.shape == (8,), sw
print("sharded == unsharded render: OK; strip_work =", sw)
# PLY round trip
import tempfile, os
d = tempfile.mkdtemp()
fp = os.path.join(d, "pc.ply")
splats_lib.save_ply(tr.model, fp)
m2 = splats_lib.load_ply(fp)
assert int(m2.num_live()) == int(tr.model.num_live())
print("PLY round trip: OK, live =", int(m2.num_live()))
