"""A/B: jax.image.resize bilinear vs manual shift+interleave 2x upsample,
measured at full enc+fuse+dec scale, plus numerical equivalence check."""
import time
import jax, jax.numpy as jnp
from jax import lax

from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache
enable_compilation_cache()
from v2x_sim_tpu.configs.config import Config
from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch
from v2x_sim_tpu.train.det_module import DetModule
from v2x_sim_tpu.models.backbone import fold_agents, unfold_agents


def _up_axis(x, axis):
    lo = jnp.concatenate(
        [lax.slice_in_dim(x, 0, 1, axis=axis),
         lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)], axis)
    hi = jnp.concatenate(
        [lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
         lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)],
        axis)
    c75 = jnp.asarray(0.75, x.dtype)
    c25 = jnp.asarray(0.25, x.dtype)
    even = c75 * x + c25 * lo
    odd = c75 * x + c25 * hi
    y = jnp.stack([even, odd], axis=axis + 1 if axis >= 0 else axis)
    new_shape = list(x.shape)
    new_shape[axis] *= 2
    return y.reshape(new_shape)


def upsample2x(x):
    h_ax = x.ndim - 3
    w_ax = x.ndim - 2
    return _up_axis(_up_axis(x, h_ax), w_ax)


# --- equivalence check (CPU-sized) ---
k = jax.random.PRNGKey(0)
for shape in [(2, 16, 16, 8), (3, 5, 7, 4)]:
    x = jax.random.normal(k, shape, jnp.float32)
    ref = jax.image.resize(x, (shape[0], 2 * shape[1], 2 * shape[2], shape[3]),
                           method="bilinear")
    got = upsample2x(x)
    err = float(jnp.abs(ref - got).max())
    print(f"equiv {shape}: max err {err:.2e}")
    assert err < 1e-5

# --- A/B timing ---
B = 16
cfg = Config()
spec = SyntheticSpec(points_per_agent=8192, num_vehicles=12, max_gt=32)
raw = generate_batch(cfg, spec, batch_size=B, seed=0)
batch = {kk: jnp.asarray(v) for kk, v in raw.items() if kk != "visible"}
module = DetModule(cfg, mode="disco", compute_dtype=jnp.bfloat16)
state = module.init(jax.random.PRNGKey(0), batch)
model = module.eval_model
variables = {"params": state.params, "batch_stats": state.batch_stats}
tr, am = batch["trans"], batch["agent_mask"]
occ = jax.jit(module.occupancy_from_points)(batch["points"], batch["point_mask"])
occ = jax.block_until_ready(occ)
EPS = jnp.bfloat16(1e-8)


def m_encfusedec(m, x):
    feats = list(m.encoder(fold_agents(x), False))
    kk = m._layer
    a = x.shape[1]
    f = unfold_agents(feats[kk], a)
    fused = m._fuse(f, tr, am, False)
    feats[kk] = fold_agents(fused)
    return m.decoder(feats, False)


def timed(n):
    @jax.jit
    def run(x):
        def body(i, c):
            out = model.apply(variables, x + EPS * c.astype(x.dtype),
                              method=m_encfusedec)
            return c + out.ravel()[0].astype(jnp.float32)
        return lax.fori_loop(0, n, body, jnp.float32(0.0))
    return run


def measure(tag):
    N = 10
    r1, r2 = timed(N), timed(2 * N)
    jax.block_until_ready(r1(occ)); jax.block_until_ready(r2(occ))
    t0 = time.perf_counter(); float(r1(occ)); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); float(r2(occ)); tb = time.perf_counter() - t0
    dt = (tb - ta) / N * 1e3
    print(f"{tag:28s} {dt:8.2f} ms/batch ({B/dt*1e3:6.1f} scenes/s)")


measure("enc+fuse+dec (resize)")

# Patch: route decoder's jax.image.resize through manual upsample for 2x.
import v2x_sim_tpu.models.backbone as bb
orig_resize = jax.image.resize
def patched(xx, shape, method="bilinear", **kw):
    if (method == "bilinear" and shape[-3] == 2 * xx.shape[-3]
            and shape[-2] == 2 * xx.shape[-2] and shape[-1] == xx.shape[-1]):
        return upsample2x(xx)
    return orig_resize(xx, shape, method=method, **kw)
bb.jax.image.resize = patched  # bb uses jax.image.resize via module attr

measure("enc+fuse+dec (manual up2x)")
