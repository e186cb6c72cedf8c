"""Device-side sub-model stage costs at B=16 (looped single jit)."""
import time
import jax, jax.numpy as jnp
from jax import lax

from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache
enable_compilation_cache()
from v2x_sim_tpu.configs.config import Config
from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch
from v2x_sim_tpu.train.det_module import DetModule
from v2x_sim_tpu.models.backbone import fold_agents, unfold_agents

B = 16
cfg = Config()
spec = SyntheticSpec(points_per_agent=8192, num_vehicles=12, max_gt=32)
raw = generate_batch(cfg, spec, batch_size=B, seed=0)
batch = {k: jnp.asarray(v) for k, v in raw.items() if k != "visible"}

module = DetModule(cfg, mode="disco", compute_dtype=jnp.bfloat16)
state = module.init(jax.random.PRNGKey(0), batch)
model = module.eval_model
variables = {"params": state.params, "batch_stats": state.batch_stats}
tr, am = batch["trans"], batch["agent_mask"]

occ = jax.jit(module.occupancy_from_points)(batch["points"], batch["point_mask"])
occ = jax.block_until_ready(occ)
EPS = jnp.bfloat16(1e-8)


def m_enc(m, x):
    return m.encoder(fold_agents(x), False)

def m_encfuse(m, x):
    feats = list(m.encoder(fold_agents(x), False))
    k = m._layer
    a = x.shape[1]
    f = unfold_agents(feats[k], a)
    fused = m._fuse(f, tr, am, False)
    feats[k] = fold_agents(fused)
    return feats

def m_encfusedec(m, x):
    feats = m_encfuse(m, x)
    return m.decoder(feats, False)

def m_full(m, x):
    out = m(x, tr, am, train=False)
    return out.cls_logits, out.reg


def make_looped(method, n):
    @jax.jit
    def run(x):
        def body(i, c):
            out = method_apply(x + EPS * c.astype(x.dtype))
            leaf = out[0] if isinstance(out, (tuple, list)) else out
            return c + leaf.ravel()[0].astype(jnp.float32)
        return lax.fori_loop(0, n, body, jnp.float32(0.0))
    def method_apply(x):
        return model.apply(variables, x, method=method)
    return run

N = 10
for name, meth in [("encoder", m_enc), ("enc+fuse", m_encfuse),
                   ("enc+fuse+dec", m_encfusedec), ("full fwd", m_full)]:
    r1, r2 = make_looped(meth, N), make_looped(meth, 2 * N)
    jax.block_until_ready(r1(occ)); jax.block_until_ready(r2(occ))
    t0 = time.perf_counter(); float(r1(occ)); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); float(r2(occ)); tb = time.perf_counter() - t0
    dt = (tb - ta) / N * 1e3
    print(f"{name:14s} {dt:8.2f} ms/batch  ({B/dt*1e3:7.1f} scenes/s)")
