"""Device-side stage costs: loop each pipeline N times inside ONE jit
with a forced sequential data dependency, so host/tunnel dispatch
overhead is paid once. Cost/iter = (t(2N) - t(N)) / N.
"""
import time
import jax, jax.numpy as jnp
from jax import lax

from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache
enable_compilation_cache()
from v2x_sim_tpu.configs.config import Config
from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch
from v2x_sim_tpu.train.det_module import DetModule
from v2x_sim_tpu.ops.postprocess import decode_topk
from v2x_sim_tpu.ops.nms import batched_nms

B = 16
cfg = Config()
spec = SyntheticSpec(points_per_agent=8192, num_vehicles=12, max_gt=32)
raw = generate_batch(cfg, spec, batch_size=B, seed=0)
batch = {k: jnp.asarray(v) for k, v in raw.items() if k != "visible"}

module = DetModule(cfg, mode="disco", compute_dtype=jnp.bfloat16)
state = module.init(jax.random.PRNGKey(0), batch)
pts, pm, tr, am = batch["points"], batch["point_mask"], batch["trans"], batch["agent_mask"]
EPS = jnp.float32(1e-30)


def stage_vox(p):
    return module.occupancy_from_points(p, pm)

def stage_fwd(p):
    occ = stage_vox(p)
    out = module.eval_model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        occ, tr, am, train=False)
    return out.cls_logits, out.reg

def stage_dec(p):
    cl, rg = stage_fwd(p)
    return decode_topk(cl, rg, module.anchors, 128, 0.3, am)

def stage_full(p):
    boxes, scores, valid = stage_dec(p)
    r = batched_nms(boxes, scores, valid, 0.1)
    return r.boxes, r.scores, r.valid


def make_looped(stage, n):
    @jax.jit
    def run(p):
        def body(i, c):
            out = stage(p + EPS * c)
            leaf = out[0] if isinstance(out, tuple) else out
            return c + leaf.ravel()[0].astype(jnp.float32)
        return lax.fori_loop(0, n, body, jnp.float32(0.0))
    return run

N = 10
for name, stage in [("vox", stage_vox), ("vox+fwd", stage_fwd),
                    ("+dec", stage_dec), ("+nms", stage_full)]:
    r1, r2 = make_looped(stage, N), make_looped(stage, 2 * N)
    jax.block_until_ready(r1(pts)); jax.block_until_ready(r2(pts))
    t0 = time.perf_counter(); float(r1(pts)); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); float(r2(pts)); tb = time.perf_counter() - t0
    dt = (tb - ta) / N * 1e3
    print(f"{name:10s} {dt:8.2f} ms/batch  ({B/dt*1e3:7.1f} scenes/s)  "
          f"[t({N})={ta*1e3:.0f}ms t({2*N})={tb*1e3:.0f}ms]")
