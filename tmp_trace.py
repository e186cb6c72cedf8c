import jax, jax.numpy as jnp
from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache
enable_compilation_cache()
from v2x_sim_tpu.configs.config import Config
from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch
from v2x_sim_tpu.train.det_module import DetModule

B = 16
cfg = Config()
spec = SyntheticSpec(points_per_agent=8192, num_vehicles=12, max_gt=32)
raw = generate_batch(cfg, spec, batch_size=B, seed=0)
batch = {k: jnp.asarray(v) for k, v in raw.items() if k != "visible"}
module = DetModule(cfg, mode="disco", compute_dtype=jnp.bfloat16)
state = module.init(jax.random.PRNGKey(0), batch)
r = module.predict(state, batch, 128, 0.1, 0.3)
jax.block_until_ready(r.boxes)
with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(3):
        r = module.predict(state, batch, 128, 0.1, 0.3)
    jax.block_until_ready(r.boxes)
print("trace done")
