import time
import jax, jax.numpy as jnp
from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache
enable_compilation_cache()

@jax.jit
def triv(x):
    return x + 1.0

x = jnp.ones((8, 128))
for _ in range(5):
    jax.block_until_ready(triv(x))
for n in (30, 100):
    t0 = time.perf_counter()
    o = x
    for _ in range(n):
        o = triv(o)
    _ = float(o.sum())
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"trivial n={n}: {dt:.3f} ms/iter")
