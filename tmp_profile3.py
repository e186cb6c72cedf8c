"""Decoder cost decomposition: bilinear resize vs convs, per stage."""
import time
import jax, jax.numpy as jnp
from jax import lax
import flax.linen as nn

from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache
enable_compilation_cache()

BA = 96  # B=16 x A=6
key = jax.random.PRNGKey(0)
DT = jnp.bfloat16


def timeit_loop(fn, x, n=100):
    def make(n):
        @jax.jit
        def run(x):
            def body(i, c):
                out = fn(x + jnp.asarray(1e-8, x.dtype) * c.astype(x.dtype))
                leaf = out[0] if isinstance(out, (tuple, list)) else out
                return c + leaf.ravel()[0].astype(jnp.float32)
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run
    r1, r2 = make(n), make(2 * n)
    jax.block_until_ready(r1(x)); jax.block_until_ready(r2(x))
    t0 = time.perf_counter(); float(r1(x)); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); float(r2(x)); tb = time.perf_counter() - t0
    return (tb - ta) / n * 1e3


# Stage geometries (input res, in_ch, out after resize res, skip_ch)
stages = [
    (16, 512, 32, 256),
    (32, 256, 64, 128),
    (64, 128, 128, 64),
]

for res, ch, out_res, skip_ch in stages:
    x = jax.random.normal(key, (BA, res, res, ch), DT)
    t_resize = timeit_loop(
        lambda v: jax.image.resize(
            v, (BA, out_res, out_res, v.shape[-1]), method="bilinear"
        ),
        x,
    )
    xin = jax.random.normal(key, (BA, out_res, out_res, ch + skip_ch), DT)
    conv = nn.Conv(skip_ch, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=DT)
    v1 = conv.init(key, xin)
    conv2 = nn.Conv(skip_ch, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=DT)
    xin2 = jax.random.normal(key, (BA, out_res, out_res, skip_ch), DT)
    v2 = conv2.init(key, xin2)
    t_c1 = timeit_loop(lambda v: conv.apply(v1, v), xin)
    t_c2 = timeit_loop(lambda v: conv2.apply(v2, v), xin2)
    print(f"{res:3d}->{out_res:3d} ch{ch:4d}: resize {t_resize:7.2f} ms | "
          f"conv1({ch+skip_ch}->{skip_ch}) {t_c1:7.2f} ms | "
          f"conv2({skip_ch}->{skip_ch}) {t_c2:7.2f} ms")
