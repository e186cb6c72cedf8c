"""Per-stage decoder cost: cumulative truncations of STPNDecoder logic."""
import time
import jax, jax.numpy as jnp
from jax import lax
import flax.linen as nn

from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache
enable_compilation_cache()
from v2x_sim_tpu.models.backbone import ConvBlock
from v2x_sim_tpu.models.s2d import concat_perm, s2d_upsample2x, space_to_depth

BA = 96
DT = jnp.bfloat16
key = jax.random.PRNGKey(0)

# Encoder outputs (s2d path): feats[0] blocked (128,128,128), then plain.
feats = [
    jax.random.normal(key, (BA, 128, 128, 128), DT),
    jax.random.normal(key, (BA, 128, 128, 64), DT),
    jax.random.normal(key, (BA, 64, 64, 128), DT),
    jax.random.normal(key, (BA, 32, 32, 256), DT),
    jax.random.normal(key, (BA, 16, 16, 512), DT),
]


class TruncDecoder(nn.Module):
    n_stages: int  # how many decoder stages to run (1..4)

    @nn.compact
    def __call__(self, feats):
        x = feats[-1]
        n_total = len(feats) - 1
        for idx, skip in enumerate(reversed(feats[:-1])):
            if idx >= self.n_stages:
                break
            last = idx == n_total - 1
            if last:
                up = s2d_upsample2x(x)
                cat = jnp.concatenate([up, skip.astype(x.dtype)], axis=-1)
                x = ConvBlock(
                    skip.shape[-1] // 4, dtype=DT, mode="s2d",
                    in_perm=tuple(concat_perm([x.shape[-1], skip.shape[-1] // 4])),
                )(cat, False)
            else:
                h, w = skip.shape[-3], skip.shape[-2]
                x = jax.image.resize(
                    x, x.shape[:-3] + (h, w, x.shape[-1]), method="bilinear")
                x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
                x = ConvBlock(skip.shape[-1], dtype=DT)(x, False)
        return x


def measure(tag, mod, variables):
    def timed(n):
        @jax.jit
        def run(fs_in):
            def body(i, c):
                fs = list(fs_in[:-1]) + [fs_in[-1] + jnp.asarray(1e-8, DT) * c.astype(DT)]
                out = mod.apply(variables, fs)
                return c + out.ravel()[0].astype(jnp.float32)
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run
    N = 10
    r1, r2 = timed(N), timed(2 * N)
    jax.block_until_ready(r1(feats)); jax.block_until_ready(r2(feats))
    t0 = time.perf_counter(); float(r1(feats)); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); float(r2(feats)); tb = time.perf_counter() - t0
    dt = (tb - ta) / N * 1e3
    print(f"{tag:20s} {dt:8.2f} ms/batch")
    return dt


prev = 0.0
for n in range(3, 5):
    mod = TruncDecoder(n_stages=n)
    variables = mod.init(key, feats)
    dt = measure(f"decoder[:{n}]", mod, variables)
    print(f"   stage {n} delta: {dt - prev:.2f} ms")
    prev = dt
