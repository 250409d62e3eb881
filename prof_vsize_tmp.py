import numpy as np, jax, jax.numpy as jnp
from functools import partial
from maxk_tpu.bench.timing import time_fn

E = 13107200
rng = np.random.default_rng(0)

@partial(jax.jit, static_argnames=("chunk",))
def gather_rate(cols, xp, chunk):
    cc = cols.reshape(-1, chunk)
    def step(_, c):
        xg = jnp.take(xp, c, axis=0, mode="clip")
        return None, jnp.sum(xg, axis=0, dtype=jnp.int32)
    _, out = jax.lax.scan(step, None, cc)
    return out

V = 524288
xp = jnp.asarray(rng.integers(-100, 100, size=(V, 128)).astype(np.int32))

@partial(jax.jit, static_argnames=("chunk", "parts"))
def gather_parted(cols_parts, xp, chunk, parts):
    vp = xp.shape[0] // parts
    outs = []
    for p in range(parts):
        x_p = jax.lax.slice_in_dim(xp, p * vp, (p + 1) * vp, axis=0)
        x_p = jax.lax.optimization_barrier(x_p)   # force a materialized copy
        outs.append(gather_rate(cols_parts[p], x_p, chunk))
    return outs

for parts in [4, 8]:
    vp = V // parts
    cols_p = jnp.asarray(np.stack([
        rng.integers(0, vp, size=E // parts).astype(np.int32)
        for _ in range(parts)]))
    ms = time_fn(lambda: gather_parted(cols_p, xp, 65536, parts),
                 warmup=2, runs=3).mean_ms
    print(f"parted+barrier {parts}x{vp*512//2**20}MiB of 256MiB: {ms:7.2f} ms  "
          f"{E/ms*1e3/1e6:.0f} Mrows/s")
