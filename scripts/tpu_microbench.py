"""Microbenchmark decomposition on the real TPU: frontend (jnp vs Pallas),
model-only forward, full forward, full train step — long dependency-chained
marginal timing (see bench.py for why naive timing lies on this tunnel).

Usage: python scripts/tpu_microbench.py [batch] [model]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chain_marginal(f, x, short=100, long_=300):
    import jax
    import jax.numpy as jnp

    def chain(n):
        c = jnp.float32(1.0)
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(x, c)
            c = out
        jax.block_until_ready(c)
        return time.perf_counter() - t0

    chain(3)
    ts, tl = chain(short), chain(long_)
    return (tl - ts) / (long_ - short)


def main():
    import jax
    import jax.numpy as jnp

    from honk_tpu import frontend as fe
    from honk_tpu.models import find_config, find_model
    from honk_tpu.ops import compute_mfccs_pallas

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    name = sys.argv[2] if len(sys.argv) > 2 else "res8"

    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((B, 16000)) * 0.2).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, 101, 40)).astype(np.float32))

    cfg = find_config(name)
    model = find_model(name)(config=cfg)
    v = model.init(jax.random.PRNGKey(0), feats[:1], train=False)

    @jax.jit
    def fe_jnp(a, c):
        out = fe.compute_mfccs(a + c * 1e-12)
        return jnp.abs(out[0, 0, 0]) + 1.0

    @jax.jit
    def fe_pal(a, c):
        out = compute_mfccs_pallas(a + c * 1e-12)
        return jnp.abs(out[0, 0, 0]) + 1.0

    @jax.jit
    def model_only(f, c):
        out = model.apply(v, f + c * 1e-12, train=False)
        return jnp.abs(out[0, 0]) + 1.0

    @jax.jit
    def full(a, c):
        out = model.apply(v, fe.compute_mfccs(a + c * 1e-12), train=False)
        return jnp.abs(out[0, 0]) + 1.0

    for label, f, x in [
        ("frontend_jnp", fe_jnp, audio),
        ("frontend_pallas", fe_pal, audio),
        (f"{name}_model_only", model_only, feats),
        (f"{name}_full_fwd", full, audio),
    ]:
        t = chain_marginal(f, x)
        print(f"{label:>18}: {t*1e3:7.3f} ms/batch  {B/t:12,.0f} audio-s/s")


if __name__ == "__main__":
    main()
