"""Res-stack megakernel vs flax XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from honk_tpu.models import find_config, find_model
from honk_tpu.ops.res_kernel import res_forward_fused


def _trained_like_variables(conf, seed=0):
    """Init + randomize BN stats so the kernel's BN folding is exercised."""
    cfg = find_config(conf)
    model = find_model(conf)(config=cfg)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 101, 40), jnp.float32), train=False)
    rng = np.random.default_rng(seed)
    stats = jax.tree.map(lambda x: x, variables["batch_stats"])
    new_stats = {}
    for name, leaf in stats.items():
        new_stats[name] = {
            "mean": jnp.asarray(rng.normal(0, 0.1, leaf["mean"].shape).astype(np.float32)),
            "var": jnp.asarray((rng.random(leaf["var"].shape) * 0.5 + 0.5).astype(np.float32)),
        }
    return model, {"params": variables["params"], "batch_stats": new_stats}, cfg


@pytest.mark.parametrize("conf", ["res8", "res8-narrow"])
def test_megakernel_matches_flax(conf):
    model, variables, cfg = _trained_like_variables(conf)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((8, 101, 40)).astype(np.float32))
    ref = np.asarray(model.apply(variables, feats, train=False))
    got = np.asarray(
        res_forward_fused(
            variables, cfg, feats, B_blk=4, compute_dtype=jnp.float32, interpret=True
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_megakernel_bf16_argmax_agreement():
    model, variables, cfg = _trained_like_variables("res8-narrow")
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((8, 101, 40)).astype(np.float32))
    ref = np.asarray(model.apply(variables, feats, train=False))
    got = np.asarray(
        res_forward_fused(
            variables, cfg, feats, B_blk=4, compute_dtype=jnp.bfloat16, interpret=True
        )
    )
    # bf16 matmuls: logits close, decisions identical.
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


@pytest.mark.slow
def test_megakernel_res26():
    model, variables, cfg = _trained_like_variables("res26-narrow")
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.standard_normal((4, 101, 40)).astype(np.float32))
    ref = np.asarray(model.apply(variables, feats, train=False))
    got = np.asarray(
        res_forward_fused(
            variables, cfg, feats, B_blk=4, compute_dtype=jnp.float32, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-2)
