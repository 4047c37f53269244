"""Model-family tests: shapes, param counts, and torch-parity (SURVEY.md §4.3).

The torch twin in models/torch_compat.py is the numerics oracle: random
torch weights converted to flax must reproduce torch logits to ~1e-4 in
eval mode. This de-risks checkpoint parity before any real honk .pt
checkpoint is available.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from honk_tpu.models import (
    ConfigType,
    find_config,
    find_model,
    torch_state_dict_to_flax,
)
from honk_tpu.models.torch_compat import build_torch_model, flax_to_torch_state_dict

ALL_TYPES = list(ConfigType)
RES_TYPES = [t for t in ALL_TYPES if t.value.startswith("res")]
# Fast parity set (default suite): flagship CNN + flagship res + dense path.
PARITY_TYPES = [
    ConfigType.CNN_TRAD_POOL2,
    ConfigType.CNN_ONE_FPOOL3,
    ConfigType.RES8,
]
# Deep/structural variants: 'highest'-precision convs compile ~4s each on
# XLA:CPU, so res15/res26 parity runs are multi-minute -> marked slow.
SLOW_PARITY_TYPES = [
    ConfigType.CNN_ONE_FSTRIDE4,
    ConfigType.CNN_TSTRIDE2,
    ConfigType.RES15,
    ConfigType.RES26_NARROW,
]


def _init_flax(conf, batch=2):
    cfg = find_config(conf)
    model = find_model(conf)(config=cfg)
    x = jnp.zeros((batch, 101, 40), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, cfg


# Default suite covers every structural variant once; the exhaustive
# all-16-types sweep is `slow` (each model graph costs seconds of XLA:CPU
# compile; the persistent cache amortizes reruns but cold CI must stay fast).
FAST_SHAPE_TYPES = [
    ConfigType.CNN_TRAD_POOL2,
    ConfigType.CNN_ONE_STRIDE1,
    ConfigType.CNN_ONE_FSTRIDE8,
    ConfigType.CNN_TPOOL2,
    ConfigType.CNN_TSTRIDE4,
    ConfigType.RES8,
    ConfigType.RES8_NARROW,
    ConfigType.RES15,
]


@pytest.mark.slow
@pytest.mark.parametrize(
    "conf",
    [t for t in ALL_TYPES if t not in FAST_SHAPE_TYPES],
    ids=[t.value for t in ALL_TYPES if t not in FAST_SHAPE_TYPES],
)
def test_forward_shape_slow(conf):
    test_forward_shape(conf)


@pytest.mark.parametrize("conf", FAST_SHAPE_TYPES, ids=[t.value for t in FAST_SHAPE_TYPES])
def test_forward_shape(conf):
    model, variables, cfg = _init_flax(conf)
    out = model.apply(variables, jnp.zeros((2, 101, 40), jnp.float32), train=False)
    assert out.shape == (2, cfg["n_labels"])
    assert np.isfinite(np.asarray(out)).all()


def _param_count(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


@pytest.mark.parametrize(
    "conf,expected,tol",
    [
        (ConfigType.RES8, 110_000, 0.01),  # ICASSP 2018 Table 1: ~110k
        (ConfigType.RES15, 238_000, 0.01),  # ~238k
        (ConfigType.RES26, 438_000, 0.01),  # ~438k
    ],
    ids=["res8", "res15", "res26"],
)
def test_res_param_counts_match_paper(conf, expected, tol):
    _, variables, _ = _init_flax(conf)
    n = _param_count(variables)
    assert abs(n - expected) / expected < tol, f"{conf}: {n} params vs paper {expected}"


@pytest.mark.parametrize("conf", PARITY_TYPES, ids=[t.value for t in PARITY_TYPES])
def test_torch_parity_eval(conf):
    _run_torch_parity(conf)


@pytest.mark.slow
@pytest.mark.parametrize("conf", SLOW_PARITY_TYPES, ids=[t.value for t in SLOW_PARITY_TYPES])
def test_torch_parity_eval_slow(conf):
    _run_torch_parity(conf)


def _run_torch_parity(conf):
    import torch

    torch.manual_seed(0)
    tm = build_torch_model(conf).eval()
    # Randomize BN running stats so the parity test actually exercises them.
    with torch.no_grad():
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn_like(buf) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand_like(buf) + 0.5)

    variables = torch_state_dict_to_flax(tm.state_dict())
    cfg = find_config(conf)
    # "highest" = full-f32 conv/matmul passes; the default fast path uses
    # bf16-style accumulation (~5e-3 error), fine for training, not parity.
    model = find_model(conf)(config=cfg, precision="highest")

    x = np.random.default_rng(1).standard_normal((3, 101, 40)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_roundtrip_state_dict():
    conf = ConfigType.RES8
    _, variables, _ = _init_flax(conf)
    sd = flax_to_torch_state_dict(variables)
    back = torch_state_dict_to_flax(sd)
    for tree_key in ["params"]:
        flat_a = jax.tree.leaves(variables[tree_key])
        flat_b = jax.tree.leaves(back[tree_key])
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_mode_dropout_and_bn():
    conf = ConfigType.RES8
    model, variables, _ = _init_flax(conf)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((4, 101, 40)), jnp.float32)
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)}
    )
    assert out.shape == (4, 12)
    # Running stats must actually move in train mode.
    before = np.concatenate([np.ravel(v) for v in jax.tree.leaves(variables["batch_stats"])])
    after = np.concatenate([np.ravel(v) for v in jax.tree.leaves(mutated["batch_stats"])])
    assert not np.allclose(before, after)
