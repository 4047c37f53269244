"""Ablation profile of the train step on the real chip.

Times scan-folded variants with the marginal-chain method (same as
bench.py): full step, step minus augment (fixed audio), step minus
frontend (fixed feats fwd/bwd/update), augment-only, frontend-only.
"""
import sys, time, numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from honk_tpu.data import AugmentConfig, prepare_train_arrays
from honk_tpu.data.augment import sample_train_batch
from honk_tpu.frontend.mfcc import compute_mfccs
from honk_tpu.models import find_config, find_model
from honk_tpu.train import create_train_state, make_optimizer, make_train_step
from honk_tpu.train.state import TrainState
import optax

which = sys.argv[1]
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
rng = np.random.default_rng(0)
cfg = find_config("res8")
model = find_model("res8")(config=cfg, dtype=jnp.bfloat16)
tx = make_optimizer()
state = create_train_state(model, tx, jax.random.PRNGKey(0))

n_clips = 2048
aug = AugmentConfig()
audio_i16, noise = prepare_train_arrays(
    rng.integers(-3000, 3000, (n_clips, 16000), dtype=np.int16),
    rng.standard_normal(16000 * 3).astype(np.float32) * 0.05,
    aug,
)
audio_i16 = jnp.asarray(audio_i16)
noise = jnp.asarray(noise)
labels_arr = jnp.asarray(rng.integers(0, 12, (n_clips,), dtype=np.int32))
step = make_train_step(model, tx, B, aug, donate=False, jit=False)

fixed_audio = jnp.asarray((rng.standard_normal((B, 16000)) * 0.1).astype(np.float32))
fixed_feats = compute_mfccs(fixed_audio, fast=True)
fixed_labels = jnp.asarray(rng.integers(0, 12, (B,), dtype=np.int32))


def _fwdbwd(st, key, feats):
    # Shared loss/update body; guards on batch_stats like make_train_step so a
    # BN-free model name still profiles correctly.
    k_dropout = jax.random.fold_in(key, st.step)
    has_bn = bool(st.batch_stats)

    def loss_fn(params):
        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = st.batch_stats
            logits, mut = model.apply(variables, feats, train=True,
                                      mutable=["batch_stats"], rngs={"dropout": k_dropout})
            new_stats = mut["batch_stats"]
        else:
            logits = model.apply(variables, feats, train=True, rngs={"dropout": k_dropout})
            new_stats = st.batch_stats
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, fixed_labels).mean()
        return loss, new_stats

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
    updates, opt_state = tx.update(grads, st.opt_state, st.params)
    params = optax.apply_updates(st.params, updates)
    return TrainState(step=st.step + 1, params=params, batch_stats=new_stats,
                      opt_state=opt_state), loss


def fwdbwd_only(st, key):
    return _fwdbwd(st, key, fixed_feats)


def step_noaug(st, key):
    # frontend + fwd/bwd on fixed audio
    feats = compute_mfccs(fixed_audio + jnp.float32(st.step) * 1e-12, fast=True)
    return _fwdbwd(st, key, feats)


def aug_only_fold(key, i):
    # Dispatch on the packed layout exactly like make_train_step, so the 'aug'
    # ablation times the same sampling path the 'full' step uses (on TPU,
    # prepare_train_arrays returns the Pallas sub-row packing).
    k = jax.random.fold_in(key, i)
    if audio_i16.shape[-1] == 128:
        from honk_tpu.ops.assemble_kernel import sample_train_batch_pallas

        audio, labels = sample_train_batch_pallas(
            k, audio_i16, labels_arr, noise, B, aug,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        audio, labels = sample_train_batch(k, audio_i16, labels_arr, noise, B, aug)
    return jnp.sum(audio) * 1e-9 + jnp.sum(labels) * 1e-9


def frontend_only_fold(key, i):
    feats = compute_mfccs(fixed_audio + jnp.float32(i) * 1e-12, fast=True)
    return jnp.sum(feats) * 1e-9


def make_scan_state(fn, L):
    @jax.jit
    def f(st, key):
        def body(carry, _):
            st, _aux = fn(carry, key)
            return st, None
        st, _ = jax.lax.scan(body, st, None, length=L)
        return st
    return f


def make_scan_scalar(fn, L):
    @jax.jit
    def f(key):
        def body(acc, i):
            return acc + fn(key, i) * 1e-12, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(L), length=L)
        return acc
    return f


def full_fn(st, key):
    st, m = step(st, key, audio_i16, labels_arr, noise)
    return st, m["loss"]


fns = {
    "full": ("state", full_fn),
    "noaug": ("state", step_noaug),
    "fwdbwd": ("state", fwdbwd_only),
    "aug": ("scalar", aug_only_fold),
    "frontend": ("scalar", frontend_only_fold),
}
kind, fn = fns[which]
Ls, Ll = 8, 32
if kind == "state":
    fs, fl = make_scan_state(fn, Ls), make_scan_state(fn, Ll)
    def run(f):
        out = f(state, jax.random.PRNGKey(1))
        jax.block_until_ready(out)
else:
    fs, fl = make_scan_scalar(fn, Ls), make_scan_scalar(fn, Ll)
    def run(f):
        float(jax.device_get(f(jax.random.PRNGKey(1))))

t0 = time.perf_counter(); run(fs); print(f"compile short {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter(); run(fl); print(f"compile long {time.perf_counter()-t0:.1f}s", flush=True)
per = []
for r in range(3):
    t0 = time.perf_counter(); run(fs); ts = time.perf_counter() - t0
    t0 = time.perf_counter(); run(fl); tl = time.perf_counter() - t0
    per.append((tl - ts) / (Ll - Ls))
p = float(np.median(per))
print(f"{which}: B={B} per-step {p*1e3:.3f} ms -> {B/p:,.0f} audio-s/s")
