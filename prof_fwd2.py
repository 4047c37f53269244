import sys, time, numpy as np, jax, jax.numpy as jnp
from honk_tpu.models import find_config, find_model
from honk_tpu.ops import compute_mfccs_pallas, pack_res_params, res_forward_fused
from honk_tpu.frontend.mfcc import compute_mfccs

which = sys.argv[1]
B = 1024
rng = np.random.default_rng(0)
cfg = find_config("res8")
model = find_model("res8")(config=cfg)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1,101,40),jnp.float32), train=False)
audio = jnp.asarray((rng.standard_normal((B,16000))*0.1).astype(np.float32))
packed = pack_res_params(variables, dict(cfg))

fns = {
  "xla": lambda a: model.apply(variables, compute_mfccs(a), train=False),
  "pmfcc": lambda a: model.apply(variables, compute_mfccs_pallas(a), train=False),
  "mk": lambda a: res_forward_fused(variables, dict(cfg), compute_mfccs(a), packed=packed),
  "mfcc_only": lambda a: compute_mfccs(a),
  "pmfcc_only": lambda a: compute_mfccs_pallas(a),
}
fn = fns[which]

def make(L):
    @jax.jit
    def f(seed):
        def body(acc, _):
            out = fn(audio + acc*1e-12)
            return jnp.sum(out)*1e-9, None
        acc, _ = jax.lax.scan(body, seed, None, length=L)
        return acc
    return f

Ls, Ll = 10, 40
fs, fl = make(Ls), make(Ll)
t0=time.perf_counter(); float(jax.device_get(fs(jnp.float32(0.0)))); print(f"compile short {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter(); float(jax.device_get(fl(jnp.float32(0.0)))); print(f"compile long {time.perf_counter()-t0:.1f}s", flush=True)
ms=[]
for r in range(3):
    s=jnp.float32((r+1)*1e-6)
    t0=time.perf_counter(); float(jax.device_get(fs(s))); ts=time.perf_counter()-t0
    t0=time.perf_counter(); float(jax.device_get(fl(s))); tl=time.perf_counter()-t0
    m=(tl-ts)/(Ll-Ls)
    print(f"  rep {r}: short={ts:.3f}s long={tl:.3f}s marginal={m*1e3:.3f}ms", flush=True)
    if m>0: ms.append(m)
t=float(np.median(ms)) if ms else float('nan')
print(f"{which}: {t*1e3:.3f} ms/iter ({B/t:.0f} audio-s/s)")
